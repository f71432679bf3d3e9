"""Pallas TPU kernel: selective-SSM scan in one HBM pass.

The associative-scan formulation (ops-free, XLA) materializes the (B, L, D, N)
decay/drive tensors and runs ~log2(L) passes over them — for the MambaBlock at
P3/640 (L=1600, D=256, N=16) that is ~100 MB of HBM traffic per pass. This
kernel keeps the (N, D) recurrence state in VMEM and streams x/dt/B/C through
in chunks: one read of the inputs, one write of the output, total.

Grid: (B, L/CHUNK) — row-major, so chunks of one batch run sequentially and
the state scratch carries across them; it resets at chunk 0 of each batch.

Layout notes (fp32 min tile 8x128): state h is (N, D) = (16, 256) — two lane
tiles; per-timestep rows are (1, D) vectors; B/C rows broadcast from (N, 1)
sublanes across lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scan_kernel(x_ref, dt_ref, A_ref, B_ref, C_ref, D_ref, y_ref, h_scratch,
                 *, chunk: int):
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)

    A = A_ref[:]                      # (N, D)
    Dp = D_ref[:]                     # (1, D)

    def step(t, h):
        x_t = x_ref[0, t, :][None, :]             # (1, D)
        dt_t = dt_ref[0, t, :][None, :]           # (1, D)
        b_t = B_ref[0, t, :][:, None]             # (N, 1)
        c_t = C_ref[0, t, :][:, None]             # (N, 1)
        g = jnp.exp(dt_t * A)                      # (N, D)
        f = (dt_t * x_t) * b_t                     # (N, D) outer product
        h = g * h + f
        y = jnp.sum(h * c_t, axis=0, keepdims=True) + x_t * Dp   # (1, D)
        y_ref[0, t, :] = y[0]
        return h

    h = jax.lax.fori_loop(0, chunk, step, h_scratch[:])
    h_scratch[:] = h


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def selective_scan_pallas(u, dt, A, B, C, D, chunk: int = 256,
                          interpret: bool = False):
    """Drop-in for ops.ssm.selective_scan (same signature/semantics).

    Args:
        u, dt: (b, L, d); A: (d, n); B, C: (b, L, n); D: (d,).

    Returns:
        y: (b, L, d) float32.
    """
    b, L, d = u.shape
    n = A.shape[1]
    pad = (-L) % chunk
    if pad:
        u = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        B = jnp.pad(B, ((0, 0), (0, pad), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0)))
    Lp = L + pad
    f32 = jnp.float32
    At = A.T.astype(f32)                        # (n, d)
    Dp = D.astype(f32)[None, :]                 # (1, d)

    grid = (b, Lp // chunk)
    row = lambda bi, ci: (bi, ci, 0)
    y = pl.pallas_call(
        functools.partial(_scan_kernel, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, d), row, memory_space=pltpu.VMEM),   # x
            pl.BlockSpec((1, chunk, d), row, memory_space=pltpu.VMEM),   # dt
            pl.BlockSpec((n, d), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, n), row, memory_space=pltpu.VMEM),   # B
            pl.BlockSpec((1, chunk, n), row, memory_space=pltpu.VMEM),   # C
            pl.BlockSpec((1, d), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, d), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, Lp, d), f32),
        scratch_shapes=[pltpu.VMEM((n, d), f32)],
        interpret=interpret,
    )(u.astype(f32), dt.astype(f32), At, B.astype(f32), C.astype(f32), Dp)
    return y[:, :L]


def _scan_kernel_with_h(x_ref, dt_ref, A_ref, B_ref, C_ref, D_ref,
                        y_ref, h_out_ref, h_scratch, *, chunk: int):
    """Forward kernel that also streams out h_t (residuals for the backward)."""
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)

    A = A_ref[:]
    Dp = D_ref[:]

    def step(t, h):
        x_t = x_ref[0, t, :][None, :]
        dt_t = dt_ref[0, t, :][None, :]
        b_t = B_ref[0, t, :][:, None]
        c_t = C_ref[0, t, :][:, None]
        g = jnp.exp(dt_t * A)
        h = g * h + (dt_t * x_t) * b_t
        y_ref[0, t, :] = (jnp.sum(h * c_t, axis=0, keepdims=True) + x_t * Dp)[0]
        h_out_ref[0, t, :, :] = h
        return h

    h_scratch[:] = jax.lax.fori_loop(0, chunk, step, h_scratch[:])


def _scan_bwd_kernel(x_ref, dt_ref, A_ref, B_ref, C_ref, D_ref, h_ref, gy_ref,
                     dx_ref, ddt_ref, dA_ref, dB_ref, dC_ref, dD_ref,
                     dh_scratch, *, chunk: int):
    """Analytic reverse scan.

    With h_t = g_t h_{t-1} + f_t, y_t = <C_t, h_t> + D u_t and upstream gy_t:
        dh_t  = gy_t C_t + g_{t+1} dh_{t+1}          (reverse recurrence)
        du_t  = gy_t D + dt_t sum_n(dh_t B_t)
        dB_t  = sum_d(dh_t dt_t u_t)
        dC_t  = sum_d(gy_t h_t)
        ddt_t = sum_n(dh_t (h_t - f_t) A + dh_t u_t B_t)
        dA    = sum_t dh_t (h_t - f_t) dt_t          [g_t h_{t-1} = h_t - f_t:
        dD    = sum_t gy_t u_t                        no division, no stored h_{t-1}]

    Grid (B, L/chunk) with the chunk axis index-mapped in REVERSE; dh carries
    in VMEM scratch; dA/dD accumulate in constant-index output blocks.
    """
    bi = pl.program_id(0)
    ci = pl.program_id(1)   # grid step 0 == LAST chunk (reversed index map)

    @pl.when(ci == 0)
    def _():
        dh_scratch[:] = jnp.zeros_like(dh_scratch)

    @pl.when(jnp.logical_and(bi == 0, ci == 0))
    def _():
        dA_ref[:] = jnp.zeros_like(dA_ref)
        dD_ref[:] = jnp.zeros_like(dD_ref)

    A = A_ref[:]                                   # (N, D)
    Dp = D_ref[:]                                  # (1, D)

    def step(i, carry):
        dh_carry, dA_acc, dD_acc = carry
        t = chunk - 1 - i                          # reverse within the chunk
        x_t = x_ref[0, t, :][None, :]              # (1, D)
        dt_t = dt_ref[0, t, :][None, :]
        b_t = B_ref[0, t, :][:, None]              # (N, 1)
        c_t = C_ref[0, t, :][:, None]
        gy_t = gy_ref[0, t, :][None, :]            # (1, D)
        h_t = h_ref[0, t, :, :]                    # (N, D)
        g_t = jnp.exp(dt_t * A)

        dh_t = gy_t * c_t + dh_carry               # (N, D)
        gh_prev = h_t - (dt_t * x_t) * b_t         # = g_t * h_{t-1}

        dC_ref[0, t, :] = jnp.sum(gy_t * h_t, axis=1)
        dB_ref[0, t, :] = jnp.sum(dh_t * (dt_t * x_t), axis=1)
        dx_ref[0, t, :] = (gy_t * Dp
                           + dt_t * jnp.sum(dh_t * b_t, axis=0, keepdims=True))[0]
        ddt_ref[0, t, :] = jnp.sum(dh_t * gh_prev * A + dh_t * (x_t * b_t), axis=0)
        dA_acc = dA_acc + dh_t * gh_prev * dt_t
        dD_acc = dD_acc + gy_t * x_t
        return g_t * dh_t, dA_acc, dD_acc

    dh, dA_new, dD_new = jax.lax.fori_loop(
        0, chunk, step, (dh_scratch[:], jnp.zeros_like(dA_ref[:]),
                         jnp.zeros_like(dD_ref[:])))
    dh_scratch[:] = dh
    dA_ref[:] = dA_ref[:] + dA_new
    dD_ref[:] = dD_ref[:] + dD_new


def _pad_inputs(u, dt, B, C, chunk):
    L = u.shape[1]
    pad = (-L) % chunk
    if pad:
        u = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        B = jnp.pad(B, ((0, 0), (0, pad), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0)))
    return u, dt, B, C, L + pad


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def selective_scan_pallas_fwd(u, dt, A, B, C, D, chunk: int = 256,
                              interpret: bool = False):
    """Forward returning (y, h) — h saved as the backward residual."""
    b, L, d = u.shape
    n = A.shape[1]
    f32 = jnp.float32
    u, dt, B, C, Lp = _pad_inputs(u.astype(f32), dt.astype(f32),
                                  B.astype(f32), C.astype(f32), chunk)
    grid = (b, Lp // chunk)
    row = lambda bi, ci: (bi, ci, 0)
    y, h = pl.pallas_call(
        functools.partial(_scan_kernel_with_h, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, n), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, n), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, n, d), lambda bi, ci: (bi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, Lp, d), f32),
            jax.ShapeDtypeStruct((b, Lp, n, d), f32),
        ],
        scratch_shapes=[pltpu.VMEM((n, d), f32)],
        interpret=interpret,
    )(u, dt, A.T.astype(f32), B, C, D.astype(f32)[None, :])
    return y[:, :L], h


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def selective_scan_pallas_bwd(u, dt, A, B, C, D, h, gy, chunk: int = 256,
                              interpret: bool = False):
    """Analytic gradients (du, ddt, dA, dB, dC, dD) in one reverse pass."""
    b, L, d = u.shape
    n = A.shape[1]
    f32 = jnp.float32
    u_p, dt_p, B_p, C_p, Lp = _pad_inputs(u.astype(f32), dt.astype(f32),
                                          B.astype(f32), C.astype(f32), chunk)
    pad = Lp - L
    gy_p = jnp.pad(gy.astype(f32), ((0, 0), (0, pad), (0, 0))) if pad else gy.astype(f32)
    h_p = jnp.pad(h, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else h
    nck = Lp // chunk
    grid = (b, nck)
    rrow = lambda bi, ci: (bi, nck - 1 - ci, 0)          # REVERSED chunk order
    rrow4 = lambda bi, ci: (bi, nck - 1 - ci, 0, 0)
    const2 = lambda bi, ci: (0, 0)
    dx, ddt, dA_t, dB, dC, dD = pl.pallas_call(
        functools.partial(_scan_bwd_kernel, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, d), rrow, memory_space=pltpu.VMEM),   # x
            pl.BlockSpec((1, chunk, d), rrow, memory_space=pltpu.VMEM),   # dt
            pl.BlockSpec((n, d), const2, memory_space=pltpu.VMEM),        # A^T
            pl.BlockSpec((1, chunk, n), rrow, memory_space=pltpu.VMEM),   # B
            pl.BlockSpec((1, chunk, n), rrow, memory_space=pltpu.VMEM),   # C
            pl.BlockSpec((1, d), const2, memory_space=pltpu.VMEM),        # D
            pl.BlockSpec((1, chunk, n, d), rrow4, memory_space=pltpu.VMEM),  # h
            pl.BlockSpec((1, chunk, d), rrow, memory_space=pltpu.VMEM),   # gy
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, d), rrow, memory_space=pltpu.VMEM),   # dx
            pl.BlockSpec((1, chunk, d), rrow, memory_space=pltpu.VMEM),   # ddt
            pl.BlockSpec((n, d), const2, memory_space=pltpu.VMEM),        # dA^T
            pl.BlockSpec((1, chunk, n), rrow, memory_space=pltpu.VMEM),   # dB
            pl.BlockSpec((1, chunk, n), rrow, memory_space=pltpu.VMEM),   # dC
            pl.BlockSpec((1, d), const2, memory_space=pltpu.VMEM),        # dD
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, Lp, d), f32),
            jax.ShapeDtypeStruct((b, Lp, d), f32),
            jax.ShapeDtypeStruct((n, d), f32),
            jax.ShapeDtypeStruct((b, Lp, n), f32),
            jax.ShapeDtypeStruct((b, Lp, n), f32),
            jax.ShapeDtypeStruct((1, d), f32),
        ],
        scratch_shapes=[pltpu.VMEM((n, d), f32)],
        interpret=interpret,
    )(u_p, dt_p, A.T.astype(f32), B_p, C_p, D.astype(f32)[None, :], h_p, gy_p)
    return (dx[:, :L], ddt[:, :L], dA_t.T, dB[:, :L], dC[:, :L], dD[0])
