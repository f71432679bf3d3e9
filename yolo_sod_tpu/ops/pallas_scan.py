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
