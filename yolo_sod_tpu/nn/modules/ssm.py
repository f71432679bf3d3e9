"""Selective state-space (Mamba-style) block, TPU-native.

Re-expression of reference blocks_mamba.py:105-236 (MambaBlock wrapping
mamba_ssm.Mamba(d_model=c_hidden, d_state=16, d_conv=4, expand=1)). The
reference depends on CUDA kernels (mamba-ssm + causal-conv1d) with a runtime
capability probe and GLU fallback; here the selective scan is expressed as a
log-depth jax.lax.associative_scan, which XLA compiles efficiently for TPU —
no fallback machinery needed, though GLUBlock remains available as a config
choice.

Selective-SSM recurrence (diagonal A):
    h_t = exp(dt_t * A) * h_{t-1} + (dt_t * u_t) * B_t
    y_t = <h_t, C_t> + D * u_t
with input-dependent dt, B, C. The linear first-order recurrence composes
associatively: (g2, f2) ∘ (g1, f1) = (g2*g1, g2*f1 + f2).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_sod_tpu.nn.modules.conv import ConvBNAct


def _tpu_backend() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def selective_scan(u, dt, A, B, C, D):
    """Associative-scan selective SSM.

    Args:
        u:  (b, L, d) input sequence.
        dt: (b, L, d) positive timestep.
        A:  (d, n) negative state matrix (diagonal over d).
        B:  (b, L, n) input gate.
        C:  (b, L, n) output gate.
        D:  (d,) skip.

    Returns:
        y: (b, L, d).
    """
    # Discretize: g = exp(dt*A) (decay), f = dt*u*B (drive); both (b, L, d, n).
    g = jnp.exp(dt[..., None] * A[None, None])
    f = (dt * u)[..., None] * B[:, :, None, :]

    def combine(a, b):
        ga, fa = a
        gb, fb = b
        return ga * gb, gb * fa + fb

    _, h = jax.lax.associative_scan(combine, (g, f), axis=1)
    y = jnp.einsum("bldn,bln->bld", h, C)
    return y + u * D[None, None]


@jax.custom_vjp
def selective_scan_fast(u, dt, A, B, C, D):
    """Pallas single-pass scan on TPU (4x the associative scan at Mamba-P3
    sizes; ops/pallas_scan.py) with an ANALYTIC Pallas backward (one reverse
    pass over streamed h residuals); associative scan + AD elsewhere."""
    if _tpu_backend():
        from yolo_sod_tpu.ops.pallas_scan import selective_scan_pallas

        return selective_scan_pallas(u, dt, A, B, C, D)
    return selective_scan(u, dt, A, B, C, D)


def _ssf_fwd(u, dt, A, B, C, D):
    if _tpu_backend():
        from yolo_sod_tpu.ops.pallas_scan import selective_scan_pallas_fwd

        y, h = selective_scan_pallas_fwd(u, dt, A, B, C, D)
        return y, (u, dt, A, B, C, D, h)
    return selective_scan(u, dt, A, B, C, D), (u, dt, A, B, C, D, None)


def _ssf_bwd(res, g):
    u, dt, A, B, C, D, h = res
    if h is not None:
        from yolo_sod_tpu.ops.pallas_scan import selective_scan_pallas_bwd

        du, ddt, dA, dB, dC, dD = selective_scan_pallas_bwd(u, dt, A, B, C, D, h, g)
        return (du.astype(u.dtype), ddt.astype(dt.dtype), dA.astype(A.dtype),
                dB.astype(B.dtype), dC.astype(C.dtype), dD.astype(D.dtype))
    _, vjp = jax.vjp(selective_scan, u, dt, A, B, C, D)
    return vjp(g)


selective_scan_fast.defvjp(_ssf_fwd, _ssf_bwd)


class SSMCore(nn.Module):
    """One Mamba mixer over a (b, L, d_model) sequence (expand=1)."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4

    @nn.compact
    def __call__(self, u):
        d, n = self.d_model, self.d_state
        dt_rank = math.ceil(d / 16)

        xz = nn.Dense(2 * d, use_bias=False, name="in_proj")(u)
        x, z = jnp.split(xz, 2, axis=-1)

        # Causal depthwise conv along L (reference causal_conv1d, k=4).
        w = self.param("conv1d_kernel", nn.initializers.lecun_normal(),
                       (self.d_conv, 1, d))
        b = self.param("conv1d_bias", nn.initializers.zeros, (d,))
        xp = jnp.pad(x, ((0, 0), (self.d_conv - 1, 0), (0, 0)))
        x = jax.lax.conv_general_dilated(
            xp, w, window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=d) + b
        x = jax.nn.silu(x)

        # Input-dependent dt / B / C.
        dbc = nn.Dense(dt_rank + 2 * n, use_bias=False, name="x_proj")(x)
        dt, Bg, Cg = jnp.split(dbc, [dt_rank, dt_rank + n], axis=-1)

        # dt projection with mamba's softplus-inverse bias init:
        # softplus(bias) ~ LogUniform(1e-3, 1e-1).
        def dt_bias_init(key, shape, dtype=jnp.float32):
            t = jnp.exp(jax.random.uniform(key, shape, dtype)
                        * (math.log(0.1) - math.log(1e-3)) + math.log(1e-3))
            t = jnp.clip(t, 1e-4, None)
            return t + jnp.log(-jnp.expm1(-t))   # inverse softplus

        dt_w = self.param("dt_proj_kernel",
                          nn.initializers.uniform(scale=dt_rank ** -0.5),
                          (dt_rank, d))
        dt_b = self.param("dt_proj_bias", dt_bias_init, (d,))
        dt = jax.nn.softplus(dt @ dt_w + dt_b)

        # A = -exp(A_log), A_log init = log(1..n) per channel (S4D-real).
        A_log = self.param("A_log",
                           lambda key, shape: jnp.broadcast_to(
                               jnp.log(jnp.arange(1, n + 1, dtype=jnp.float32)), shape).copy(),
                           (d, n))
        A = -jnp.exp(A_log.astype(jnp.float32))
        Dp = self.param("D", nn.initializers.ones, (d,))

        y = selective_scan_fast(x.astype(jnp.float32), dt.astype(jnp.float32), A,
                                Bg.astype(jnp.float32), Cg.astype(jnp.float32), Dp)
        y = y.astype(u.dtype) * jax.nn.silu(z)
        return nn.Dense(d, use_bias=False, name="out_proj")(y)


class MambaBlock(nn.Module):
    """Spatial Mamba block (reference blocks_mamba.py:105-236).

    1x1 proj → optional avg-pool sequence reduction → flatten HW→L →
    selective SSM → reshape → nearest-upsample → 1x1 proj → residual.
    YAML row: [-1, 1, MambaBlock, [c_hidden, seq_reduction]].
    """

    channels: int
    c_hidden: int = 256
    seq_reduction: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        y = ConvBNAct(C, self.c_hidden, 1, name="in_proj")(x, train)
        r = self.seq_reduction
        if r > 1:
            y = nn.avg_pool(y, (r, r), strides=(r, r))
        Hh, Wh = y.shape[1], y.shape[2]
        seq = y.reshape(B, Hh * Wh, self.c_hidden)
        seq = SSMCore(self.c_hidden, name="ssm")(seq)
        y = seq.reshape(B, Hh, Wh, self.c_hidden)
        if r > 1:
            y = jnp.repeat(jnp.repeat(y, r, axis=1), r, axis=2)[:, :H, :W]
        y = ConvBNAct(self.c_hidden, C, 1, name="out_proj")(y, train)
        return x + y
