"""Pallas TPU kernel: fused attention for many tiny windows.

The Swin sites run MSA over thousands of 7x7=49-token windows (8464
windows x 2 heads at the P2 neck level, 640^2 input). The flash kernel
(ops/pallas_attention.py) is built for long sequences — its 512-wide
blocks would be 90% padding at L=49. Here the whole (L, L) score matrix
of a *batch of windows* lives in VMEM: HBM touches only q/k/v/o, so the
score traffic (measured ~1 GB f32 per forward at this site,
tools/hlo_bytes.py) disappears entirely.

Grid: (BW / block_b,) over window-batches; block = (block_b, L, D) with
L padded to a sublane multiple and D in lanes. Compute is a few MF per
block — this kernel is pure bandwidth play.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _win_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, l_real: int):
    q = q_ref[...].astype(jnp.float32)                 # (BB, Lp, D)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale    # (BB, Lp, Lp)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < l_real, s, NEG_INF)

    m = s.max(axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / p.sum(axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (BB, Lp, D)
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def window_attention_fused(q, k, v, block_b: int = 64, interpret: bool = False):
    """softmax(q kᵀ/√D) v over a large batch of short sequences.

    Args:
        q, k, v: (BW, L, D) — BW independent windows, L tokens each
            (L ≲ 128; the full (L, L) matrix is kept in VMEM).

    Returns:
        (BW, L, D) in q's dtype.
    """
    BW, L, D = q.shape
    scale = D ** -0.5
    Lp = -(-L // 8) * 8                               # sublane-align tokens
    pb = (-BW) % block_b
    if Lp != L:
        pad = ((0, 0), (0, Lp - L), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    if pb:
        pad = ((0, pb), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    BWp = BW + pb

    out = pl.pallas_call(
        functools.partial(_win_kernel, scale=scale, l_real=L),
        grid=(BWp // block_b,),
        in_specs=[pl.BlockSpec((block_b, Lp, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((block_b, Lp, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BWp, Lp, D), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:BW, :L]


def windowed_mhsa(q, k, v, interpret: bool = False):
    """Dispatch: fused Pallas kernel on TPU for big window batches, einsum
    otherwise. q/k/v: (BW, L, D)."""
    from yolo_sod_tpu.ops.numerics import stable_softmax_lowp
    from yolo_sod_tpu.ops.pallas_attention import _tpu_backend

    BW, L, D = q.shape
    if (_tpu_backend() or interpret) and BW >= 256 and L <= 128:
        return window_attention_fused(q, k, v, interpret=interpret)
    s = jnp.einsum("bqd,bkd->bqk", q, k,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    p = stable_softmax_lowp(s * (D ** -0.5))
    return jnp.einsum("bqk,bkd->bqd", p, v)
