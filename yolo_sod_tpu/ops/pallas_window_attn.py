"""Pallas TPU kernel: fused multi-head attention for many tiny windows.

The Swin sites run MSA over thousands of 7x7=49-token windows (8464 windows
x 2 heads of head_dim 32 at the P2 neck level, 640^2 input). The flash
kernel (ops/pallas_attention.py) is built for long sequences — its 512-wide
blocks would be 90% padding at L=49.

Round-2 negative result: a HEAD-SPLIT kernel (q/k/v as (BW*H, L, hd)) lost
to the einsum form because hd=16..32 lanes pad to 128 in HBM tiles — up to
8x IO amplification (PERF.md). This round's fix is LANE PACKING (VERDICT r2
item 4): q/k/v stay (BW, L, C) with ALL heads packed in the lane dimension
(C=64 -> 2x pad instead of 8x), heads are split only inside VMEM, and the
(H, L, L) score block never touches HBM — in either direction: a custom VJP
recomputes the probabilities in VMEM and emits dq/dk/dv straight from the
same tiles, so the backward also skips the score-matrix round-trips that
dominate the XLA lowering (measured ~11 ms fwd+bwd at the P2 Swin site,
jax.profiler trace).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# Mosaic's `tpu.matmul` supports at most ONE batch dimension, so the head
# axis must NOT appear as a second dot_general batch dim (that lowering
# verifies on CPU/interpret but fails on real TPU). Heads are a static,
# tiny count (2-8 at the Swin sites) — unroll them in Python and slice the
# lane dimension per head; every matmul then batches only over windows.


def _head(t, h: int, hd: int):
    return jax.lax.slice_in_dim(t, h * hd, (h + 1) * hd, axis=2)


def _probs1(qh, kh, scale, l_real):
    """(BB, Lp, Lp) softmax probabilities for one head, padded cols masked."""
    s = jax.lax.dot_general(
        qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale       # (BB, Lp, Lp)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < l_real, s, NEG_INF)
    m = s.max(axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / p.sum(axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float,
                l_real: int):
    q = q_ref[...].astype(jnp.float32)                    # (BB, Lp, C)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    hd = q.shape[2] // heads
    outs = []
    for h in range(heads):
        p = _probs1(_head(q, h, hd), _head(k, h, hd), scale, l_real)
        outs.append(jax.lax.dot_general(                  # (BB, Lp, hd)
            p, _head(v, h, hd),
            dimension_numbers=(((2,), (1,)), ((0,), (0,)))))
    o_ref[...] = jnp.concatenate(outs, axis=2).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                heads: int, scale: float, l_real: int):
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)                  # (BB, Lp, C)
    hd = q.shape[2] // heads
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        qh, kh, vh = (_head(t, h, hd) for t in (q, k, v))
        doh = _head(do, h, hd)
        p = _probs1(qh, kh, scale, l_real)                # (BB, Lp, Lp)
        # dv[b,m,d] = sum_n p[b,n,m] do[b,n,d]
        dvs.append(jax.lax.dot_general(
            p, doh, dimension_numbers=(((1,), (1,)), ((0,), (0,)))))
        # dp[b,n,m] = sum_d do[b,n,d] v[b,m,d]
        dp = jax.lax.dot_general(
            doh, vh, dimension_numbers=(((2,), (2,)), ((0,), (0,))))
        ds = p * (dp - (dp * p).sum(axis=-1, keepdims=True))
        # dq[b,n,d] = scale * sum_m ds[b,n,m] k[b,m,d]
        dqs.append(jax.lax.dot_general(
            ds, kh, dimension_numbers=(((2,), (1,)), ((0,), (0,)))) * scale)
        # dk[b,m,d] = scale * sum_n ds[b,n,m] q[b,n,d]
        dks.append(jax.lax.dot_general(
            ds, qh, dimension_numbers=(((1,), (1,)), ((0,), (0,)))) * scale)

    dq_ref[...] = jnp.concatenate(dqs, axis=2).astype(dq_ref.dtype)
    dk_ref[...] = jnp.concatenate(dks, axis=2).astype(dk_ref.dtype)
    dv_ref[...] = jnp.concatenate(dvs, axis=2).astype(dv_ref.dtype)


def _auto_block(C: int, bwd: bool) -> int:
    """Window-batch block size that keeps the kernel's scoped-VMEM stack
    under the 16 MB v5e limit. Calibrated from observed compile-time OOMs
    (Mosaic's stack holds f32 copies of the packed tiles PLUS per-head lane
    slices that pad hd -> 128, so the footprint is much larger than the
    nominal tile bytes): fwd C=64 at block 64 hit 16.6 MB (~72 B per
    packed element); bwd C=256 at block 32 hit 19.6 MB (~43 B/elem).
    Blocks below keep a >=2.5x margin at every gated shape (C <= 256)."""
    if bwd:
        return 8
    return 16 if C <= 128 else 8


def _pad_blocks(t, Lp: int, pb: int):
    L = t.shape[1]
    if Lp != L:
        t = jnp.pad(t, ((0, 0), (0, Lp - L), (0, 0)))
    if pb:
        t = jnp.pad(t, ((0, pb), (0, 0), (0, 0)))
    return t


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def window_mhsa_packed(q, k, v, heads: int, block_b: int | None = None,
                       interpret: bool = False):
    """Per-window multi-head softmax(q kᵀ/√hd) v with heads packed in lanes.

    Args:
        q, k, v: (BW, L, C) — BW independent windows, L tokens, C = H*hd
            channels with the head split applied INSIDE the kernel.

    Returns:
        (BW, L, C) in q's dtype (heads re-packed).
    """
    out, _ = _window_mhsa_fwd(q, k, v, heads, block_b, interpret)
    return out


def _call(kernel, n_out, q, k, v, extra, heads, block_b, interpret):
    BW, L, C = q.shape
    scale = (C // heads) ** -0.5
    Lp = -(-L // 8) * 8
    if block_b is None:
        block_b = _auto_block(C, bwd=n_out > 1)
    pb = (-BW) % block_b
    ins = [_pad_blocks(t, Lp, pb) for t in (q, k, v, *extra)]
    BWp = BW + pb
    spec = pl.BlockSpec((block_b, Lp, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(kernel, heads=heads, scale=scale, l_real=L),
        grid=(BWp // block_b,),
        in_specs=[spec] * len(ins),
        out_specs=[spec] * n_out if n_out > 1 else spec,
        out_shape=[jax.ShapeDtypeStruct((BWp, Lp, C), q.dtype)] * n_out
        if n_out > 1 else jax.ShapeDtypeStruct((BWp, Lp, C), q.dtype),
        interpret=interpret,
    )(*ins)
    if n_out == 1:
        return outs[:BW, :L]
    return tuple(o[:BW, :L] for o in outs)


def _window_mhsa_fwd(q, k, v, heads, block_b, interpret):
    out = _call(_fwd_kernel, 1, q, k, v, (), heads, block_b, interpret)
    return out, (q, k, v)


def _window_mhsa_bwd(heads, block_b, interpret, res, do):
    q, k, v = res
    dq, dk, dv = _call(_bwd_kernel, 3, q, k, v, (do,), heads, block_b, interpret)
    return dq, dk, dv


window_mhsa_packed.defvjp(_window_mhsa_fwd, _window_mhsa_bwd)


# -- legacy head-split entry (kept for head_dim >= 128 shapes) ----------------

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
    """Single-head form over (BW, L, D) — only sensible when D is lane-dense
    (>= 128); head-split small-D shapes must use window_mhsa_packed."""
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
    if (_tpu_backend() or interpret) and BW >= 256 and L <= 128 and D >= 128:
        return window_attention_fused(q, k, v, interpret=interpret)
    s = jnp.einsum("bqd,bkd->bqk", q, k,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    p = stable_softmax_lowp(s * (D ** -0.5))
    return jnp.einsum("bqk,bkd->bqd", p, v)
