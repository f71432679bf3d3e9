"""Pallas TPU kernel: fused multi-head attention (flash pattern).

TPU-native replacement for the reference's flash_attn CUDA dependency
(block.py:1217-1346 — flash_attn_func on the yolov12 AAttn forward path on
Ampere+). Blocked over KV with the running-max online-softmax recurrence:
the (Lq, Lk) score matrix never materializes in HBM, so long-sequence
attention (RAFB full-map MHSA, P2-scale token counts) is memory-bound on
q/k/v/o only.

Layout: q/k/v are (BH, L, D) — batch*heads leading, head_dim in lanes.
Grid: (BH, Lq/BQ, Lk/BK) with the KV axis innermost (sequential) so the
running (m, l, acc) state lives in VMEM scratch across KV blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                 *, scale: float, kv_len: int, block_k: int):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)                   # (BQ, D)
    k = k_ref[0].astype(jnp.float32)                   # (BK, D)
    v = v_ref[0].astype(jnp.float32)

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale   # (BQ, BK)
    # Mask KV padding in the final block.
    base = ki * block_k
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
    s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[:]                                   # (BQ, 1)
    m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_scr[:] = l_scr[:] * alpha + p.sum(axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
    m_scr[:] = m_new

    @pl.when(ki == nk - 1)
    def _():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q, k, v, block_q: int = 1024, block_k: int = 1024,
                    interpret: bool = False):
    """Fused softmax(q k^T / sqrt(D)) v.

    Args:
        q: (BH, Lq, D); k, v: (BH, Lk, D). Any float dtype; fp32 accumulation.

    Returns:
        (BH, Lq, D) in q's dtype.
    """
    BH, Lq, D = q.shape
    Lk = k.shape[1]
    scale = D ** -0.5
    pq = (-Lq) % block_q
    pk = (-Lk) % block_k
    if pq:
        q = jnp.pad(q, ((0, 0), (0, pq), (0, 0)))
    if pk:
        k = jnp.pad(k, ((0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pk), (0, 0)))
    Lqp, Lkp = Lq + pq, Lk + pk

    grid = (BH, Lqp // block_q, Lkp // block_k)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, kv_len=Lk, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Lqp, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out[:, :Lq]


def _tpu_backend() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def fused_mhsa(q, k, v, min_seq_for_pallas: int = 1024, interpret: bool = False):
    """Dispatch: Pallas flash kernel on TPU for long sequences, plain einsum
    otherwise (tiny windows gain nothing from blocking). With YOLO_SOD_SAGE=1
    the INT8 SageAttention-analog kernel is used instead (reference
    SAGEATTN_ENABLE contract — opt-in, off by default)."""
    BH, Lq, D = q.shape
    if _tpu_backend() and Lq >= min_seq_for_pallas and D % 8 == 0:
        from yolo_sod_tpu.ops.pallas_attention_int8 import sage_attention, sage_enabled
        if sage_enabled():
            return sage_attention(q, k, v)
        return flash_attention(q, k, v)
    s = jnp.einsum("bqd,bkd->bqk", q, k) * (D ** -0.5)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bqk,bkd->bqd", p, v)
