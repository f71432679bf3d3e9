"""Mixed-precision numeric helpers for attention-family modules.

On a bandwidth-bound model the (tokens, tokens) score matrices are the
largest attention tensors; materializing them in f32 doubles their HBM
traffic (measured via tools/hlo_bytes.py: 162 MB per score tensor at the
P2 Swin site). `stable_softmax_lowp` keeps every boundary tensor at the
compute dtype (bf16) while doing the risky reductions — running max and
denominator sum — in f32, which XLA fuses into the elementwise chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exact_topk_lastdim(x, k: int, chunk: int = 256):
    """Exact top-k over the last axis via two stages: per-chunk top-k, then
    top-k over the chunk winners.

    XLA lowers a monolithic lax.top_k to a full sort of the last axis —
    44 ms for the TAL assigner's (16, 64, 34000) call on a v5e vs 15 ms for
    this form (measured; the global top-k provably lies within the union of
    per-chunk top-k's). Tie-breaking matches lax.top_k (lowest index first):
    both stages are stable and chunks concatenate in index order.

    Returns (values, indices), shapes (*batch, k).
    """
    orig = x.shape[-1]
    if orig <= chunk or k >= chunk:
        return jax.lax.top_k(x, min(k, orig))
    pad = (-orig) % chunk
    if pad:
        fill = jnp.asarray(-jnp.inf, x.dtype)
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)],
                    constant_values=fill)
    n_chunks = x.shape[-1] // chunk
    xc = x.reshape(*x.shape[:-1], n_chunks, chunk)
    v1, i1 = jax.lax.top_k(xc, k)                       # (*b, C, k)
    base = (jnp.arange(n_chunks, dtype=i1.dtype) * chunk)[:, None]
    gidx = (i1 + base).reshape(*x.shape[:-1], n_chunks * k)
    v2, i2 = jax.lax.top_k(v1.reshape(*x.shape[:-1], n_chunks * k), k)
    idx = jnp.take_along_axis(gidx, i2, axis=-1)
    return v2, idx


def topk_mask_lastdim(x, k: int, chunk: int = 256):
    """Boolean mask of the k largest entries per row of the last axis, ties
    at the k-th value resolved to the LOWEST index — exactly lax.top_k's
    selection set, with NO sort at all.

    The TAL assigner only needs the top-k SET. Sorts are the wrong tool on
    TPU: XLA lowers even a values-only sort of the (16, 64, 34000) metric to
    a (f32, s32) compare-exchange network costing ~16 ms/step (jax.profiler
    trace). Instead run k unrolled rounds of argmax-with-exclusion — each
    round is one fused reduce over the row with previously-picked positions
    masked out, and `argmax` already breaks ties by lowest index. The
    accumulated exclusion mask after k rounds IS the answer. Traffic:
    k passes over x (~1.4 GB here) of pure VPU reduce, no sort, no scatter.

    `chunk` is accepted for signature stability; unused.
    """
    del chunk
    A = x.shape[-1]
    k = min(k, A)
    if k == A:
        return jnp.ones(x.shape, bool)
    ar = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    neg = jnp.asarray(-jnp.inf, x.dtype)
    mask = jnp.zeros(x.shape, bool)
    for _ in range(k):
        idx = jnp.argmax(jnp.where(mask, neg, x), axis=-1)    # lowest index on ties
        mask = mask | (ar == idx[..., None])
    return mask


def topk_mask_multilevel(xs, k: int):
    """Per-level boolean masks whose concatenation equals
    ``topk_mask_lastdim(jnp.concatenate(xs, -1), k)`` — without ever
    building the concatenated tensor.

    The criterion's per-level form (utils/loss.py) keeps every (B, M, A_l)
    tensor level-local so XLA never materializes the A-axis concat or its
    gradient splits; the TAL top-k is the one genuinely cross-level
    reduction, decomposed here in two passes:

      1. per-level top-min(k, A_l) candidates via argmax-with-exclusion
         rounds (same aggregate traffic as the dense mask: k passes over
         each level's row);
      2. the <= L*k candidate (value, concat-index) pairs — a tiny
         (*batch, L*k) tensor — are ranked by (value desc, index asc),
         which is exactly lax.top_k's lowest-index tie order on the
         concat; the k-th pair becomes a threshold re-applied per level.

    Priorities are distinct (indices are unique), so the threshold test
    ``x > v* or (x == v* and idx <= g*)`` selects exactly k entries.
    """
    total = sum(x.shape[-1] for x in xs)
    k = min(k, total)
    if k == total:
        return [jnp.ones(x.shape, bool) for x in xs]
    neg = jnp.asarray(-jnp.inf, xs[0].dtype)
    cand_vals, cand_gidx = [], []
    offset = 0
    for x in xs:
        A = x.shape[-1]
        kk = min(k, A)
        ar = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        m = jnp.zeros(x.shape, bool)
        for _ in range(kk):
            xm = jnp.where(m, neg, x)
            idx = jnp.argmax(xm, axis=-1)                 # lowest index on ties
            cand_vals.append(jnp.take_along_axis(xm, idx[..., None], axis=-1)[..., 0])
            cand_gidx.append(idx + offset)
            m = m | (ar == idx[..., None])
        offset += A
    cv = jnp.stack(cand_vals, axis=-1)                    # (*b, C)
    cg = jnp.stack(cand_gidx, axis=-1)                    # (*b, C)
    # k-th (value desc, concat-index asc) among the tiny candidate set:
    # the index tie-break folds into one argmax key because indices are
    # bounded — rank = value * (total+1) - index is monotone in the pair
    # order only for exact arithmetic, so instead run k exclusion rounds
    # with an explicit two-reduce tie-break per round (C <= L*k is tiny).
    sel = jnp.zeros(cv.shape, bool)
    v_k = None
    g_k = None
    for _ in range(k):
        vm = jnp.where(sel, neg, cv)
        v_k = vm.max(axis=-1)                             # round max value
        at_max = (vm == v_k[..., None]) & ~sel
        g_k = jnp.where(at_max, cg, total).min(axis=-1)   # lowest concat index
        sel = sel | (at_max & (cg == g_k[..., None]))
    offset = 0
    out = []
    for x in xs:
        A = x.shape[-1]
        gl = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1) + offset
        out.append((x > v_k[..., None]) |
                   ((x == v_k[..., None]) & (gl <= g_k[..., None])))
        offset += A
    return out


def stable_softmax_lowp(logits, axis: int = -1):
    """Max-subtracted softmax with f32 denominator, low-precision tensors.

    Returns probabilities in `logits.dtype`. For f32 inputs this is plain
    softmax; for bf16 it avoids writing any f32 tensor of logits' shape.
    """
    if logits.dtype == jnp.float32:
        return jax.nn.softmax(logits, axis=axis)
    m = jax.lax.stop_gradient(logits.max(axis=axis, keepdims=True))
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=axis, keepdims=True, dtype=jnp.float32)
    return p / s.astype(logits.dtype)


def image_to_compute(x, dtype=jnp.bfloat16):
    """Normalize a batch image tensor to `dtype` in [0, 1] inside the graph.

    The batch contract ships images as uint8 RGB (data/build.py collate):
    4x fewer host->device bytes than f32, the same doctrine as the
    reference's uint8 transfer + on-device `.float() / 255`
    (reference engine/trainer.py preprocess_batch). The divide runs in f32
    before the downcast, matching the old host-side f32 normalize to
    within 1 ulp (XLA lowers the constant divide to a reciprocal
    multiply); XLA fuses the convert chain into the first conv's fusion,
    so no extra HBM tensor is materialized. Float inputs (synthetic
    tests, pre-normalized arrays) pass through with a cast only.
    """
    if x.dtype == jnp.uint8:
        return (x.astype(jnp.float32) / 255.0).astype(dtype)
    return x.astype(dtype)
