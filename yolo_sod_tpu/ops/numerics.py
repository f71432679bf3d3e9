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
    selection set, without materializing a sorted (…, A) tensor with indices.

    The TAL assigner only needs the top-k SET (it scatters indices straight
    into a membership mask); the index-carrying two-stage top-k spent
    14 ms/step in a (16, 64, 133, 256) variadic stable sort on-chip
    (jax.profiler trace). Here both sorts are values-only: per-chunk sorted
    values give the chunk winners, whose k-th largest is the exact global
    k-th value τ (the global top-k multiset is contained in the union of
    per-chunk top-k's); the mask is then `x > τ` plus the first
    (k − |x > τ|) ties at τ in index order via a chunked cumulative count.

    Assumes x contains no -inf (the padding sentinel).
    """
    A = x.shape[-1]
    if A <= max(chunk, 2 * k):
        _, idx = jax.lax.top_k(x, min(k, A))
        mask = jnp.zeros(x.shape, bool)
        return jax.vmap(lambda m, i: m.at[i].set(True, mode="drop"))(
            mask.reshape(-1, A), idx.reshape(-1, min(k, A))).reshape(x.shape)
    pad = (-A) % chunk
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)],
                 constant_values=-jnp.inf) if pad else x
    n_chunks = xp.shape[-1] // chunk
    xc = xp.reshape(*x.shape[:-1], n_chunks, chunk)
    top_c = jax.lax.slice_in_dim(jnp.sort(xc, axis=-1), chunk - k, chunk,
                                 axis=-1)                     # (…, C, k) asc
    winners = top_c.reshape(*x.shape[:-1], n_chunks * k)
    tau = jnp.sort(winners, axis=-1)[..., n_chunks * k - k]   # exact k-th value

    gt = x > tau[..., None]
    n_gt = gt.sum(axis=-1, keepdims=True)
    tie = x == tau[..., None]
    # Chunked cumulative tie count (intra-chunk cumsum + inter-chunk offsets
    # beats one 34k-long scan on TPU).
    tie_c = jnp.pad(tie, [(0, 0)] * (x.ndim - 1) + [(0, pad)]) if pad else tie
    tie_c = tie_c.reshape(*x.shape[:-1], n_chunks, chunk).astype(jnp.int32)
    intra = jnp.cumsum(tie_c, axis=-1)
    totals = intra[..., -1]
    offs = jnp.cumsum(totals, axis=-1) - totals
    rank = (intra + offs[..., None]).reshape(*x.shape[:-1], n_chunks * chunk)
    rank = rank[..., :A] if pad else rank
    return gt | (tie & (rank <= (k - n_gt)))


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
