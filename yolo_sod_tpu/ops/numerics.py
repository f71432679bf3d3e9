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
