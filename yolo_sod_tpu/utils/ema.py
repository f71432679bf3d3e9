"""Exponential moving average of a parameter pytree with ramped decay.

TPU-native analog of reference ModelEMA (torch_utils.py:495-531): decay ramps
as d = decay * (1 - exp(-updates / tau)), same constants, but expressed as a
pure function folded into the jitted train step (no module copy, no
state_dict walk).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_tree, new_tree, updates, decay: float = 0.9999, tau: float = 2000.0):
    """One EMA step. `updates` is the (traced) update counter AFTER increment."""
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))
    return jax.tree_util.tree_map(lambda e, p: e * d + (1.0 - d) * p.astype(e.dtype),
                                  ema_tree, new_tree)


def ema_init(tree):
    """EMA starts as a copy of the params.

    Must be a genuine copy: astype on an already-fp32 leaf is a no-op that
    aliases the same buffer, and aliased params/ema leaves break the train
    step's buffer donation (donate-twice error).
    """
    return jax.tree_util.tree_map(lambda p: jnp.array(p, dtype=jnp.float32, copy=True), tree)
