"""The SPMD training step: loss + grad + update, compiled once by XLA.

TPU-native replacement for the reference's batch loop body
(engine/trainer.py:363-423 — forward, scaler.scale(loss).backward(), DDP
all-reduce, optimizer_step with unscale+clip+EMA :586-594). Differences forced
by the platform, all in our favor:

- One jitted function does forward+backward+clip+update+EMA; the gradient
  all-reduce is an XLA collective over ICI inserted by the compiler from the
  batch sharding (no DDP wrapper, no `loss *= world_size`, trainer.py:382).
- bf16 compute with fp32 master params replaces the AMP GradScaler machinery
  (trainer.py:260-271, checks.py:648): TPUs have native bf16 with fp32
  accumulation on the MXU, so there is no inf/nan scaler dance at all.
- Warmup lr/momentum interpolation (trainer.py:367-376) becomes a host-side
  schedule passed in as traced scalars — no retrace per step.

Optimizer parity (build_optimizer, reference trainer.py:759-821): SGD with
nesterov momentum 0.937 and weight_decay 5e-4 applied ONLY to conv/linear
kernels — biases and norm-layer scales are never decayed (the reference's
3-param-group construction :790-815). "auto" selection picks SGD(lr=0.01)
when total iterations > 10k else AdamW(lr=0.002·5/(4+nc)), reference
:779-788.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from yolo_sod_tpu.ops.numerics import image_to_compute
from yolo_sod_tpu.utils.ema import ema_init, ema_update


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Everything the jitted step mutates, as one pytree."""

    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    step: jax.Array                 # int32 global step (optimizer updates)


def decay_mask(params) -> Any:
    """True for leaves that receive weight decay: rank >= 2 kernels only.

    Reproduces the reference's param-group split (trainer.py:790-798): conv /
    linear kernels decay; biases and 1-D norm scales don't. Rank is a faithful
    proxy — BN scale/bias and conv bias are 1-D, kernels are 2-D+.
    """
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def build_optimizer(params, name: str = "auto", lr: float = 0.01,
                    momentum: float = 0.937, weight_decay: float = 5e-4,
                    iterations: float = 1e5, nc: int = 80,
                    grad_clip_norm: float = 10.0) -> optax.GradientTransformation:
    """Construct the optax chain (reference build_optimizer trainer.py:759-821).

    lr and momentum are injected hyperparams: the trainer overwrites them
    per-step on the host (warmup + schedule) without retracing.
    """
    if name == "auto":
        if iterations > 10000:
            name, lr, momentum = "SGD", 0.01, 0.9
        else:
            name, lr, momentum = "AdamW", round(0.002 * 5 / (4 + nc), 6), 0.9

    mask = decay_mask(params)

    if name.lower() in ("sgd",):
        @optax.inject_hyperparams
        def make(learning_rate, momentum):
            return optax.chain(
                optax.clip_by_global_norm(grad_clip_norm),
                optax.add_decayed_weights(weight_decay, mask=mask),
                optax.sgd(learning_rate, momentum=momentum, nesterov=True),
            )
        return make(learning_rate=lr, momentum=momentum)
    if name.lower() in ("adamw", "adam", "nadam", "radam"):
        @optax.inject_hyperparams
        def make(learning_rate, momentum):
            return optax.chain(
                optax.clip_by_global_norm(grad_clip_norm),
                optax.add_decayed_weights(weight_decay, mask=mask),
                optax.adamw(learning_rate, b1=momentum, b2=0.999,
                            weight_decay=0.0),
            )
        return make(learning_rate=lr, momentum=momentum)
    if name.lower() == "rmsprop":
        @optax.inject_hyperparams
        def make(learning_rate, momentum):
            return optax.chain(
                optax.clip_by_global_norm(grad_clip_norm),
                optax.add_decayed_weights(weight_decay, mask=mask),
                optax.rmsprop(learning_rate, momentum=momentum),
            )
        return make(learning_rate=lr, momentum=momentum)
    raise ValueError(f"unknown optimizer '{name}'")


def _find_hyperparams(state):
    """Locate the inject_hyperparams state inside MultiSteps / chain wrappers."""
    if hasattr(state, "hyperparams"):
        return state.hyperparams
    if hasattr(state, "inner_opt_state"):
        return _find_hyperparams(state.inner_opt_state)
    if isinstance(state, (tuple, list)):
        for s in state:
            hp = _find_hyperparams(s)
            if hp is not None:
                return hp
    return None


def set_hyperparams(opt_state, lr: float, momentum: Optional[float] = None):
    """Overwrite injected lr/momentum in-place on the host (no retrace)."""
    hp = _find_hyperparams(opt_state)
    if hp is None:
        return opt_state
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    if momentum is not None and "momentum" in hp:
        hp["momentum"] = jnp.asarray(momentum, jnp.float32)
    return opt_state


def init_train_state(model, tx: optax.GradientTransformation,
                     variables=None) -> TrainState:
    """Build the initial TrainState from a DetectionModel's variables."""
    variables = variables if variables is not None else model.variables
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=ema_init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(model, criterion, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None, accumulate: int = 1,
                    compute_dtype=jnp.bfloat16,
                    active_mask: Optional[tuple] = None) -> Callable:
    """Build the jitted (state, batch) -> (state, loss_items) step.

    Batch layout (dict of arrays, leading dim = global batch):
        img (B, H, W, 3) uint8 RGB (or float in [0,1]) — normalized to
        compute_dtype inside the graph (ops/numerics.image_to_compute);
        cls (B, M), bboxes (B, M, 4), mask_gt (B, M).

    With a mesh, the batch shards over the 'data' axis and params replicate;
    the gradient all-reduce is emitted by XLA. `active_mask` is a static
    per-level (0/1) tuple for DetectStable scale gating — changing it
    recompiles, which the staged trainer does once per stage boundary, not
    per step (reference train_yolov12_staged.py:199-218).
    """

    def loss_fn(params, batch_stats, batch):
        x = image_to_compute(batch["img"], compute_dtype)
        # Mixed precision, master-weights pattern: the forward consumes a
        # compute_dtype copy of the params (otherwise f32 params promote
        # every conv back to f32, silently running the whole step in f32);
        # autodiff casts grads back to f32 through the astype VJP, and the
        # optimizer update runs on the f32 masters. BN statistics stay f32
        # (they live in batch_stats, not params).
        if compute_dtype != jnp.float32:
            p_c = jax.tree_util.tree_map(
                lambda p: p.astype(compute_dtype)
                if p.dtype == jnp.float32 else p, params)
        else:
            p_c = params
        variables = {"params": p_c, "batch_stats": batch_stats}
        mask = jnp.asarray(active_mask, jnp.float32) if active_mask is not None else None
        # YOLO-World batches carry a text-embedding guide; every other task's
        # batch simply lacks the key and guide stays None.
        out = model.net.apply(variables, x, train=True, active_mask=mask,
                              guide=batch.get("txt_feats"),
                              mutable=["batch_stats"])
        feats, mutated = out
        total, items = criterion(feats, batch)
        return total, (items, mutated.get("batch_stats", batch_stats))

    def step_fn(state: TrainState, batch) -> tuple:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (items, new_bs)), grads = grad_fn(state.params, state.batch_stats, batch)
        grad_norm = optax.global_norm(grads)
        step = state.step + 1
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if accumulate > 1:
            # tx is wrapped in optax.MultiSteps: params only move every
            # `accumulate`-th micro-batch; gate the EMA on applied steps so
            # its decay ramp counts optimizer updates like the reference
            # (trainer.py:592 — EMA inside optimizer_step only).
            applied = (step % accumulate) == 0
            n_applied = step // accumulate
            new_ema = ema_update(state.ema_params, params, n_applied)
            ema = jax.tree_util.tree_map(
                lambda e, n: jnp.where(applied, n, e), state.ema_params, new_ema)
        else:
            ema = ema_update(state.ema_params, params, step)
        return TrainState(params=params, batch_stats=new_bs, opt_state=opt_state,
                          ema_params=ema, step=step), \
            {"loss": loss, "items": items, "grad_norm": grad_norm}

    # Sharding follows the data: place state replicated and the batch split
    # over 'data' (shard_state / mesh.shard_batch) and jit propagates — XLA
    # inserts the gradient all-reduce over ICI.
    return jax.jit(step_fn, donate_argnums=(0,))


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Replicate the train state over every device in the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)
