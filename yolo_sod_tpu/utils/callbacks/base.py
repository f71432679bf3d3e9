"""Callback event bus: the same 23 event names as the reference
(utils/callbacks/base.py), so staged-training scripts port unchanged.

Each event maps to a list of callables taking the emitting object (trainer /
validator / predictor / exporter).
"""

from __future__ import annotations

from collections import defaultdict
from copy import deepcopy

# fmt: off
EVENTS = [
    # trainer
    "on_pretrain_routine_start", "on_pretrain_routine_end",
    "on_train_start", "on_train_epoch_start", "on_train_batch_start",
    "optimizer_step", "on_before_zero_grad", "on_train_batch_end",
    "on_train_epoch_end", "on_fit_epoch_end", "on_model_save",
    "on_train_end", "on_params_update", "teardown",
    # validator
    "on_val_start", "on_val_batch_start", "on_val_batch_end", "on_val_end",
    # predictor
    "on_predict_start", "on_predict_batch_start", "on_predict_postprocess_end",
    "on_predict_batch_end", "on_predict_end",
    # exporter
    "on_export_start", "on_export_end",
]
# fmt: on

default_callbacks = {event: [] for event in EVENTS}


def get_default_callbacks() -> dict:
    """Fresh copy of the empty event->handlers map."""
    return defaultdict(list, deepcopy(default_callbacks))


def add_integration_callbacks(instance) -> None:
    """Attach enabled logger integrations, each import-guarded
    (reference utils/callbacks/* — each module exposes an empty `callbacks`
    dict when its package is absent, so attaching is a no-op; `hub` is a
    declared non-goal, SURVEY §7)."""
    modules = []
    for name in ("tensorboard", "wb", "mlflow", "clearml", "comet", "dvc",
                 "neptune", "raytune"):
        try:
            modules.append(__import__(f"yolo_sod_tpu.utils.callbacks.{name}",
                                      fromlist=["callbacks"]))
        except Exception:
            pass
    for mod in modules:
        for event, fn in getattr(mod, "callbacks", {}).items():
            if fn not in instance.callbacks[event]:
                instance.callbacks[event].append(fn)
