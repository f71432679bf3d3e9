"""Checkpoint IO: msgpack-serialized param pytrees + training state.

TPU-native analog of the reference's torch.save checkpoint dict
(trainer.py:513-546 — epoch, best_fitness, EMA-as-model, optimizer state,
train_args, metrics) and torch_safe_load (tasks.py:824-958). Format is a
single msgpack file: {meta json, model_yaml, variables, ema, opt_state}.
No pickle, no module remapping shims — pytrees are plain arrays.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

from yolo_sod_tpu.utils import LOGGER

MAGIC = b"YSTPU1\n"


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, model=None, variables=None, ema_variables=None,
                    opt_state=None, epoch: int = -1, best_fitness: float = 0.0,
                    train_args: Optional[dict] = None, metrics: Optional[dict] = None,
                    names: Optional[dict] = None, model_yaml: Optional[dict] = None,
                    step: int = 0):
    """Write a checkpoint. `model` is a DetectionModel (yields yaml + variables)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if model is not None:
        variables = variables if variables is not None else model.variables
        names = names or getattr(model, "names", None)
        model_yaml = model_yaml or model.yaml

    meta = {
        "epoch": epoch,
        "step": int(step),
        "best_fitness": float(best_fitness),
        "train_args": _jsonable(train_args or {}),
        "metrics": _jsonable(metrics or {}),
        "names": names,
        "model_yaml": _jsonable(model_yaml),
        "version": "0.1.0",
    }
    payload = {
        "variables": _to_numpy(variables) if variables is not None else {},
        "ema": _to_numpy(ema_variables) if ema_variables is not None else {},
        "opt_state": serialization.to_state_dict(opt_state) if opt_state is not None else {},
    }
    blob = serialization.msgpack_serialize(_to_numpy(payload))
    header = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        f.write(blob)
    return path


def load_checkpoint(path) -> dict[str, Any]:
    """Read a checkpoint back into {meta fields, variables, ema, opt_state}."""
    path = Path(path)
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path} is not a yolo-sod-tpu checkpoint")
        n = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(n).decode())
        payload = serialization.msgpack_restore(f.read())
    out = dict(meta)
    out.update(payload)
    # Restore integer-keyed names dict (json stringifies keys).
    if out.get("names"):
        out["names"] = {int(k): v for k, v in out["names"].items()}
    return out


def strip_optimizer(path):
    """Drop optimizer state (keep EMA as the model) to halve checkpoint size
    (reference torch_utils.py:533)."""
    ckpt = load_checkpoint(path)
    save_checkpoint(
        path,
        variables=ckpt.get("ema") or ckpt["variables"],
        epoch=-1,
        best_fitness=ckpt.get("best_fitness", 0.0),
        train_args=ckpt.get("train_args"),
        metrics=ckpt.get("metrics"),
        names=ckpt.get("names"),
        model_yaml=ckpt.get("model_yaml"),
    )
    LOGGER.info(f"optimizer stripped from {path}")


def _jsonable(obj):
    """Best-effort conversion to json-serializable structures."""
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, Path):
        return str(obj)
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return obj
    return str(obj)
