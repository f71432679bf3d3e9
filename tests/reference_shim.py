"""Import shims to load the reference torch package for parity tests.

The reference snapshot (read-only, /root/reference) can be *imported* for
ground-truth numerics, but its import chain touches packages absent from this
image (torchvision, thop) and its own missing ultralytics.data directory
(SURVEY.md §1.1). Each shim returns placeholder classes for any attribute, so
unrelated subsystems import cleanly while the nn/ model path runs for real.
"""

from __future__ import annotations

import importlib.metadata as _md
import sys
import types

REFERENCE = "/root/reference"


def _shim(name: str, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    def _fallback(attr):                               # PEP 562 fallback
        if attr.startswith("__") and attr.endswith("__"):
            raise AttributeError(attr)                 # keep inspect/importlib sane
        return type(attr, (), {})

    mod.__getattr__ = _fallback
    sys.modules[name] = mod
    return mod


_installed = False


def install() -> bool:
    """Install shims + path; returns False if the reference is unavailable."""
    global _installed
    import os

    if _installed:
        return True
    if not os.path.isdir(REFERENCE):
        return False
    _orig_version = _md.version
    _md.version = lambda n: "0.20.1" if n == "torchvision" else _orig_version(n)
    _shim("torchvision", __version__="0.20.1")
    _shim("torchvision.ops")
    _shim("thop", profile=lambda *a, **k: (0, 0))
    for sub in ("", ".augment", ".utils", ".build", ".dataset", ".converter"):
        _shim(f"ultralytics.data{sub}")
    os.environ.setdefault("YOLO_VERBOSE", "false")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    _installed = True
    return True


def build_torch_model(cfg_path: str, imgsz: int = 64):
    """Build the reference DetectionModel in train mode on CPU."""
    install()
    from ultralytics.nn.tasks import DetectionModel as TorchDM

    model = TorchDM(cfg_path, verbose=False)
    model.train()
    return model


def build_torch_task_model(cfg_path: str, task: str):
    """Build a reference task model (segment/pose/obb) in train mode on CPU.

    The reference repo ships no seg/pose/obb YAMLs, but its tasks.py keeps the
    full ultralytics task-model classes (reference nn/tasks.py:425-463), so we
    feed it OUR task YAMLs — same graph text on both sides."""
    install()
    from ultralytics.nn import tasks as ref_tasks

    cls = {"segment": ref_tasks.SegmentationModel,
           "pose": ref_tasks.PoseModel,
           "obb": ref_tasks.OBBModel}[task]
    model = cls(cfg_path, verbose=False)
    model.train()
    return model
