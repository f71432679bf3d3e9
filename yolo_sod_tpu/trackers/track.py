"""Tracker registration: hook BYTETracker / BOTSORT into predictor callbacks
(reference trackers/track.py:18-104 — on_predict_start builds trackers from
cfg/trackers/*.yaml, on_predict_postprocess_end rewrites Results boxes with
track ids).
"""

from __future__ import annotations

from pathlib import Path
from types import SimpleNamespace

import numpy as np

from yolo_sod_tpu.trackers.bot_sort import BOTSORT
from yolo_sod_tpu.trackers.byte_tracker import BYTETracker
from yolo_sod_tpu.utils import ROOT, yaml_load

TRACKER_MAP = {"bytetrack": BYTETracker, "botsort": BOTSORT}


def load_tracker_cfg(tracker_yaml: str) -> SimpleNamespace:
    path = Path(tracker_yaml)
    if not path.exists():
        path = ROOT / "cfg" / "trackers" / f"{Path(tracker_yaml).stem}.yaml"
    return SimpleNamespace(**yaml_load(path))


def make_tracker(tracker_yaml: str = "bytetrack.yaml", frame_rate: int = 30):
    cfg = load_tracker_cfg(tracker_yaml)
    if cfg.tracker_type not in TRACKER_MAP:
        raise ValueError(f"unknown tracker_type '{cfg.tracker_type}'")
    return TRACKER_MAP[cfg.tracker_type](args=cfg, frame_rate=frame_rate)


class _BoxView:
    """Adapter giving a Results.boxes the .conf/.xywh/.cls arrays the
    trackers consume."""

    def __init__(self, boxes):
        self.conf = boxes.conf
        self.xywh = boxes.xywh
        self.cls = boxes.cls


def register_tracker(model, persist: bool = False):
    """Attach tracking to a Model: predictor results gain track ids."""
    state = {"tracker": None}

    def on_predict_postprocess_end(predictor, result):
        if state["tracker"] is None or not persist:
            if state["tracker"] is None:
                tracker_name = getattr(predictor.args, "tracker", None) or "bytetrack.yaml"
                state["tracker"] = make_tracker(tracker_name)
        tracker = state["tracker"]
        det = result.boxes
        if len(det) == 0:
            tracker.update(SimpleNamespace(conf=np.zeros(0), xywh=np.zeros((0, 4)),
                                           cls=np.zeros(0)), result.orig_img)
            return
        tracks = tracker.update(_BoxView(det), result.orig_img)
        if len(tracks) == 0:
            result.boxes = result.boxes[np.zeros(0, dtype=int)]
            return
        idx = tracks[:, -1].astype(int)
        # Rebuild boxes: [x1 y1 x2 y2 conf cls id] ordered by track
        data = det.data[idx]
        new = np.concatenate([data[:, :4], data[:, 4:5], data[:, 5:6],
                              tracks[:, 4:5]], axis=1)
        from yolo_sod_tpu.engine.results import Boxes

        result.boxes = Boxes(new, result.orig_shape)

    def hook(predictor):
        predictor.callbacks.setdefault("on_predict_postprocess_end", []).append(
            on_predict_postprocess_end)

    if model.predictor is not None:
        hook(model.predictor)
    else:
        model._tracker_hook = hook   # predictor attaches lazily in Model.track
    return hook
