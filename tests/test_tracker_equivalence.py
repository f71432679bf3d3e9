"""Recorded-sequence tracker equivalence vs the torch reference.

Feeds identical synthetic detection streams (moving objects, confidence
flicker through the low band, dropouts, clutter births) through the
reference BYTETracker/BOTSORT (imported via the shim; `lap.lapjv` emulated
with its own documented square-extension on scipy's solver) and our
array-first re-design, and asserts frame-by-frame identical track ids,
boxes, scores, classes, and detection indices.

This pins the association semantics (two-stage BYTE, unconfirmed gate,
re-activation, expiry, duplicate pruning) across a structural rewrite —
reference trackers/byte_tracker.py:235-476, bot_sort.py:147-233.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.is_dir(), reason="reference unavailable")


def _install_lap_shim():
    """Emulate lap.lapjv(extend_cost=True, cost_limit=t) exactly the way lap
    itself implements cost limits: embed the (n, m) costs in an (n+m, n+m)
    square filled with cost_limit/2 (dummy↔dummy = 0) and solve the square
    LAP; x[i] = assigned column or -1, y[j] = assigned row or -1."""
    import scipy.optimize

    def lapjv(cost, extend_cost=False, cost_limit=np.inf, return_cost=True):
        cost = np.asarray(cost, np.float64)
        n, m = cost.shape
        if cost_limit < np.inf:
            ext = np.full((n + m, n + m), cost_limit / 2.0)
            ext[n:, m:] = 0.0
            ext[:n, :m] = cost
        elif extend_cost and n != m:
            k = max(n, m)
            ext = np.zeros((k, k))
            ext[:n, :m] = cost
        else:
            ext = cost
        rows, cols = scipy.optimize.linear_sum_assignment(ext)
        x = np.full(n, -1, int)
        y = np.full(m, -1, int)
        total = 0.0
        for r, c in zip(rows, cols):
            if r < n and c < m:
                x[r], y[c] = c, r
                total += cost[r, c]
        return (total, x, y) if return_cost else (x, y)

    mod = types.ModuleType("lap")
    mod.lapjv = lapjv
    mod.__version__ = "0.5.12"
    sys.modules["lap"] = mod


def _ref_trackers():
    from tests import reference_shim
    reference_shim.install()
    _install_lap_shim()
    from ultralytics.trackers.bot_sort import BOTSORT as RefBOTSORT
    from ultralytics.trackers.byte_tracker import BYTETracker as RefBYTE
    return RefBYTE, RefBOTSORT


def _cfg(**kw):
    base = dict(tracker_type="bytetrack", track_high_thresh=0.5,
                track_low_thresh=0.1, new_track_thresh=0.6, track_buffer=12,
                match_thresh=0.8, fuse_score=True,
                proximity_thresh=0.5, appearance_thresh=0.25,
                gmc_method="none", with_reid=False)
    base.update(kw)
    return SimpleNamespace(**base)


def _sequence(seed: int, frames: int = 60, n_obj: int = 8, imgsz: float = 640.0):
    """Synthetic stream: constant-velocity objects with jitter, confidence
    flicker through the low band, dropouts, and random clutter."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(80, imgsz - 80, (n_obj, 2))
    vel = rng.normal(0, 2.0, (n_obj, 2))
    size = rng.uniform(18, 60, (n_obj, 2))
    for _ in range(frames):
        pos = pos + vel
        dets = []
        for i in range(n_obj):
            r = rng.random()
            if r < 0.12:
                continue                         # dropout
            conf = 0.25 if r < 0.30 else rng.uniform(0.55, 0.95)
            c = pos[i] + rng.normal(0, 1.5, 2)
            w, h = size[i] * rng.uniform(0.92, 1.08, 2)
            dets.append([c[0], c[1], w, h, conf, i % 3])
        for _ in range(rng.integers(0, 3)):      # clutter
            c = rng.uniform(40, imgsz - 40, 2)
            dets.append([c[0], c[1], *rng.uniform(12, 50, 2),
                         rng.uniform(0.15, 0.9), rng.integers(0, 3)])
        dets = np.asarray(dets, np.float32).reshape(-1, 6)
        yield SimpleNamespace(conf=dets[:, 4], xywh=dets[:, :4], cls=dets[:, 5])


def _norm(rows: np.ndarray) -> np.ndarray:
    rows = np.asarray(rows, np.float64).reshape(-1, 8)
    return rows[np.argsort(rows[:, 4])]          # sort by track id


@pytest.mark.parametrize("kind", ["byte", "botsort"])
@pytest.mark.parametrize("seed", [0, 1])
def test_tracker_matches_reference(kind, seed):
    RefBYTE, RefBOTSORT = _ref_trackers()
    from yolo_sod_tpu.trackers.bot_sort import BOTSORT
    from yolo_sod_tpu.trackers.byte_tracker import BYTETracker

    if kind == "byte":
        ref, ours = RefBYTE(_cfg(), frame_rate=30), BYTETracker(_cfg(), frame_rate=30)
    else:
        cfg = _cfg(tracker_type="botsort")
        ref, ours = RefBOTSORT(cfg, frame_rate=30), BOTSORT(cfg, frame_rate=30)

    for f, res in enumerate(_sequence(seed)):
        a = _norm(ref.update(SimpleNamespace(conf=res.conf.copy(),
                                             xywh=res.xywh.copy(),
                                             cls=res.cls.copy())))
        b = _norm(ours.update(res))
        assert a.shape == b.shape, f"frame {f}: {a.shape} vs {b.shape}"
        np.testing.assert_array_equal(b[:, 4], a[:, 4], err_msg=f"frame {f} ids")
        np.testing.assert_allclose(b[:, :4], a[:, :4], rtol=1e-6, atol=1e-4,
                                   err_msg=f"frame {f} boxes")
        np.testing.assert_allclose(b[:, 5], a[:, 5], rtol=1e-6,
                                   err_msg=f"frame {f} scores")
        np.testing.assert_array_equal(b[:, 6], a[:, 6], err_msg=f"frame {f} cls")
        np.testing.assert_array_equal(b[:, 7], a[:, 7], err_msg=f"frame {f} det idx")


def test_tracker_reset_restarts_ids():
    from yolo_sod_tpu.trackers.byte_tracker import BYTETracker

    t = BYTETracker(_cfg(), frame_rate=30)
    for res in _sequence(3, frames=5):
        out = t.update(res)
    t.reset()
    first = None
    for res in _sequence(3, frames=2):
        out = t.update(res)
        if first is None and len(out):
            first = out[:, 4].min()
    assert t.frame_id == 2 and (first is None or first <= len(res.conf) + 1)
