"""KF + LSTM multi-object tracker (reference nn/modules/tracker_kf_lstm.py:
Track :29, MotionLSTM :46, MultiObjectTracker :80).

DeepSORT-style variant: an 8-state constant-velocity Kalman filter per track,
Hungarian IoU association (greedy fallback), and an LSTM motion model over
recent box history that refines the KF prediction. The LSTM runs in JAX (a
single fused cell — trivially jittable); the reference needed torch + filterpy.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from yolo_sod_tpu.trackers.utils.kalman_filter import KalmanFilterXYAH
from yolo_sod_tpu.trackers.utils.matching import linear_assignment
from yolo_sod_tpu.utils.metrics import box_iou


@dataclasses.dataclass
class Track:
    """One tracked object (reference :29)."""

    track_id: int
    mean: np.ndarray
    covariance: np.ndarray
    cls: int
    score: float
    hits: int = 1
    age: int = 0
    time_since_update: int = 0
    history: list = dataclasses.field(default_factory=list)   # recent xywh

    @property
    def xyxy(self):
        x, y, a, h = self.mean[:4]
        w = a * h
        return np.array([x - w / 2, y - h / 2, x + w / 2, y + h / 2])


class MotionLSTM:
    """Single-layer LSTM over box-center deltas -> next-delta prediction
    (reference :46-78). Weights are random unless loaded; used as a residual
    refinement on the KF mean."""

    def __init__(self, input_dim: int = 4, hidden_dim: int = 32, seed: int = 0):
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(seed)
        scale = 1.0 / np.sqrt(hidden_dim)
        self.Wx = jnp.asarray(rng.uniform(-scale, scale, (input_dim, 4 * hidden_dim)))
        self.Wh = jnp.asarray(rng.uniform(-scale, scale, (hidden_dim, 4 * hidden_dim)))
        self.b = jnp.zeros((4 * hidden_dim,))
        self.Wo = jnp.asarray(rng.uniform(-scale, scale, (hidden_dim, input_dim)))
        self.hidden_dim = hidden_dim

        import functools

        @functools.partial(jax.jit)
        def run(seq, Wx, Wh, b, Wo):
            def cell(carry, x):
                h, c = carry
                z = x @ Wx + h @ Wh + b
                i, f, g, o = jnp.split(z, 4)
                c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (h, c), h

            h0 = jnp.zeros((self.hidden_dim,))
            (h, _), _ = jax.lax.scan(cell, (h0, h0), seq)
            return h @ Wo

        self._run = run

    def predict_delta(self, history: list) -> Optional[np.ndarray]:
        """Predict the next (dx, dy, dw, dh) from recent xywh history."""
        if len(history) < 3:
            return None
        import jax.numpy as jnp

        seq = np.diff(np.asarray(history[-8:], np.float32), axis=0)
        out = self._run(jnp.asarray(seq), self.Wx, self.Wh, self.b, self.Wo)
        return np.asarray(out)


class MultiObjectTracker:
    """KF + (optional) LSTM motion tracker (reference :80+)."""

    def __init__(self, iou_threshold: float = 0.3, max_age: int = 30,
                 min_hits: int = 3, use_lstm: bool = True,
                 lstm_alpha: float = 0.3):
        self.kf = KalmanFilterXYAH()
        self.iou_threshold = iou_threshold
        self.max_age = max_age
        self.min_hits = min_hits
        self.lstm = MotionLSTM() if use_lstm else None
        self.lstm_alpha = lstm_alpha
        self.tracks: list[Track] = []
        self._next_id = 1
        self.frame = 0

    @staticmethod
    def _to_xyah(xywh):
        x, y, w, h = xywh
        return np.array([x, y, w / max(h, 1e-6), h])

    def update(self, boxes_xywh: np.ndarray, scores: np.ndarray,
               classes: np.ndarray) -> np.ndarray:
        """One frame. Returns (n, 7) [x1, y1, x2, y2, id, score, cls]."""
        self.frame += 1

        # 1) Predict all tracks (KF + LSTM residual).
        for t in self.tracks:
            t.mean, t.covariance = self.kf.predict(t.mean, t.covariance)
            t.age += 1
            t.time_since_update += 1
            if self.lstm is not None:
                delta = self.lstm.predict_delta(t.history)
                if delta is not None:
                    t.mean[0] += self.lstm_alpha * delta[0]
                    t.mean[1] += self.lstm_alpha * delta[1]

        # 2) Associate by IoU (Hungarian; matching.py falls back to greedy).
        if len(self.tracks) and len(boxes_xywh):
            trk_boxes = np.stack([t.xyxy for t in self.tracks])
            det_boxes = np.stack([
                [x - w / 2, y - h / 2, x + w / 2, y + h / 2]
                for x, y, w, h in boxes_xywh])
            cost = 1.0 - box_iou(trk_boxes, det_boxes)
            matches, u_trk, u_det = linear_assignment(cost, 1.0 - self.iou_threshold)
        else:
            matches = np.empty((0, 2), int)
            u_trk = tuple(range(len(self.tracks)))
            u_det = tuple(range(len(boxes_xywh)))

        # 3) Update matched tracks.
        for ti, di in matches:
            t = self.tracks[ti]
            t.mean, t.covariance = self.kf.update(
                t.mean, t.covariance, self._to_xyah(boxes_xywh[di]))
            t.hits += 1
            t.time_since_update = 0
            t.score = float(scores[di])
            t.cls = int(classes[di])
            t.history.append(list(boxes_xywh[di]))
            if len(t.history) > 16:
                t.history.pop(0)

        # 4) Start new tracks.
        for di in u_det:
            mean, cov = self.kf.initiate(self._to_xyah(boxes_xywh[di]))
            self.tracks.append(Track(self._next_id, mean, cov,
                                     int(classes[di]), float(scores[di]),
                                     history=[list(boxes_xywh[di])]))
            self._next_id += 1

        # 5) Expire stale tracks.
        self.tracks = [t for t in self.tracks if t.time_since_update <= self.max_age]

        out = [[*t.xyxy, t.track_id, t.score, t.cls]
               for t in self.tracks
               if t.time_since_update == 0 and
               (t.hits >= self.min_hits or self.frame <= self.min_hits)]
        return np.asarray(out, np.float32).reshape(-1, 7)

    def reset(self):
        self.tracks = []
        self._next_id = 1
        self.frame = 0
