"""Array-first BoT-SORT: BYTE association + camera-motion compensation
(+ optional appearance embeddings).

Behavioral contract from the reference (trackers/bot_sort.py — BOTrack,
BOTSORT :147): an (x, y, w, h) Kalman state whose vw AND vh freeze while a
track is not actively tracked, GMC-warped means/covariances each frame, a
proximity-gated IoU cost optionally fused with detection scores and (when a
ReID encoder is attached) the elementwise minimum with a gated cosine
appearance distance.

Structural re-design mirrors byte_tracker.py: no per-track objects — the
XYWH Kalman specialization is three small overrides (measurement space,
frozen velocity dims, cost builder) over the same TrackStore columns, and
appearance features live in one (N, D) matrix updated with a single
vectorized EMA rather than a deque per track.
"""

from __future__ import annotations

import numpy as np

from yolo_sod_tpu.trackers.byte_tracker import BYTETracker
from yolo_sod_tpu.trackers.utils import matching
from yolo_sod_tpu.trackers.utils.gmc import GMC
from yolo_sod_tpu.trackers.utils.kalman_filter import KalmanFilterXYWH


class BOTSORT(BYTETracker):
    """BYTE two-stage association with an XYWH Kalman state and GMC."""

    still_dims = (6, 7)                    # freeze vw and vh when not tracked
    aspect_state = False                   # Kalman mean is (x, y, w, h)
    feat_alpha = 0.9                       # appearance EMA (reference :29)

    def __init__(self, args, frame_rate: int = 30):
        super().__init__(args, frame_rate)
        self.proximity_thresh = args.proximity_thresh
        self.appearance_thresh = args.appearance_thresh
        self.encoder = None                # ReID model hook (off by default)
        self.gmc = GMC(method=args.gmc_method)

    @property
    def with_reid(self) -> bool:
        return getattr(self.args, "with_reid", False) and self.encoder is not None

    def get_kalmanfilter(self):
        return KalmanFilterXYWH()

    def measurement(self, tlwh: np.ndarray) -> np.ndarray:
        """tlwh -> center-based xywh measurements (BOTrack.convert_coords)."""
        m = tlwh.copy()
        m[:, :2] += m[:, 2:] / 2
        return m

    def det_features(self, det, img):
        """Normalized embeddings for a detection bank, when a ReID encoder
        is attached; also lazily allocates the store's feature matrix."""
        if not self.with_reid or len(det["score"]) == 0:
            return None
        feats = np.asarray(self.encoder.inference(img, det["xyxy"]), np.float64)
        feats /= np.linalg.norm(feats, axis=1, keepdims=True) + 1e-9
        if self.store.feat is None:
            self.store.feat = np.zeros((len(self.store.score), feats.shape[1]))
        return feats

    def fused_dists(self, idx, det) -> np.ndarray:
        """Proximity-gated IoU cost, score-fused, min-merged with gated
        appearance distance (reference BOTSORT.get_dists :97-107)."""
        dists = matching.iou_distance(self.store.xyxy(idx), det["xyxy"])
        too_far = dists > (1 - self.proximity_thresh)
        if self.args.fuse_score and dists.size:
            dists = 1 - (1 - dists) * det["score"][None, :]
        if self.with_reid and det.get("feat") is not None and dists.size:
            idx = np.asarray(idx, int)
            emb = np.maximum(
                0.0, 1.0 - self.store.feat[idx] @ det["feat"].T) / 2.0
            emb[emb > (1 - self.appearance_thresh)] = 1.0
            emb[too_far] = 1.0
            dists = np.minimum(dists, emb)
        return dists

    def _apply_matches(self, rows, dpos, det, frame: int):
        """EMA-smooth appearance features for matched rows, then defer to
        the shared batched KF update."""
        if len(rows) and det.get("feat") is not None and self.store.feat is not None:
            a = self.feat_alpha
            f = a * self.store.feat[rows] + (1 - a) * det["feat"][dpos]
            self.store.feat[rows] = f / (np.linalg.norm(f, axis=1, keepdims=True) + 1e-9)
        return super()._apply_matches(rows, dpos, det, frame)

    def reset(self):
        super().reset()
        self.gmc.reset_params()
