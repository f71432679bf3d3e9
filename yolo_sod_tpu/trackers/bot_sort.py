"""BoT-SORT tracker: BYTE + camera-motion compensation + optional ReID
(reference trackers/bot_sort.py — BOTrack, BOTSORT :147).
"""

from __future__ import annotations

from collections import deque

import numpy as np

from yolo_sod_tpu.trackers.byte_tracker import BYTETracker, STrack
from yolo_sod_tpu.trackers.utils import matching
from yolo_sod_tpu.trackers.utils.gmc import GMC
from yolo_sod_tpu.trackers.utils.kalman_filter import KalmanFilterXYWH


class BOTrack(STrack):
    """STrack with an XYWH Kalman state and exponentially-smoothed features."""

    shared_kalman = KalmanFilterXYWH()

    def __init__(self, xywh, score, cls, feat=None, feat_history: int = 50):
        super().__init__(xywh, score, cls)
        self.smooth_feat = None
        self.curr_feat = None
        if feat is not None:
            self.update_features(feat)
        self.features = deque([], maxlen=feat_history)
        self.alpha = 0.9

    def update_features(self, feat):
        feat = feat / (np.linalg.norm(feat) + 1e-9)
        self.curr_feat = feat
        self.smooth_feat = feat if self.smooth_feat is None else \
            self.alpha * self.smooth_feat + (1 - self.alpha) * feat
        self.features.append(feat)
        self.smooth_feat /= np.linalg.norm(self.smooth_feat) + 1e-9

    def predict(self):
        mean_state = self.mean.copy()
        if self.state != 1:   # not Tracked
            mean_state[6] = 0
            mean_state[7] = 0
        self.mean, self.covariance = self.kalman_filter.predict(mean_state, self.covariance)

    @staticmethod
    def multi_predict(stracks):
        if len(stracks) == 0:
            return
        multi_mean = np.asarray([st.mean.copy() for st in stracks])
        multi_cov = np.asarray([st.covariance for st in stracks])
        for i, st in enumerate(stracks):
            if st.state != 1:
                multi_mean[i][6] = 0
                multi_mean[i][7] = 0
        multi_mean, multi_cov = BOTrack.shared_kalman.multi_predict(multi_mean, multi_cov)
        for i, (mean, cov) in enumerate(zip(multi_mean, multi_cov)):
            stracks[i].mean = mean
            stracks[i].covariance = cov

    def convert_coords(self, tlwh):
        ret = np.asarray(tlwh, np.float32).copy()
        ret[:2] += ret[2:] / 2
        return ret

    @property
    def tlwh(self):
        if self.mean is None:
            return self._tlwh.copy()
        ret = self.mean[:4].copy()
        ret[:2] -= ret[2:] / 2
        return ret


class BOTSORT(BYTETracker):
    """BYTE + GMC (+ appearance when with_reid)."""

    def __init__(self, args, frame_rate: int = 30):
        super().__init__(args, frame_rate)
        self.proximity_thresh = args.proximity_thresh
        self.appearance_thresh = args.appearance_thresh
        self.encoder = None            # ReID model hook (off by default)
        self.with_reid = getattr(args, "with_reid", False) and self.encoder is not None
        self.gmc = GMC(method=args.gmc_method)

    def get_kalmanfilter(self):
        return KalmanFilterXYWH()

    def init_track(self, dets, scores, cls, img=None):
        if len(dets) == 0:
            return []
        if self.with_reid and self.encoder is not None:
            feats = self.encoder.inference(img, dets)
            return [BOTrack(xyxy, s, c, f) for xyxy, s, c, f in zip(dets, scores, cls, feats)]
        return [BOTrack(xyxy, s, c) for xyxy, s, c in zip(dets, scores, cls)]

    def get_dists(self, tracks, detections):
        dists = matching.iou_distance(tracks, detections)
        dists_mask = dists > (1 - self.proximity_thresh)
        if self.args.fuse_score:
            dists = matching.fuse_score(dists, detections)
        if self.with_reid:
            emb = matching.embedding_distance(tracks, detections) / 2.0
            emb[emb > (1 - self.appearance_thresh)] = 1.0
            emb[dists_mask] = 1.0
            dists = np.minimum(dists, emb)
        return dists

    def multi_predict(self, tracks):
        BOTrack.multi_predict(tracks)

    def reset(self):
        super().reset()
        self.gmc.reset_params()
