"""Global (camera) motion compensation (reference trackers/utils/gmc.py).

Estimates a 2x3 affine warp between consecutive frames; sparseOptFlow is the
default (BoT-SORT config). All host-side cv2/numpy.
"""

from __future__ import annotations

import numpy as np

from yolo_sod_tpu.utils import LOGGER


class GMC:
    def __init__(self, method: str = "sparseOptFlow", downscale: int = 2):
        self.method = method
        self.downscale = max(1, int(downscale))
        self.prevFrame = None
        self.prevKeyPoints = None
        self.initializedFirstFrame = False

    def apply(self, raw_frame, detections=None) -> np.ndarray:
        if self.method in ("orb", "sift", "ecc", "sparseOptFlow"):
            return self._apply_sparse(raw_frame)
        return np.eye(2, 3)

    def _apply_sparse(self, raw_frame) -> np.ndarray:
        import cv2

        H = np.eye(2, 3)
        frame = cv2.cvtColor(raw_frame, cv2.COLOR_BGR2GRAY)
        if self.downscale > 1:
            frame = cv2.resize(frame, (frame.shape[1] // self.downscale,
                                       frame.shape[0] // self.downscale))
        keypoints = cv2.goodFeaturesToTrack(frame, maxCorners=1000, qualityLevel=0.01,
                                            minDistance=1, blockSize=3)
        if not self.initializedFirstFrame or keypoints is None:
            self.prevFrame = frame.copy()
            self.prevKeyPoints = keypoints
            self.initializedFirstFrame = keypoints is not None
            return H
        matched, status, _ = cv2.calcOpticalFlowPyrLK(self.prevFrame, frame,
                                                      self.prevKeyPoints, None)
        prev_pts = self.prevKeyPoints[status.flatten() == 1] \
            if status is not None else np.empty((0, 1, 2))
        curr_pts = matched[status.flatten() == 1] \
            if (matched is not None and status is not None) else np.empty((0, 1, 2))
        if len(prev_pts) > 4:
            M, _ = cv2.estimateAffinePartial2D(prev_pts, curr_pts, method=cv2.RANSAC)
            if M is not None:
                H = M
                if self.downscale > 1:
                    H[0, 2] *= self.downscale
                    H[1, 2] *= self.downscale
            else:
                LOGGER.warning("GMC: affine estimation failed, identity warp")
        self.prevFrame = frame.copy()
        self.prevKeyPoints = keypoints
        return H

    def reset_params(self):
        self.prevFrame = None
        self.prevKeyPoints = None
        self.initializedFirstFrame = False
