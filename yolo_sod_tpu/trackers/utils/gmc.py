"""Global (camera) motion compensation (reference trackers/utils/gmc.py).

Estimates a 2x3 affine warp between consecutive frames. Four real methods,
matching the reference's menu (gmc.py:1-377):

- sparseOptFlow (default, BoT-SORT config): Shi-Tomasi corners + pyramidal
  Lucas-Kanade flow + RANSAC partial affine.
- orb / sift: feature detection + descriptor matching (Hamming / L2 ratio
  test with a spatial-consistency gate) + RANSAC partial affine.
- ecc: direct intensity alignment, cv2.findTransformECC (euclidean motion).

All host-side cv2/numpy — camera motion is a per-frame scalar problem, not a
device workload.
"""

from __future__ import annotations

import numpy as np

from yolo_sod_tpu.utils import LOGGER


class GMC:
    def __init__(self, method: str = "sparseOptFlow", downscale: int = 2):
        method = (method or "none").lower()
        aliases = {"sparseoptflow": "sparseOptFlow", "orb": "orb",
                   "sift": "sift", "ecc": "ecc", "none": "none"}
        if method not in aliases:
            raise ValueError(f"unknown GMC method '{method}' "
                             f"(valid: {sorted(aliases)})")
        self.method = aliases[method]
        self.downscale = max(1, int(downscale))
        self.prevFrame = None
        self.prevKeyPoints = None
        self.prevDescriptors = None
        self.initializedFirstFrame = False
        self._detector = self._extractor = self._matcher = None

    # -- dispatch --------------------------------------------------------------
    def apply(self, raw_frame, detections=None) -> np.ndarray:
        if self.method == "sparseOptFlow":
            return self._apply_sparse(raw_frame)
        if self.method in ("orb", "sift"):
            return self._apply_features(raw_frame, detections)
        if self.method == "ecc":
            return self._apply_ecc(raw_frame)
        return np.eye(2, 3)

    def _preprocess(self, raw_frame):
        import cv2

        frame = cv2.cvtColor(raw_frame, cv2.COLOR_BGR2GRAY)
        if self.downscale > 1:
            frame = cv2.resize(frame, (frame.shape[1] // self.downscale,
                                       frame.shape[0] // self.downscale))
        return frame

    def _rescale(self, H: np.ndarray) -> np.ndarray:
        if self.downscale > 1:
            H = H.copy()
            H[0, 2] *= self.downscale
            H[1, 2] *= self.downscale
        return H

    # -- sparse optical flow ---------------------------------------------------
    def _apply_sparse(self, raw_frame) -> np.ndarray:
        import cv2

        H = np.eye(2, 3)
        frame = self._preprocess(raw_frame)
        keypoints = cv2.goodFeaturesToTrack(frame, maxCorners=1000, qualityLevel=0.01,
                                            minDistance=1, blockSize=3)
        if not self.initializedFirstFrame or keypoints is None or \
                self.prevKeyPoints is None:
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
                H = self._rescale(M)
            else:
                LOGGER.warning("GMC: affine estimation failed, identity warp")
        self.prevFrame = frame.copy()
        self.prevKeyPoints = keypoints
        return H

    # -- feature matching (orb / sift) ------------------------------------------
    def _init_features(self):
        import cv2

        if self.method == "orb":
            self._detector = cv2.FastFeatureDetector_create(threshold=20)
            self._extractor = cv2.ORB_create()
            self._matcher = cv2.BFMatcher(cv2.NORM_HAMMING)
        else:  # sift
            self._detector = cv2.SIFT_create(nOctaveLayers=3,
                                             contrastThreshold=0.02,
                                             edgeThreshold=20)
            self._extractor = self._detector
            self._matcher = cv2.BFMatcher(cv2.NORM_L2)

    def _apply_features(self, raw_frame, detections=None) -> np.ndarray:
        import cv2

        if self._detector is None:
            self._init_features()
        H = np.eye(2, 3)
        frame = self._preprocess(raw_frame)
        h, w = frame.shape

        # Detect only on the image border band (the reference masks out the
        # central region + detection boxes — moving objects corrupt the
        # camera-motion estimate).
        mask = np.zeros_like(frame)
        mask[int(0.02 * h): int(0.98 * h), int(0.02 * w): int(0.98 * w)] = 255
        if detections is not None:
            for det in detections:
                x1, y1, x2, y2 = (np.asarray(det[:4]) / self.downscale).astype(int)
                mask[max(y1, 0): y2, max(x1, 0): x2] = 0

        keypoints = self._detector.detect(frame, mask)
        keypoints, descriptors = self._extractor.compute(frame, keypoints)

        if not self.initializedFirstFrame or self.prevDescriptors is None:
            self.prevFrame = frame.copy()
            self.prevKeyPoints = keypoints
            self.prevDescriptors = descriptors
            self.initializedFirstFrame = descriptors is not None
            return H

        if descriptors is None or len(keypoints) < 5:
            return H

        knn = self._matcher.knnMatch(self.prevDescriptors, descriptors, k=2)
        # Lowe ratio test + spatial-consistency gate: a valid camera-motion
        # correspondence moves less than ~10% of the frame.
        good, spatial = [], []
        for pair in knn:
            if len(pair) != 2:
                continue
            m, n = pair
            if m.distance < 0.9 * n.distance:
                p = self.prevKeyPoints[m.queryIdx].pt
                c = keypoints[m.trainIdx].pt
                d = (c[0] - p[0], c[1] - p[1])
                if abs(d[0]) < 0.25 * w and abs(d[1]) < 0.25 * h:
                    good.append(m)
                    spatial.append(d)
        if len(spatial) > 4:
            d = np.asarray(spatial)
            mean, std = d.mean(0), d.std(0) + 1e-6
            inlier = (np.abs(d - mean) < 2.5 * std).all(1)
            prev_pts = np.array([self.prevKeyPoints[m.queryIdx].pt
                                 for m, k in zip(good, inlier) if k])
            curr_pts = np.array([keypoints[m.trainIdx].pt
                                 for m, k in zip(good, inlier) if k])
            if len(prev_pts) > 4:
                M, _ = cv2.estimateAffinePartial2D(prev_pts, curr_pts,
                                                   method=cv2.RANSAC)
                if M is not None:
                    H = self._rescale(M)
                else:
                    LOGGER.warning("GMC: affine estimation failed, identity warp")

        self.prevFrame = frame.copy()
        self.prevKeyPoints = keypoints
        self.prevDescriptors = descriptors
        return H

    # -- ECC direct alignment -----------------------------------------------------
    def _apply_ecc(self, raw_frame) -> np.ndarray:
        import cv2

        H = np.eye(2, 3, dtype=np.float32)
        frame = self._preprocess(raw_frame)
        frame = cv2.GaussianBlur(frame, (3, 3), 1.5)
        if not self.initializedFirstFrame:
            self.prevFrame = frame.copy()
            self.initializedFirstFrame = True
            return H
        criteria = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 100, 1e-5)
        try:
            _, H = cv2.findTransformECC(self.prevFrame, frame, H,
                                        cv2.MOTION_EUCLIDEAN, criteria, None, 1)
            H = self._rescale(np.asarray(H))
        except cv2.error as e:
            LOGGER.warning(f"GMC: ECC alignment failed, identity warp ({e})")
        self.prevFrame = frame.copy()
        return H

    def reset_params(self):
        self.prevFrame = None
        self.prevKeyPoints = None
        self.prevDescriptors = None
        self.initializedFirstFrame = False
