"""Association cost matrices + linear assignment (reference trackers/utils/matching.py)."""

from __future__ import annotations

import numpy as np

try:
    from scipy.optimize import linear_sum_assignment

    SCIPY = True
except Exception:  # pragma: no cover
    SCIPY = False


def linear_assignment(cost_matrix: np.ndarray, thresh: float):
    """Hungarian assignment with cost gating.

    Returns (matches (K, 2), unmatched_a, unmatched_b).
    """
    if cost_matrix.size == 0:
        return (np.empty((0, 2), int), tuple(range(cost_matrix.shape[0])),
                tuple(range(cost_matrix.shape[1])))
    if SCIPY:
        # Constrained assignment with a per-pair cost ceiling — the same
        # problem lap.lapjv(extend_cost=True, cost_limit=thresh) solves (the
        # reference's production path, trackers/utils/matching.py:46): embed
        # the (n, m) costs in an (n+m, n+m) square where staying unmatched
        # costs thresh/2 per side, so a real pair is taken iff its cost beats
        # thresh. A plain lsap-then-filter can differ (it must match
        # everything, then drops over-threshold pairs that a constrained
        # optimum would have rerouted).
        n, m = cost_matrix.shape
        ext = np.full((n + m, n + m), thresh / 2.0, cost_matrix.dtype)
        ext[n:, m:] = 0.0
        ext[:n, :m] = cost_matrix
        rows, cols = linear_sum_assignment(ext)
        matches = [[r, c] for r, c in zip(rows, cols) if r < n and c < m]
    else:  # greedy fallback
        matches = []
        used_r, used_c = set(), set()
        order = np.argsort(cost_matrix, axis=None)
        for flat in order:
            r, c = divmod(int(flat), cost_matrix.shape[1])
            if r in used_r or c in used_c or cost_matrix[r, c] > thresh:
                continue
            matches.append([r, c])
            used_r.add(r)
            used_c.add(c)
    matches = np.array(matches, int).reshape(-1, 2)
    unmatched_a = tuple(sorted(set(range(cost_matrix.shape[0])) - set(matches[:, 0])))
    unmatched_b = tuple(sorted(set(range(cost_matrix.shape[1])) - set(matches[:, 1])))
    return matches, unmatched_a, unmatched_b


def iou_distance(atracks, btracks) -> np.ndarray:
    """1 - IoU between two track/box lists (xyxy via .xyxy or raw arrays)."""
    from yolo_sod_tpu.utils.metrics import box_iou

    a = np.ascontiguousarray([t if isinstance(t, np.ndarray) else t.xyxy
                              for t in atracks], np.float32).reshape(len(atracks), 4)
    b = np.ascontiguousarray([t if isinstance(t, np.ndarray) else t.xyxy
                              for t in btracks], np.float32).reshape(len(btracks), 4)
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    return 1.0 - box_iou(a, b).astype(np.float32)


def embedding_distance(tracks, detections, metric: str = "cosine") -> np.ndarray:
    """Appearance cosine distance between track features and detections."""
    cost = np.zeros((len(tracks), len(detections)), np.float32)
    if cost.size == 0:
        return cost
    det_feats = np.asarray([d.curr_feat for d in detections], np.float32)
    trk_feats = np.asarray([t.smooth_feat for t in tracks], np.float32)
    det_n = det_feats / (np.linalg.norm(det_feats, axis=1, keepdims=True) + 1e-9)
    trk_n = trk_feats / (np.linalg.norm(trk_feats, axis=1, keepdims=True) + 1e-9)
    return np.maximum(0.0, 1.0 - trk_n @ det_n.T)


def fuse_score(cost_matrix: np.ndarray, detections) -> np.ndarray:
    """Fuse detection confidence into the IoU cost (ByteTrack)."""
    if cost_matrix.size == 0:
        return cost_matrix
    iou_sim = 1 - cost_matrix
    det_scores = np.array([d.score for d in detections])
    det_scores = np.broadcast_to(det_scores[None], cost_matrix.shape)
    return 1 - iou_sim * det_scores
