"""Detection metrics: IoU, per-class AP, confusion matrix, DetMetrics.

Host-side numpy re-implementation of reference utils/metrics.py — box_iou
(:52), bbox_iou (:74), compute_ap 101-pt interpolation (:517), ap_per_class
(:537), Metric (:626), DetMetrics (:798), ConfusionMatrix (:294). Metrics run
on the host after device compute; they are not perf-critical, and numpy keeps
the semantics byte-comparable with the reference.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from yolo_sod_tpu.utils import LOGGER


def box_iou(box1: np.ndarray, box2: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Pairwise IoU of xyxy boxes: (N, 4), (M, 4) -> (N, M)."""
    a1, a2 = np.split(box1[:, None, :], 2, axis=2)   # (N,1,2),(N,1,2)
    b1, b2 = np.split(box2[None, :, :], 2, axis=2)   # (1,M,2),(1,M,2)
    inter = np.clip(np.minimum(a2, b2) - np.maximum(a1, b1), 0, None).prod(2)
    area1 = np.clip(a2 - a1, 0, None).prod(2)
    area2 = np.clip(b2 - b1, 0, None).prod(2)
    return inter / (area1 + area2 - inter + eps)


def smooth(y: np.ndarray, f: float = 0.05) -> np.ndarray:
    """Odd-width box filter spanning ~2f of the curve, edges held constant.

    Consumers use this only to pick the max-F1 confidence index, so the
    window rule must match the protocol (reference metrics.py:432 contract):
    width = round(len*f*2)//2 + 1.
    """
    width = round(len(y) * f * 2) // 2 + 1
    hold = width // 2
    padded = np.concatenate([np.full(hold, y[0]), y, np.full(hold, y[-1])])
    return np.convolve(padded, np.full(width, 1.0 / width), mode="valid")


# The mAP protocol's fixed evaluation grids (contract constants, reference
# metrics.py:517-624): 101 recall points for the AP integral, 1000 confidence
# points for the P/R/F1-vs-confidence curves.
_AP_GRID = np.linspace(0, 1, 101)
_CONF_GRID = np.linspace(0, 1, 1000)


def _staircase_auc(recall_cols: np.ndarray, precision_cols: np.ndarray):
    """Interpolated PR-curve area for T thresholds at once.

    Takes conf-descending staircases as (n, T) columns, wraps them in the
    protocol's sentinel rows (recall 0->1, precision 1->0), takes the
    right-to-left precision envelope (running max toward low recall), and
    integrates each column's 101-point linear interpolation with the
    trapezoid rule. Returns ((T,) areas, sentinel recall, envelope) — the
    latter two so the caller can resample column 0 onto the conf grid.
    """
    T = recall_cols.shape[1]
    rec = np.vstack([np.zeros((1, T)), recall_cols, np.ones((1, T))])
    env = np.vstack([np.ones((1, T)), precision_cols, np.zeros((1, T))])
    env = np.maximum.accumulate(env[::-1], axis=0)[::-1]
    areas = np.empty(T)
    for t in range(T):
        areas[t] = np.trapezoid(np.interp(_AP_GRID, rec[:, t], env[:, t]),
                                _AP_GRID)
    return areas, rec, env


def compute_ap(recall, precision):
    """AP of one PR staircase via 101-point interpolation (reference
    metrics.py:517-534 protocol). Returns (ap, envelope, sentinel_recall)."""
    areas, rec, env = _staircase_auc(np.asarray(recall)[:, None],
                                     np.asarray(precision)[:, None])
    return areas[0], env[:, 0], rec[:, 0]


def ap_per_class(tp, conf, pred_cls, target_cls, eps: float = 1e-16):
    """Per-class AP over the 10 IoU thresholds (reference metrics.py:537-624
    protocol — a semantic contract: every quantity below must match the
    reference bit-for-bit, pinned by tests/test_metrics_parity.py).

    Args:
        tp: (Np, 10) bool TP at IoU 0.5:0.95.
        conf: (Np,) confidences.
        pred_cls: (Np,) predicted class ids.
        target_cls: (Ngt,) GT class ids.

    Returns:
        tp_count, fp_count, p, r, f1 (per class at max-F1 conf),
        ap (ncls, 10), unique_classes, p_curve, r_curve, f1_curve, x, prec_values.
    """
    # One global confidence-descending sort. np.argsort(-conf) (not a stable
    # variant) is part of the contract: its tie permutation feeds every
    # cumulative count below.
    order = np.argsort(-conf)
    tp, conf, pred_cls = tp[order], conf[order], pred_cls[order]

    classes, gt_counts = np.unique(target_cls, return_counts=True)
    n_thr = tp.shape[1]

    ap = np.zeros((len(classes), n_thr))
    p_curve = np.zeros((len(classes), _CONF_GRID.size))
    r_curve = np.zeros((len(classes), _CONF_GRID.size))
    pr50 = []   # interpolated IoU-0.5 precision envelope per evaluated class

    for ci, (c, n_gt) in enumerate(zip(classes, gt_counts)):
        sel = pred_cls == c
        if n_gt == 0 or not sel.any():
            continue
        # Running hit count; the miss count is rank - hits, so precision is
        # hits/rank — exact integer arithmetic in float64, identical to the
        # tp/(tp+fp) cumsum pair it replaces.
        hits = tp[sel].cumsum(0).astype(np.float64)
        ranks = np.arange(1, hits.shape[0] + 1, dtype=np.float64)[:, None]
        recall = hits / float(n_gt)
        precision = hits / ranks

        # Resample the IoU-0.5 staircases onto the shared confidence grid.
        # Knots ascend (conf reversed); above the top knot recall is 0 and
        # precision 1, below the bottom knot each holds its last value.
        knots = conf[sel][::-1]
        r_curve[ci] = np.interp(_CONF_GRID, knots, recall[::-1, 0], right=0.0)
        p_curve[ci] = np.interp(_CONF_GRID, knots, precision[::-1, 0], right=1.0)

        ap[ci], rec_sent, env = _staircase_auc(recall, precision)
        pr50.append(np.interp(_CONF_GRID, rec_sent[:, 0], env[:, 0]))

    prec_values = np.array(pr50) if pr50 else np.zeros((1, _CONF_GRID.size))
    f1_curve = 2 * p_curve * r_curve / (p_curve + r_curve + eps)
    best = smooth(f1_curve.mean(0), 0.1).argmax()       # max-F1 conf index
    p, r, f1 = p_curve[:, best], r_curve[:, best], f1_curve[:, best]
    tp_count = (r * gt_counts).round()
    fp_count = (tp_count / (p + eps) - tp_count).round()
    return (tp_count, fp_count, p, r, f1, ap, classes.astype(int),
            p_curve, r_curve, f1_curve, _CONF_GRID, prec_values)


class Metric:
    """Container for per-class AP results (reference metrics.py:626)."""

    def __init__(self):
        self.p = []
        self.r = []
        self.f1 = []
        self.all_ap = []        # (nc, 10)
        self.ap_class_index = []
        self.nc = 0

    @property
    def ap50(self):
        return self.all_ap[:, 0] if len(self.all_ap) else []

    @property
    def ap(self):
        return self.all_ap.mean(1) if len(self.all_ap) else []

    @property
    def mp(self):
        return self.p.mean() if len(self.p) else 0.0

    @property
    def mr(self):
        return self.r.mean() if len(self.r) else 0.0

    @property
    def map50(self):
        return self.all_ap[:, 0].mean() if len(self.all_ap) else 0.0

    @property
    def map75(self):
        return self.all_ap[:, 5].mean() if len(self.all_ap) else 0.0

    @property
    def map(self):
        return self.all_ap.mean() if len(self.all_ap) else 0.0

    def mean_results(self):
        return [self.mp, self.mr, self.map50, self.map]

    def class_result(self, i: int):
        return self.p[i], self.r[i], self.ap50[i], self.ap[i]

    @property
    def maps(self):
        """Per-class mAP50-95, defaulting missing classes to the global map."""
        maps = np.zeros(self.nc) + self.map
        for i, c in enumerate(self.ap_class_index):
            maps[c] = self.ap[i]
        return maps

    def fitness(self):
        """0.1*mAP50 + 0.9*mAP50-95 (reference metrics.py:690)."""
        w = [0.0, 0.0, 0.1, 0.9]
        return float((np.array(self.mean_results()) * w).sum())

    def update(self, results):
        (_, _, self.p, self.r, self.f1, self.all_ap, self.ap_class_index,
         *_rest) = results


class DetMetrics:
    """Detection metrics facade (reference metrics.py:798)."""

    def __init__(self, names: Optional[dict] = None):
        self.names = names or {}
        self.box = Metric()
        self.box.nc = len(self.names)
        self.speed = {"preprocess": 0.0, "inference": 0.0, "loss": 0.0, "postprocess": 0.0}
        self.task = "detect"
        self.nt_per_class = None

    def process(self, tp, conf, pred_cls, target_cls):
        results = ap_per_class(tp, conf, pred_cls, target_cls)
        self.box.nc = len(self.names)
        self.box.update(results)
        _, self.nt_per_class = np.unique(target_cls, return_counts=True)

    @property
    def keys(self):
        return ["metrics/precision(B)", "metrics/recall(B)",
                "metrics/mAP50(B)", "metrics/mAP50-95(B)"]

    def mean_results(self):
        return self.box.mean_results()

    def class_result(self, i: int):
        return self.box.class_result(i)

    @property
    def maps(self):
        return self.box.maps

    @property
    def fitness(self):
        return self.box.fitness()

    @property
    def ap_class_index(self):
        return self.box.ap_class_index

    @property
    def results_dict(self):
        return dict(zip(self.keys + ["fitness"], self.mean_results() + [self.fitness]))

    def __str__(self):
        d = self.results_dict
        return " ".join(f"{k}={v:.4f}" for k, v in d.items())


class ConfusionMatrix:
    """Task confusion matrix (reference metrics.py:294)."""

    def __init__(self, nc: int, conf: float = 0.25, iou_thres: float = 0.45):
        self.nc = nc
        self.conf = 0.25 if conf in (None, 0.001) else conf
        self.iou_thres = iou_thres
        self.matrix = np.zeros((nc + 1, nc + 1))

    def process_batch(self, detections, gt_bboxes, gt_cls):
        """Update with one image: detections (N, 6) [xyxy conf cls], GT (M, 4)/(M,)."""
        gt_ids = np.asarray(gt_cls).astype(int)
        if detections is not None and len(detections):
            detections = detections[detections[:, 4] > self.conf]
        det_ids = (detections[:, 5].astype(int)
                   if detections is not None and len(detections)
                   else np.zeros(0, int))

        if gt_ids.size == 0 or det_ids.size == 0:
            # one side empty: everything on the other side hits background
            np.add.at(self.matrix, (det_ids, np.full(det_ids.size, self.nc)), 1)
            np.add.at(self.matrix, (np.full(gt_ids.size, self.nc), gt_ids), 1)
            return

        iou = box_iou(gt_bboxes, detections[:, :4])
        gi, di = np.nonzero(iou > self.iou_thres)       # strict, per reference
        gi, di = _resolve_pairs(gi, di, iou[gi, di], resort_between=True)

        # Matched pairs land on (det class, gt class) — the diagonal when the
        # classes agree, a confusion cell otherwise. Leftover GTs are
        # background FNs (row nc); leftover dets are background FPs (col nc).
        np.add.at(self.matrix, (det_ids[di], gt_ids[gi]), 1)
        fn = gt_ids[np.setdiff1d(np.arange(gt_ids.size), gi)]
        np.add.at(self.matrix, (np.full(fn.size, self.nc), fn), 1)
        fp = det_ids[np.setdiff1d(np.arange(det_ids.size), di)]
        np.add.at(self.matrix, (fp, np.full(fp.size, self.nc)), 1)

    def print(self):
        for i in range(self.nc + 1):
            LOGGER.info(" ".join(map(str, self.matrix[i])))


def _resolve_pairs(gt_idx, det_idx, pair_iou, resort_between: bool = False):
    """One-to-one candidate-pair resolution, reference dedup-chain semantics.

    Given candidate (gt, det) pairs, keep for each det its best-IoU gt, then
    for each gt one surviving det. The protocol's tie-breaking quirks are
    load-bearing and deliberately reproduced (pinned by
    tests/test_metrics_parity.py::test_match_predictions_parity):

    * "best" uses ``argsort()[::-1]`` (reversed ascending) on the IoU
      vector, so exact-tie order is the reverse of the ascending sort;
    * after the det pass the pairs sit in det-id order, so without a
      re-sort the gt pass keeps the pair with the LOWEST det id (reference
      validator.py:222-263 behavior);
    * the confusion-matrix variant (reference metrics.py:294) re-sorts by
      IoU between the passes, so its gt pass keeps the best-IoU det —
      ``resort_between`` selects that variant.

    Returns the surviving (gt_idx, det_idx) arrays.
    """
    if gt_idx.size > 1:
        by_iou = pair_iou.argsort()[::-1]
        gt_idx, det_idx, pair_iou = (gt_idx[by_iou], det_idx[by_iou],
                                     pair_iou[by_iou])
        keep = np.unique(det_idx, return_index=True)[1]   # -> det-id order
        gt_idx, det_idx, pair_iou = gt_idx[keep], det_idx[keep], pair_iou[keep]
        if resort_between:
            by_iou = pair_iou.argsort()[::-1]
            gt_idx, det_idx = gt_idx[by_iou], det_idx[by_iou]
        keep = np.unique(gt_idx, return_index=True)[1]
        gt_idx, det_idx = gt_idx[keep], det_idx[keep]
    return gt_idx, det_idx


def match_predictions(pred_classes, true_classes, iou, iou_thresholds=None,
                      use_scipy: bool = False) -> np.ndarray:
    """TP matrix over 10 IoU thresholds (reference validator.py:222-263
    semantics, via _resolve_pairs WITHOUT the inter-pass re-sort).

    Args:
        pred_classes: (N,) predicted class ids.
        true_classes: (M,) GT class ids.
        iou: (M, N) pairwise IoU (GT x pred).

    Returns:
        (N, 10) bool TP at IoU = 0.5, 0.55, ..., 0.95.
    """
    thresholds = (np.linspace(0.5, 0.95, 10) if iou_thresholds is None
                  else iou_thresholds)
    tp = np.zeros((pred_classes.shape[0], len(thresholds)), dtype=bool)
    class_ok = true_classes[:, None] == pred_classes[None, :]
    iou = iou * class_ok
    for t, thr in enumerate(thresholds):
        gi, di = np.nonzero(iou >= thr)
        if gi.size:
            _, di = _resolve_pairs(gi, di, iou[gi, di])
            tp[di, t] = True
    return tp
