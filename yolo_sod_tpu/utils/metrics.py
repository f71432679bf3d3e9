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
    """Box-filter smoothing with edge padding (reference metrics.py:432)."""
    nf = round(len(y) * f * 2) // 2 + 1
    p = np.ones(nf // 2)
    yp = np.concatenate([p * y[0], y, p * y[-1]])
    return np.convolve(yp, np.ones(nf) / nf, mode="valid")


def compute_ap(recall, precision):
    """AP of one PR curve via 101-point interpolation (reference :517-534)."""
    mrec = np.concatenate(([0.0], recall, [1.0]))
    mpre = np.concatenate(([1.0], precision, [0.0]))
    mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
    x = np.linspace(0, 1, 101)
    ap = np.trapezoid(np.interp(x, mrec, mpre), x)
    return ap, mpre, mrec


def ap_per_class(tp, conf, pred_cls, target_cls, eps: float = 1e-16):
    """Per-class AP over the 10 IoU thresholds (reference :537-624).

    Args:
        tp: (Np, 10) bool TP at IoU 0.5:0.95.
        conf: (Np,) confidences.
        pred_cls: (Np,) predicted class ids.
        target_cls: (Ngt,) GT class ids.

    Returns:
        tp_count, fp_count, p, r, f1 (per class at max-F1 conf),
        ap (ncls, 10), unique_classes, p_curve, r_curve, f1_curve, x, prec_values.
    """
    i = np.argsort(-conf)
    tp, conf, pred_cls = tp[i], conf[i], pred_cls[i]

    unique_classes, nt = np.unique(target_cls, return_counts=True)
    nc = unique_classes.shape[0]

    x = np.linspace(0, 1, 1000)
    ap = np.zeros((nc, tp.shape[1]))
    p_curve = np.zeros((nc, 1000))
    r_curve = np.zeros((nc, 1000))
    prec_values = []

    for ci, c in enumerate(unique_classes):
        i = pred_cls == c
        n_l = nt[ci]
        n_p = i.sum()
        if n_p == 0 or n_l == 0:
            continue
        fpc = (1 - tp[i]).cumsum(0)
        tpc = tp[i].cumsum(0)
        recall = tpc / (n_l + eps)
        r_curve[ci] = np.interp(-x, -conf[i], recall[:, 0], left=0)
        precision = tpc / (tpc + fpc)
        p_curve[ci] = np.interp(-x, -conf[i], precision[:, 0], left=1)
        for j in range(tp.shape[1]):
            ap[ci, j], mpre, mrec = compute_ap(recall[:, j], precision[:, j])
            if j == 0:
                prec_values.append(np.interp(x, mrec, mpre))

    prec_values = np.array(prec_values) if prec_values else np.zeros((1, 1000))
    f1_curve = 2 * p_curve * r_curve / (p_curve + r_curve + eps)
    i = smooth(f1_curve.mean(0), 0.1).argmax()          # max-F1 confidence index
    p, r, f1 = p_curve[:, i], r_curve[:, i], f1_curve[:, i]
    tp_count = (r * nt).round()
    fp_count = (tp_count / (p + eps) - tp_count).round()
    return (tp_count, fp_count, p, r, f1, ap, unique_classes.astype(int),
            p_curve, r_curve, f1_curve, x, prec_values)


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
        if gt_cls.size == 0:
            if detections is not None and len(detections):
                detections = detections[detections[:, 4] > self.conf]
                for dc in detections[:, 5].astype(int):
                    self.matrix[dc, self.nc] += 1   # false positive
            return
        if detections is None or len(detections) == 0:
            for gc in gt_cls.astype(int):
                self.matrix[self.nc, gc] += 1       # background FN
            return

        detections = detections[detections[:, 4] > self.conf]
        gt_classes = gt_cls.astype(int)
        detection_classes = detections[:, 5].astype(int)
        iou = box_iou(gt_bboxes, detections[:, :4])

        x = np.where(iou > self.iou_thres)
        if x[0].shape[0]:
            matches = np.concatenate((np.stack(x, 1), iou[x[0], x[1]][:, None]), 1)
            if x[0].shape[0] > 1:
                matches = matches[matches[:, 2].argsort()[::-1]]
                matches = matches[np.unique(matches[:, 1], return_index=True)[1]]
                matches = matches[matches[:, 2].argsort()[::-1]]
                matches = matches[np.unique(matches[:, 0], return_index=True)[1]]
        else:
            matches = np.zeros((0, 3))

        n = matches.shape[0] > 0
        m0, m1, _ = matches.transpose().astype(int)
        for i, gc in enumerate(gt_classes):
            j = m0 == i
            if n and j.sum() == 1:
                self.matrix[detection_classes[m1[j]][0], gc] += 1  # correct or cls-confused
            else:
                self.matrix[self.nc, gc] += 1                       # background FN
        for i, dc in enumerate(detection_classes):
            if not (n and (m1 == i).any()):
                self.matrix[dc, self.nc] += 1                       # background FP

    def print(self):
        for i in range(self.nc + 1):
            LOGGER.info(" ".join(map(str, self.matrix[i])))


def match_predictions(pred_classes, true_classes, iou, iou_thresholds=None,
                      use_scipy: bool = False) -> np.ndarray:
    """TP matrix over 10 IoU thresholds (reference validator.py:222-263).

    Args:
        pred_classes: (N,) predicted class ids.
        true_classes: (M,) GT class ids.
        iou: (M, N) pairwise IoU (GT x pred).

    Returns:
        (N, 10) bool TP at IoU = 0.5, 0.55, ..., 0.95.
    """
    if iou_thresholds is None:
        iou_thresholds = np.linspace(0.5, 0.95, 10)
    correct = np.zeros((pred_classes.shape[0], len(iou_thresholds)), dtype=bool)
    correct_class = true_classes[:, None] == pred_classes[None, :]
    iou = iou * correct_class
    for i, threshold in enumerate(iou_thresholds):
        matches = np.nonzero(iou >= threshold)
        matches = np.array(matches).T
        if matches.shape[0]:
            if matches.shape[0] > 1:
                order = iou[matches[:, 0], matches[:, 1]].argsort()[::-1]
                matches = matches[order]
                matches = matches[np.unique(matches[:, 1], return_index=True)[1]]
                matches = matches[np.unique(matches[:, 0], return_index=True)[1]]
            correct[matches[:, 1].astype(int), i] = True
    return correct
