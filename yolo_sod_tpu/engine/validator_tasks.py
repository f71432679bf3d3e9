"""Segmentation / pose validators: mask mAP and OKS keypoint mAP.

Analogs of reference models/yolo/segment/val.py and pose/val.py: the forward,
decode, NMS, and per-detection mask assembly run in ONE jitted graph (the NMS
returns kept-anchor indices so coefficients/keypoints gather on device); the
host matches masks by mask-IoU and keypoints by OKS over the 10 thresholds
and feeds the same ap_per_class machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from yolo_sod_tpu.data import build_dataloader, build_yolo_dataset, check_det_dataset
from yolo_sod_tpu.data.augment import xywhn2xyxy
from yolo_sod_tpu.engine.validator import (DetectionValidator,
                                           pipelined_batches)
from yolo_sod_tpu.ops.decode import decode_detections, decode_obb
from yolo_sod_tpu.ops.nms import non_max_suppression, non_max_suppression_rotated
from yolo_sod_tpu.ops.numerics import image_to_compute
from yolo_sod_tpu.utils import LOGGER, colorstr
from yolo_sod_tpu.utils.metrics import (DetMetrics, Metric, ap_per_class, box_iou,
                                        match_predictions)


def mask_iou(pred: np.ndarray, gt: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """(Ngt, H, W) x (Np, H, W) binary masks -> (Ngt, Np) IoU."""
    g = gt.reshape(gt.shape[0], -1).astype(np.float32)
    p = pred.reshape(pred.shape[0], -1).astype(np.float32)
    inter = g @ p.T
    union = g.sum(1)[:, None] + p.sum(1)[None] - inter
    return inter / (union + eps)




class SegmentMetrics(DetMetrics):
    """Box + mask metrics (reference metrics.py SegmentMetrics)."""

    def __init__(self, names=None):
        super().__init__(names=names)
        self.seg = Metric()
        self.seg.nc = len(self.names)

    def process(self, tp, tp_m, conf, pred_cls, target_cls):
        super().process(tp, conf, pred_cls, target_cls)
        self.seg.nc = len(self.names)
        self.seg.update(ap_per_class(tp_m, conf, pred_cls, target_cls))

    @property
    def keys(self):
        return super().keys + ["metrics/mAP50(M)", "metrics/mAP50-95(M)"]

    def mean_results(self):
        return super().mean_results() + [self.seg.map50, self.seg.map]


class SegmentationValidator(DetectionValidator):
    """Evaluate a Segment-head model: box mAP + mask mAP."""

    def _build_fn(self, model, conf: float, iou: float, max_det: int):
        if self._jit_fn is None:
            half = self.args.half

            @jax.jit
            def fn(variables, x):
                x = image_to_compute(x, jnp.bfloat16 if half else jnp.float32)
                det_maps, coeff_maps, protos = model.net.apply(variables, x,
                                                               train=False)
                preds = decode_detections(det_maps, model.graph.detect_strides,
                                          model.nc)
                det, n, kept = non_max_suppression(
                    preds, conf_thres=conf, iou_thres=iou, multi_label=True,
                    max_det=max_det, return_idx=True)
                B = x.shape[0]
                nm = protos.shape[-1]
                coeffs = jnp.concatenate(
                    [c.reshape(B, -1, nm) for c in coeff_maps], 1)
                safe = jnp.clip(kept, 0, coeffs.shape[1] - 1)
                sel = jnp.take_along_axis(coeffs, safe[..., None], 1)
                masks = jax.nn.sigmoid(jnp.einsum(
                    "bdn,bhwn->bdhw", sel.astype(jnp.float32),
                    protos.astype(jnp.float32))) > 0.5
                return det, n, masks
            self._jit_fn = fn
        return self._jit_fn

    def __call__(self, model=None, variables=None, data=None):
        args = self.args
        variables = variables if variables is not None else model.variables
        # Push weights to the device ONCE; host arrays passed into the
        # jitted fn re-transfer every batch (engine/validator.py note).
        variables = jax.device_put(variables)
        if data is None:
            data = check_det_dataset(args.data)
        names = data.get("names", {})
        if self.dataloader is None:
            cfg = dict(vars(args))
            dataset = build_yolo_dataset(cfg, data["val"], args.batch, data,
                                         mode="val", stride=int(max(model.stride)),
                                         task="segment")
            self.dataloader = build_dataloader(dataset, args.batch,
                                               workers=getattr(args, "workers", None),
                                               shuffle=False)

        conf = args.conf if args.conf not in (None, 0) else 0.001
        fn = self._build_fn(model, conf, args.iou, args.max_det)


        metrics = SegmentMetrics(names=names)
        stats = {"tp": [], "tp_m": [], "conf": [], "pred_cls": [], "target_cls": []}
        n_images = 0
        for (det, n_valid, masks), batch, nb, h_im, w_im in pipelined_batches(
                self.dataloader, lambda x: fn(variables, x)):
            for bi in range(nb):
                n_images += 1
                d = det[bi][: n_valid[bi]]
                pm = masks[bi][: n_valid[bi]]
                m = batch["mask_gt"][bi] > 0
                gt_cls = batch["cls"][bi][m]
                gt_xywhn = np.concatenate([gt_cls[:, None],
                                           batch["bboxes"][bi][m]], axis=1)
                gt_xyxy = xywhn2xyxy(gt_xywhn, w_im, h_im)[:, 1:]
                gt_masks = batch["masks"][bi][m]
                # Downsample pred masks to the gt mask resolution if needed.
                if pm.shape[1:] != gt_masks.shape[1:]:
                    sy = max(pm.shape[1] // gt_masks.shape[1], 1)
                    sx = max(pm.shape[2] // gt_masks.shape[2], 1)
                    pm = pm[:, ::sy, ::sx]
                stats["target_cls"].append(gt_cls)
                if len(d) == 0:
                    continue
                iou_b = box_iou(gt_xyxy, d[:, :4])
                iou_m = mask_iou(pm, gt_masks)
                stats["tp"].append(match_predictions(d[:, 5], gt_cls, iou_b))
                stats["tp_m"].append(match_predictions(d[:, 5], gt_cls, iou_m))
                stats["conf"].append(d[:, 4])
                stats["pred_cls"].append(d[:, 5])

        if stats["tp"]:
            metrics.process(np.concatenate(stats["tp"]),
                            np.concatenate(stats["tp_m"]),
                            np.concatenate(stats["conf"]),
                            np.concatenate(stats["pred_cls"]),
                            np.concatenate(stats["target_cls"]))
        r = metrics.mean_results()
        LOGGER.info(f"{colorstr('val(seg):')} {n_images} images  "
                    f"box mAP50={r[2]:.4f} mAP={r[3]:.4f}  "
                    f"mask mAP50={r[4]:.4f} mAP={r[5]:.4f}")
        return metrics


def oks(gt_kpts: np.ndarray, pred_kpts: np.ndarray, areas: np.ndarray,
        sigma: float = 0.05, eps: float = 1e-7) -> np.ndarray:
    """Object keypoint similarity: (Ngt, K, 3) x (Np, K, 2+) -> (Ngt, Np)."""
    d2 = ((gt_kpts[:, None, :, :2] - pred_kpts[None, :, :, :2]) ** 2).sum(-1)
    vis = gt_kpts[:, None, :, 2] > 0
    e = d2 / (2 * (areas[:, None, None] + eps) * sigma ** 2)
    return (np.exp(-e) * vis).sum(-1) / (vis.sum(-1) + eps)


class PoseMetrics(DetMetrics):
    """Box + keypoint metrics (reference metrics.py PoseMetrics)."""

    def __init__(self, names=None):
        super().__init__(names=names)
        self.pose = Metric()
        self.pose.nc = len(self.names)

    def process(self, tp, tp_p, conf, pred_cls, target_cls):
        super().process(tp, conf, pred_cls, target_cls)
        self.pose.nc = len(self.names)
        self.pose.update(ap_per_class(tp_p, conf, pred_cls, target_cls))

    @property
    def keys(self):
        return super().keys + ["metrics/mAP50(P)", "metrics/mAP50-95(P)"]

    def mean_results(self):
        return super().mean_results() + [self.pose.map50, self.pose.map]


class PoseValidator(DetectionValidator):
    """Evaluate a Pose-head model: box mAP + OKS keypoint mAP.

    The forward, decode, NMS, and per-detection keypoint decode+gather run in
    one jitted graph; the host matches keypoints by OKS over thresholds
    0.5:0.95 through the same match_predictions machinery
    (reference pose/val.py)."""

    def _build_fn(self, model, conf: float, iou: float, max_det: int):
        if self._jit_fn is None:
            half = self.args.half
            K, D = model.kpt_shape

            @jax.jit
            def fn(variables, x):
                from yolo_sod_tpu.ops.boxes import make_anchors

                x = image_to_compute(x, jnp.bfloat16 if half else jnp.float32)
                det_maps, kpt_maps = model.net.apply(variables, x, train=False)
                preds = decode_detections(det_maps, model.graph.detect_strides,
                                          model.nc)
                det, n, kept = non_max_suppression(
                    preds, conf_thres=conf, iou_thres=iou, multi_label=True,
                    max_det=max_det, return_idx=True)
                B = x.shape[0]
                kpts = jnp.concatenate(
                    [k.reshape(B, -1, K * D) for k in kpt_maps], 1)
                kpts = kpts.reshape(B, -1, K, D).astype(jnp.float32)
                hw = [(f.shape[1], f.shape[2]) for f in det_maps]
                anchors, stride_t = make_anchors(hw, model.graph.detect_strides)
                xy = (kpts[..., :2] * 2.0 +
                      (anchors[None, :, None, :] - 0.5)) * stride_t[None, :, None, :]
                vis = jax.nn.sigmoid(kpts[..., 2:3]) if D == 3 \
                    else jnp.ones_like(kpts[..., :1])
                dec = jnp.concatenate([xy, vis], -1)              # (B, A, K, 3)
                safe = jnp.clip(kept, 0, dec.shape[1] - 1)
                sel = jnp.take_along_axis(dec, safe[..., None, None], 1)
                return det, n, sel
            self._jit_fn = fn
        return self._jit_fn

    def __call__(self, model=None, variables=None, data=None):
        args = self.args
        variables = variables if variables is not None else model.variables
        # Push weights to the device ONCE; host arrays passed into the
        # jitted fn re-transfer every batch (engine/validator.py note).
        variables = jax.device_put(variables)
        if data is None:
            data = check_det_dataset(args.data)
        names = data.get("names", {})
        if self.dataloader is None:
            cfg = dict(vars(args))
            dataset = build_yolo_dataset(cfg, data["val"], args.batch, data,
                                         mode="val", stride=int(max(model.stride)),
                                         task="pose")
            self.dataloader = build_dataloader(dataset, args.batch,
                                               workers=getattr(args, "workers", None),
                                               shuffle=False)

        conf = args.conf if args.conf not in (None, 0) else 0.001
        fn = self._build_fn(model, conf, args.iou, args.max_det)


        metrics = PoseMetrics(names=names)
        stats = {"tp": [], "tp_p": [], "conf": [], "pred_cls": [], "target_cls": []}
        n_images = 0
        for (det, n_valid, kpts), batch, nb, h_im, w_im in pipelined_batches(
                self.dataloader, lambda x: fn(variables, x)):
            for bi in range(nb):
                n_images += 1
                d = det[bi][: n_valid[bi]]
                pk = kpts[bi][: n_valid[bi]]
                m = batch["mask_gt"][bi] > 0
                gt_cls = batch["cls"][bi][m]
                gt_xywhn = np.concatenate([gt_cls[:, None],
                                           batch["bboxes"][bi][m]], axis=1)
                gt_xyxy = xywhn2xyxy(gt_xywhn, w_im, h_im)[:, 1:]
                gt_kpts = batch["keypoints"][bi][m].copy()
                gt_kpts[..., 0] *= w_im
                gt_kpts[..., 1] *= h_im
                # OKS area = 0.53 * box area (reference pose/val.py contract).
                areas = ((gt_xyxy[:, 2] - gt_xyxy[:, 0]) *
                         (gt_xyxy[:, 3] - gt_xyxy[:, 1]) * 0.53)
                stats["target_cls"].append(gt_cls)
                if len(d) == 0:
                    continue
                iou_b = box_iou(gt_xyxy, d[:, :4])
                sim = oks(gt_kpts, pk, areas)
                stats["tp"].append(match_predictions(d[:, 5], gt_cls, iou_b))
                stats["tp_p"].append(match_predictions(d[:, 5], gt_cls, sim))
                stats["conf"].append(d[:, 4])
                stats["pred_cls"].append(d[:, 5])

        if stats["tp"]:
            metrics.process(np.concatenate(stats["tp"]),
                            np.concatenate(stats["tp_p"]),
                            np.concatenate(stats["conf"]),
                            np.concatenate(stats["pred_cls"]),
                            np.concatenate(stats["target_cls"]))
        r = metrics.mean_results()
        LOGGER.info(f"{colorstr('val(pose):')} {n_images} images  "
                    f"box mAP50={r[2]:.4f} mAP={r[3]:.4f}  "
                    f"kpt mAP50={r[4]:.4f} mAP={r[5]:.4f}")
        return metrics


class OBBValidator(DetectionValidator):
    """Evaluate an OBB-head model: rotated-box mAP via ProbIoU matching
    (reference models/yolo/obb/val.py — probiou replaces box_iou in the
    10-threshold TP matcher)."""

    def _build_fn(self, model, conf: float, iou: float, max_det: int):
        if self._jit_fn is None:
            half = self.args.half

            @jax.jit
            def fn(variables, x):
                x = image_to_compute(x, jnp.bfloat16 if half else jnp.float32)
                det_maps, angle_maps = model.net.apply(variables, x, train=False)
                preds = decode_obb(det_maps, angle_maps,
                                   model.graph.detect_strides, model.nc)
                # Rotated decode (dist2rbox) + ProbIoU NMS — reference
                # obb/val.py postprocess(..., rotated=True).
                return non_max_suppression_rotated(
                    preds, conf_thres=conf, iou_thres=iou, multi_label=True,
                    max_det=max_det)
            self._jit_fn = fn
        return self._jit_fn

    def __call__(self, model=None, variables=None, data=None):
        from yolo_sod_tpu.ops.boxes import probiou

        args = self.args
        variables = variables if variables is not None else model.variables
        # Push weights to the device ONCE; host arrays passed into the
        # jitted fn re-transfer every batch (engine/validator.py note).
        variables = jax.device_put(variables)
        if data is None:
            data = check_det_dataset(args.data)
        names = data.get("names", {})
        if self.dataloader is None:
            cfg = dict(vars(args))
            dataset = build_yolo_dataset(cfg, data["val"], args.batch, data,
                                         mode="val", stride=int(max(model.stride)),
                                         task="obb")
            self.dataloader = build_dataloader(dataset, args.batch,
                                               workers=getattr(args, "workers", None),
                                               shuffle=False)

        conf = args.conf if args.conf not in (None, 0) else 0.001
        fn = self._build_fn(model, conf, args.iou, args.max_det)


        metrics = DetMetrics(names=names)
        stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        n_images = 0
        for (det, n_valid), batch, nb, h_im, w_im in pipelined_batches(
                self.dataloader, lambda x: fn(variables, x)):
            for bi in range(nb):
                n_images += 1
                nv = n_valid[bi]
                d = det[bi][:nv]      # [cx, cy, w, h, angle, conf, cls]
                m = batch["mask_gt"][bi] > 0
                gt_cls = batch["cls"][bi][m]
                # bboxes carry the ROTATED rect for the obb task.
                gt_rb = np.concatenate(
                    [batch["bboxes"][bi][m] *
                     np.array([w_im, h_im, w_im, h_im], np.float32),
                     batch["angles"][bi][m][:, None]], 1)
                stats["target_cls"].append(gt_cls)
                if len(d) == 0:
                    continue
                sim = np.asarray(probiou(jnp.asarray(gt_rb)[:, None],
                                         jnp.asarray(d[:, :5])[None]))
                stats["tp"].append(match_predictions(d[:, 6], gt_cls, sim))
                stats["conf"].append(d[:, 5])
                stats["pred_cls"].append(d[:, 6])

        if stats["tp"]:
            metrics.process(np.concatenate(stats["tp"]),
                            np.concatenate(stats["conf"]),
                            np.concatenate(stats["pred_cls"]),
                            np.concatenate(stats["target_cls"]))
        r = metrics.mean_results()
        LOGGER.info(f"{colorstr('val(obb):')} {n_images} images  "
                    f"rbox mAP50={r[2]:.4f} mAP={r[3]:.4f}")
        return metrics
