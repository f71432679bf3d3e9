"""Task criteria: segmentation / pose / OBB losses, reference-form.

TPU-native re-expression of reference utils/loss.py task variants —
v8SegmentationLoss :263-444, v8PoseLoss :446-599, v8OBBLoss :613-730,
KeypointLoss :140-154, RotatedBboxLoss :116-137. Term-for-term parity with
the torch reference is pinned by tests/test_loss_tasks_parity.py.

Differences forced by jit:
- the detection terms come from ONE shared assignment (`DetectionLoss.
  _forward_core`), like the reference, instead of re-running the assigner;
- the task-specific terms act on foreground anchors through a FIXED-SIZE
  top-weight gather (budget `max_fg`) instead of boolean indexing —
  static shapes, identical semantics whenever the true foreground count
  fits the budget (it does for all realistic batches; the budget is
  configurable);
- per-GT tensors arrive pre-padded to (B, M, ...) from the host collate
  (data/build.py) instead of the reference's flat batch_idx lists.

Loss-item layouts match the reference exactly:
  segment: (4,) [box, seg, cls, dfl]   (seg scaled by the BOX gain, like
                                        reference :349-352)
  pose:    (5,) [box, pose, kobj, cls, dfl]
  obb:     (3,) [box(probiou), cls, dfl]
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from yolo_sod_tpu.ops.boxes import (bbox2dist, dist2rbox, make_anchors, probiou,
                                    xywh2xyxy)
from yolo_sod_tpu.utils.loss import (DetectionLoss, _bce_with_logits, dfl_loss,
                                     split_feats)
from yolo_sod_tpu.utils.tal import RotatedTaskAlignedAssigner

# COCO-pose keypoint sigmas (reference utils/metrics.py:14-17 OKS_SIGMA).
OKS_SIGMA = np.array([0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72,
                      0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89],
                     np.float32) / 10.0


def _gather_foreground(fg_mask, target_scores, max_fg: int):
    """Pick up to max_fg foreground anchors per image by assignment weight.

    Returns (idx (B, max_fg) anchor indices, w (B, max_fg) 0/1 validity).
    """
    weight = target_scores.sum(-1) * fg_mask.astype(target_scores.dtype)
    k = min(max_fg, weight.shape[1])
    topw, idx = jax.lax.top_k(weight, k)
    return idx, (topw > 0).astype(target_scores.dtype)


def _take(x, idx):
    """take_along_axis over axis 1 with trailing dims broadcast from idx."""
    extra = x.ndim - idx.ndim
    return jnp.take_along_axis(x, idx.reshape(*idx.shape, *([1] * extra)), 1)


class SegmentationLoss(DetectionLoss):
    """Detection loss + per-anchor prototype-mask BCE (v8SegmentationLoss).

    batch extras: 'masks' (B, M, Hm, Wm) float 0/1 per GT instance at (or
    above) the prototype resolution — the per-instance layout is the
    reference's overlap_mask=False contract, padded to M rows.
    """

    def __init__(self, *args, max_fg: int = 256, overlap: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_fg = max_fg

    def __call__(self, preds, batch):
        feats, coeff_maps, protos = preds
        core, ctx = self._forward_core(feats, batch)

        B = feats[0].shape[0]
        nm = protos.shape[-1]
        Hm, Wm = protos.shape[1], protos.shape[2]
        img_h, img_w = ctx["imgsz"]
        coeffs = jnp.concatenate(
            [c.reshape(B, -1, nm) for c in coeff_maps], axis=1).astype(jnp.float32)

        idx, w = _gather_foreground(ctx["fg_mask"], ctx["target_scores"],
                                    self.max_fg)
        sel_coeff = _take(coeffs, idx)                               # (B, F, nm)
        sel_gt = _take(ctx["target_gt_idx"], idx)                    # (B, F)
        sel_box = _take(ctx["target_bboxes"], idx)                   # pixel xyxy

        masks = batch["masks"].astype(jnp.float32)                   # (B, M, h, w)
        if masks.shape[-2:] != (Hm, Wm):
            # Nearest downsample to proto resolution (reference :337-339).
            masks = jax.image.resize(masks, (*masks.shape[:2], Hm, Wm),
                                     method="nearest")
        gt_masks = _take(masks, sel_gt)                              # (B, F, Hm, Wm)

        pred_masks = jnp.einsum("bfn,bhwn->bfhw",
                                sel_coeff, protos.astype(jnp.float32))

        # Reference calculate_segmentation_loss (:383-444): boxes normalized
        # to [0, 1] → area in normalized units; crop rectangle in mask px.
        nx1 = sel_box[..., 0] / img_w
        ny1 = sel_box[..., 1] / img_h
        nx2 = sel_box[..., 2] / img_w
        ny2 = sel_box[..., 3] / img_h
        marea = (nx2 - nx1) * (ny2 - ny1)                            # (B, F)
        marea = jnp.where(w > 0, marea, 1.0)                         # pad-safe
        x1 = nx1 * Wm
        x2 = nx2 * Wm
        y1 = ny1 * Hm
        y2 = ny2 * Hm
        gx = jnp.arange(Wm, dtype=jnp.float32)[None, None, None, :]
        gy = jnp.arange(Hm, dtype=jnp.float32)[None, None, :, None]
        inside = ((gx >= x1[..., None, None]) & (gx < x2[..., None, None]) &
                  (gy >= y1[..., None, None]) & (gy < y2[..., None, None]))

        # single_mask_loss (:356-381): crop-BCE meaned over the FULL mask
        # plane, divided by the normalized box area, summed over anchors;
        # the total divides by the true foreground count.
        bce = _bce_with_logits(pred_masks, gt_masks) * inside
        per_anchor = bce.sum((-1, -2)) / (Hm * Wm) / marea           # (B, F)
        n_fg = jnp.maximum(ctx["fg_mask"].sum().astype(jnp.float32), 1.0)
        loss_seg = (per_anchor * w).sum() / n_fg

        bg, cg, dg = self.gains
        items = jnp.stack([core[0] * bg, loss_seg * bg, core[1] * cg,
                           core[2] * dg])
        total = items.sum() * B
        return total, jax.lax.stop_gradient(items)


class PoseLoss(DetectionLoss):
    """Detection loss + OKS keypoint location + visibility BCE (v8PoseLoss).

    preds = (det_maps, kpt_maps); batch extras: 'keypoints' (B, M, K, D)
    normalized xy (+ visibility when D=3).
    """

    def __init__(self, *args, kpt_shape=(17, 3), max_fg: int = 256,
                 pose_gain: float = 12.0, kobj_gain: float = 1.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.kpt_shape = tuple(kpt_shape)
        self.max_fg = max_fg
        self.pose_gain = pose_gain
        self.kobj_gain = kobj_gain
        K = self.kpt_shape[0]
        # Reference v8PoseLoss.__init__: OKS sigmas for the 17-kpt COCO
        # layout, uniform 1/K otherwise.
        self.sigmas = jnp.asarray(OKS_SIGMA if self.kpt_shape == (17, 3)
                                  else np.full(K, 1.0 / K, np.float32))

    def __call__(self, preds, batch):
        feats, kpt_maps = preds
        core, ctx = self._forward_core(feats, batch)

        B = feats[0].shape[0]
        K, D = self.kpt_shape
        img_h, img_w = ctx["imgsz"]
        kpts = jnp.concatenate(
            [k.reshape(B, -1, K * D) for k in kpt_maps], 1
        ).reshape(B, -1, K, D).astype(jnp.float32)

        idx, w = _gather_foreground(ctx["fg_mask"], ctx["target_scores"],
                                    self.max_fg)
        sel_kpt = _take(kpts, idx)                                   # (B, F, K, D)
        sel_gt = _take(ctx["target_gt_idx"], idx)                    # (B, F)
        anchor = ctx["anchor_points"]                                # (A, 2) grid
        stride = ctx["stride_tensor"]                                # (A, 1)
        sel_anchor = _take(jnp.broadcast_to(anchor[None], (B, *anchor.shape)), idx)
        sel_stride = _take(jnp.broadcast_to(stride[None], (B, *stride.shape)), idx)

        # kpts_decode (reference :536-542): grid units of each level.
        pred_xy = sel_kpt[..., :2] * 2.0 + (sel_anchor[..., None, :] - 0.5)

        # GT keypoints: normalized → pixels → grid units of the anchor's
        # level (reference :519-521 and :583-584).
        gt_kpts = batch["keypoints"].astype(jnp.float32)             # (B, M, K, D)
        gt_xy = gt_kpts[..., :2] * jnp.array([img_w, img_h], jnp.float32)
        sel_gt_xy = _take(gt_xy, sel_gt) / sel_stride[..., None, :]
        if D == 3:
            kpt_mask = (_take(gt_kpts[..., 2], sel_gt) != 0).astype(jnp.float32)
        else:
            kpt_mask = jnp.ones(sel_kpt.shape[:-1], jnp.float32)
        kpt_mask = kpt_mask * w[..., None]                           # pad-safe

        # Box area in grid units (target_bboxes already meant /stride in the
        # reference at this point, :585).
        sel_box = _take(ctx["target_bboxes"], idx) / sel_stride
        area = ((sel_box[..., 2] - sel_box[..., 0]) *
                (sel_box[..., 3] - sel_box[..., 1]))                 # (B, F)

        # KeypointLoss (reference :148-154): e from the cocoeval form.
        d = ((pred_xy - sel_gt_xy) ** 2).sum(-1)                     # (B, F, K)
        e = d / ((2 * self.sigmas) ** 2 * (area[..., None] + 1e-9) * 2)
        factor = K / (kpt_mask.sum(-1) + 1e-9)                       # (B, F)
        n_fg = jnp.maximum(ctx["fg_mask"].sum().astype(jnp.float32), 1.0)
        loss_pose = (factor[..., None] * (1 - jnp.exp(-e)) * kpt_mask).sum() \
            / (n_fg * K)

        loss_kobj = jnp.float32(0.0)
        if D == 3:
            # bce_pose (reference :596): mean over the (n_fg, K) selection.
            kobj = _bce_with_logits(sel_kpt[..., 2], kpt_mask) * w[..., None]
            loss_kobj = kobj.sum() / (n_fg * K)

        bg, cg, dg = self.gains
        items = jnp.stack([core[0] * bg, loss_pose * self.pose_gain,
                           loss_kobj * self.kobj_gain, core[1] * cg,
                           core[2] * dg])
        total = items.sum() * B
        return total, jax.lax.stop_gradient(items)


class OBBLoss(DetectionLoss):
    """Oriented-box criterion (reference v8OBBLoss :613-730): rotated TAL
    assignment (ProbIoU metric + rotated point-in-rect candidates), ProbIoU
    box term, DFL on the axis-aligned xyxy of the rotated xywh.

    preds = (det_maps, angle_maps) with angle maps ALREADY decoded to
    radians by the OBB head ((sigmoid - 0.25) * pi, reference head.py OBB);
    batch: 'bboxes' (B, M, 4) normalized rotated-rect xywh, 'angles'
    (B, M) radians, 'cls', 'mask_gt'.
    """

    def __init__(self, *args, max_fg: int = 256, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_fg = max_fg
        self.assigner = RotatedTaskAlignedAssigner(
            topk=10, num_classes=self.nc, alpha=0.5, beta=6.0)

    def __call__(self, preds, batch):
        feats, angle_maps = preds
        B = feats[0].shape[0]
        dtype = jnp.float32
        pred_angle = jnp.concatenate(
            [a.reshape(B, -1, 1) for a in angle_maps], 1).astype(dtype)
        pred_distri, pred_scores = split_feats(feats, self.reg_max, self.no)

        hw = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = make_anchors(hw, self.strides)
        img_h = feats[0].shape[1] * self.strides[0]
        img_w = feats[0].shape[2] * self.strides[0]

        # Targets: normalized rotated xywh → pixels; angle appended; tiny
        # rboxes dropped (reference :676-678 — note the reference scales w
        # by imgsz[0] (height) and h by imgsz[1] (width); equal for the
        # square shapes every trainer uses, we keep the same form).
        xywh = batch["bboxes"].astype(dtype)
        rw = xywh[..., 2] * img_h
        rh = xywh[..., 3] * img_w
        keep = (rw >= 2.0) & (rh >= 2.0)
        mask_gt = (batch["mask_gt"].astype(dtype) *
                   keep.astype(dtype))[..., None]                    # (B, M, 1)
        scale = jnp.array([img_w, img_h, img_w, img_h], dtype)
        gt_bboxes = jnp.concatenate(
            [xywh * scale, batch["angles"].astype(dtype)[..., None]], -1)
        gt_bboxes = gt_bboxes * mask_gt                              # (B, M, 5)
        gt_labels = batch["cls"].astype(dtype)[..., None]

        # bbox_decode (reference :713-730): DFL expectation → dist2rbox.
        pd = pred_distri.reshape(B, -1, 4, self.reg_max)
        proj = jnp.arange(self.reg_max, dtype=dtype)
        pred_ltrb = jnp.einsum("bafc,c->baf", jax.nn.softmax(pd, -1), proj)
        pred_rxywh = dist2rbox(pred_ltrb, pred_angle, anchor_points[None])
        pred_rbox = jnp.concatenate([pred_rxywh, pred_angle], -1)    # grid units

        sg = jax.lax.stop_gradient
        assign_boxes = jnp.concatenate(
            [sg(pred_rxywh) * stride_tensor[None], sg(pred_angle)], -1)
        _, target_bboxes, target_scores, fg_mask, _ = self.assigner(
            sg(jax.nn.sigmoid(pred_scores)), assign_boxes,
            anchor_points * stride_tensor, gt_labels, gt_bboxes, mask_gt)

        target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)
        loss_cls = _bce_with_logits(pred_scores, target_scores).sum() \
            / target_scores_sum

        # RotatedBboxLoss (reference :116-137).
        fg = fg_mask.astype(dtype)[..., None]
        tb_xywh = target_bboxes[..., :4] / stride_tensor[None]       # grid units
        t_rbox = jnp.concatenate([tb_xywh, target_bboxes[..., 4:]], -1)
        weight = target_scores.sum(-1, keepdims=True)
        piou = probiou(pred_rbox, t_rbox)[..., None]
        loss_box = (((1.0 - piou) * weight) * fg).sum() / target_scores_sum

        target_ltrb = bbox2dist(anchor_points[None], xywh2xyxy(tb_xywh),
                                self.reg_max)
        ldfl = dfl_loss(pd, target_ltrb, self.reg_max)
        loss_dfl = ((ldfl * weight) * fg).sum() / target_scores_sum

        bg, cg, dg = self.gains
        items = jnp.stack([loss_box * bg, loss_cls * cg, loss_dfl * dg])
        total = items.sum() * B
        return total, jax.lax.stop_gradient(items)
