"""Task criteria: segmentation / pose / OBB losses.

TPU-native re-expression of reference utils/loss.py task variants
(v8SegmentationLoss :264, v8PoseLoss, v8OBBLoss). The detection terms reuse
DetectionLoss; the task-specific terms act on foreground anchors through a
FIXED-SIZE gather (budget `max_fg`) instead of boolean indexing — jit-safe
static shapes, matching semantics for all realistic fg counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yolo_sod_tpu.ops.boxes import make_anchors, xywh2xyxy
from yolo_sod_tpu.utils.loss import split_feats, DetectionLoss, _bce_with_logits


def _gather_foreground(fg_mask, target_scores, max_fg: int):
    """Pick up to max_fg foreground anchors per image by assignment weight.

    Returns (idx (B, max_fg) anchor indices, w (B, max_fg) 0/1 validity).
    """
    weight = target_scores.sum(-1) * fg_mask.astype(target_scores.dtype)
    k = min(max_fg, weight.shape[1])
    topw, idx = jax.lax.top_k(weight, k)
    return idx, (topw > 0).astype(target_scores.dtype)


class SegmentationLoss(DetectionLoss):
    """Detection loss + per-anchor prototype-mask BCE (v8SegmentationLoss).

    batch extras: 'masks' (B, M, Hm, Wm) float 0/1 per GT instance, at the
    prototype resolution (Hm = img_h / 4 with the P3 proto's 2x upsample).
    """

    def __init__(self, *args, max_fg: int = 256, overlap: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_fg = max_fg

    def __call__(self, preds, batch):
        feats, coeff_maps, protos = preds
        total_det, items = super().__call__(feats, batch)

        B = feats[0].shape[0]
        nm = protos.shape[-1]
        coeffs = jnp.concatenate(
            [c.reshape(B, -1, nm) for c in coeff_maps], axis=1).astype(jnp.float32)

        # Re-run assignment pieces to get fg anchors + their GT ids (the
        # reference shares these from the det loss; recomputation is cheap
        # relative to the forward and keeps the API criterion(preds, batch)).
        hw = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = make_anchors(hw, self.strides)
        img_h = feats[0].shape[1] * self.strides[0]
        img_w = feats[0].shape[2] * self.strides[0]
        scale = jnp.array([img_w, img_h, img_w, img_h], jnp.float32)
        gt_bboxes = xywh2xyxy(batch["bboxes"].astype(jnp.float32) * scale)
        gt_labels = batch["cls"].astype(jnp.float32)[..., None]
        mask_gt = batch["mask_gt"].astype(jnp.float32)[..., None]
        gt_bboxes = gt_bboxes * mask_gt

        pred_distri, raw_scores = split_feats(feats, self.reg_max, self.no)
        pred_scores = jax.nn.sigmoid(raw_scores)
        pd = pred_distri.reshape(B, -1, 4, self.reg_max)
        proj = jnp.arange(self.reg_max, dtype=jnp.float32)
        from yolo_sod_tpu.ops.boxes import dist2bbox

        pred_ltrb = jnp.einsum("bafc,c->baf", jax.nn.softmax(pd, -1), proj)
        pred_bboxes = dist2bbox(pred_ltrb, anchor_points[None], xywh=False)
        _, target_bboxes, target_scores, fg_mask, target_gt_idx = self.assigner(
            jax.lax.stop_gradient(pred_scores),
            jax.lax.stop_gradient(pred_bboxes) * stride_tensor[None],
            anchor_points * stride_tensor, gt_labels, gt_bboxes, mask_gt)

        idx, w = _gather_foreground(fg_mask, target_scores, self.max_fg)
        sel_coeff = jnp.take_along_axis(coeffs, idx[..., None], 1)   # (B, F, nm)
        sel_gt = jnp.take_along_axis(target_gt_idx, idx, 1)          # (B, F)
        sel_box = jnp.take_along_axis(target_bboxes, idx[..., None], 1)  # pixels

        Hm, Wm = protos.shape[1], protos.shape[2]
        pred_masks = jnp.einsum("bfn,bhwn->bfhw",
                                sel_coeff, protos.astype(jnp.float32))
        gt_masks = jnp.take_along_axis(
            batch["masks"].astype(jnp.float32), sel_gt[..., None, None], 1)

        # Crop-to-box weighting (reference crop_mask) in proto pixels.
        sx = Wm / img_w
        sy = Hm / img_h
        x1 = sel_box[..., 0] * sx
        y1 = sel_box[..., 1] * sy
        x2 = sel_box[..., 2] * sx
        y2 = sel_box[..., 3] * sy
        gx = jnp.arange(Wm, dtype=jnp.float32)[None, None, None, :]
        gy = jnp.arange(Hm, dtype=jnp.float32)[None, None, :, None]
        inside = ((gx >= x1[..., None, None]) & (gx < x2[..., None, None]) &
                  (gy >= y1[..., None, None]) & (gy < y2[..., None, None]))
        area = jnp.clip((x2 - x1) * (y2 - y1), 1.0, None)

        bce = _bce_with_logits(pred_masks, gt_masks) * inside
        per_anchor = bce.sum((-1, -2)) / area                        # (B, F)
        loss_mask = (per_anchor * w).sum() / jnp.clip(w.sum(), 1.0, None)

        total = total_det + loss_mask * B
        return total, jnp.concatenate([items, jnp.array([loss_mask])])


class PoseLoss(DetectionLoss):
    """Detection loss + keypoint location/visibility loss (v8PoseLoss shape).

    preds = (det_maps, kpt_maps); batch extras: 'keypoints' (B, M, K, 3)
    normalized xy + visibility.
    """

    def __init__(self, *args, kpt_shape=(17, 3), max_fg: int = 256,
                 pose_gain: float = 12.0, kobj_gain: float = 1.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.kpt_shape = tuple(kpt_shape)
        self.max_fg = max_fg
        self.pose_gain = pose_gain
        self.kobj_gain = kobj_gain

    def __call__(self, preds, batch):
        feats, kpt_maps = preds
        total_det, items = super().__call__(feats, batch)
        B = feats[0].shape[0]
        K, D = self.kpt_shape
        kpts = jnp.concatenate([k.reshape(B, -1, K * D) for k in kpt_maps], 1)
        kpts = kpts.reshape(B, -1, K, D).astype(jnp.float32)

        hw = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = make_anchors(hw, self.strides)
        img_h = feats[0].shape[1] * self.strides[0]
        img_w = feats[0].shape[2] * self.strides[0]
        scale = jnp.array([img_w, img_h, img_w, img_h], jnp.float32)
        gt_bboxes = xywh2xyxy(batch["bboxes"].astype(jnp.float32) * scale)
        gt_labels = batch["cls"].astype(jnp.float32)[..., None]
        mask_gt = batch["mask_gt"].astype(jnp.float32)[..., None]
        pred_distri, raw_scores = split_feats(feats, self.reg_max, self.no)
        pred_scores = jax.nn.sigmoid(raw_scores)
        pd = pred_distri.reshape(B, -1, 4, self.reg_max)
        proj = jnp.arange(self.reg_max, dtype=jnp.float32)
        from yolo_sod_tpu.ops.boxes import dist2bbox

        pred_ltrb = jnp.einsum("bafc,c->baf", jax.nn.softmax(pd, -1), proj)
        pred_bboxes = dist2bbox(pred_ltrb, anchor_points[None], xywh=False)
        _, target_bboxes, target_scores, fg_mask, target_gt_idx = self.assigner(
            jax.lax.stop_gradient(pred_scores),
            jax.lax.stop_gradient(pred_bboxes) * stride_tensor[None],
            anchor_points * stride_tensor, gt_labels, gt_bboxes,
            mask_gt)

        idx, w = _gather_foreground(fg_mask, target_scores, self.max_fg)
        sel_gt = jnp.take_along_axis(target_gt_idx, idx, 1)
        sel_kpt_pred = jnp.take_along_axis(kpts, idx[..., None, None], 1)
        sel_anchor = anchor_points[None] * stride_tensor[None]
        sel_anchor = jnp.take_along_axis(
            jnp.broadcast_to(sel_anchor, (B, *sel_anchor.shape[1:])),
            idx[..., None], 1)
        sel_stride = jnp.take_along_axis(
            jnp.broadcast_to(stride_tensor[None], (B, stride_tensor.shape[0], 1)),
            idx[..., None], 1)

        gt_kpts = batch["keypoints"].astype(jnp.float32)             # (B, M, K, 3)
        gt_kpts = gt_kpts.at[..., 0].mul(img_w).at[..., 1].mul(img_h)
        sel_gt_kpt = jnp.take_along_axis(gt_kpts, sel_gt[..., None, None], 1)

        # Decode predicted kpts: (2 * offset + anchor - 0.5) * stride.
        pred_xy = (sel_kpt_pred[..., :2] * 2.0 +
                   (sel_anchor[..., None, :] - 0.5)) * sel_stride[..., None, :]
        vis = (sel_gt_kpt[..., 2] > 0).astype(jnp.float32)
        d2 = ((pred_xy - sel_gt_kpt[..., :2]) ** 2).sum(-1)
        sel_box = jnp.take_along_axis(target_bboxes, idx[..., None], 1)
        area = jnp.clip((sel_box[..., 2] - sel_box[..., 0]) *
                        (sel_box[..., 3] - sel_box[..., 1]), 1.0, None)
        e = d2 / (2 * (area[..., None] * 0.08) ** 1 + 1e-9)
        loss_kpt = (((1 - jnp.exp(-e)) * vis).sum(-1) /
                    jnp.clip(vis.sum(-1), 1, None) * w).sum() / jnp.clip(w.sum(), 1, None)
        loss_kobj = 0.0
        if D == 3:
            kobj = _bce_with_logits(sel_kpt_pred[..., 2], vis)
            loss_kobj = (kobj.mean(-1) * w).sum() / jnp.clip(w.sum(), 1, None)

        total = total_det + (self.pose_gain * loss_kpt +
                             self.kobj_gain * loss_kobj) * B
        return total, jnp.concatenate([items, jnp.array([loss_kpt])])


class OBBLoss(DetectionLoss):
    """Oriented-box criterion (reference v8OBBLoss): the box term becomes
    1 - ProbIoU over [decoded xywh + predicted angle] vs [gt xywh + gt angle]
    on foreground anchors; assignment stays axis-aligned TAL over the
    bounding rectangles (the reference pre-assigns the same way).

    preds = (det_maps, angle_maps); batch extras: 'angles' (B, M) radians.
    """

    def __init__(self, *args, max_fg: int = 256, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_fg = max_fg

    def __call__(self, preds, batch):
        from yolo_sod_tpu.ops.boxes import dist2bbox, probiou

        feats, angle_maps = preds
        total_det, items = super().__call__(feats, batch)

        B = feats[0].shape[0]
        angles = jnp.concatenate([a.reshape(B, -1) for a in angle_maps], 1)

        hw = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = make_anchors(hw, self.strides)
        img_h = feats[0].shape[1] * self.strides[0]
        img_w = feats[0].shape[2] * self.strides[0]
        scale = jnp.array([img_w, img_h, img_w, img_h], jnp.float32)
        gt_bboxes = xywh2xyxy(batch["bboxes"].astype(jnp.float32) * scale)
        gt_labels = batch["cls"].astype(jnp.float32)[..., None]
        mask_gt = batch["mask_gt"].astype(jnp.float32)[..., None]
        pred_distri, raw_scores = split_feats(feats, self.reg_max, self.no)
        pred_scores = jax.nn.sigmoid(raw_scores)
        pd = pred_distri.reshape(B, -1, 4, self.reg_max)
        proj = jnp.arange(self.reg_max, dtype=jnp.float32)
        pred_ltrb = jnp.einsum("bafc,c->baf", jax.nn.softmax(pd, -1), proj)
        pred_bboxes = dist2bbox(pred_ltrb, anchor_points[None], xywh=True)
        _, target_bboxes, target_scores, fg_mask, target_gt_idx = self.assigner(
            jax.lax.stop_gradient(pred_scores),
            jax.lax.stop_gradient(dist2bbox(pred_ltrb, anchor_points[None],
                                            xywh=False)) * stride_tensor[None],
            anchor_points * stride_tensor, gt_labels, gt_bboxes * mask_gt, mask_gt)

        idx, w = _gather_foreground(fg_mask, target_scores, self.max_fg)
        sel_angle = jnp.take_along_axis(angles, idx, 1)
        sel_gt = jnp.take_along_axis(target_gt_idx, idx, 1)
        sel_pred = jnp.take_along_axis(pred_bboxes * stride_tensor[None],
                                       idx[..., None], 1)
        # target xywh (pixels) + gt angle
        tb = jnp.take_along_axis(target_bboxes, idx[..., None], 1)
        t_xywh = jnp.concatenate([(tb[..., :2] + tb[..., 2:]) / 2,
                                  tb[..., 2:] - tb[..., :2]], -1)
        gt_angle = jnp.take_along_axis(batch["angles"].astype(jnp.float32),
                                       sel_gt, 1)
        p_obb = jnp.concatenate([sel_pred, sel_angle[..., None]], -1)
        t_obb = jnp.concatenate([t_xywh, gt_angle[..., None]], -1)
        piou = probiou(p_obb, t_obb)
        loss_obb = (((1.0 - piou) * w).sum()) / jnp.clip(w.sum(), 1.0, None)
        total = total_det + loss_obb * B
        return total, jnp.concatenate([items, jnp.array([loss_obb])])
