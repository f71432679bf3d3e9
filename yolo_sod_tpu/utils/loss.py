"""Detection training criterion: BCE cls + CIoU box + DFL, with TAL assignment.

TPU-native re-expression of reference utils/loss.py — v8DetectionLoss
:157-262, BboxLoss :91-113, DFLoss :65-88. Differences forced by jit:
- targets arrive pre-padded to a static (B, M, 5) [cls, x, y, w, h normalized]
  with a validity mask (the reference's preprocess loop, loss.py:181-194,
  moves to the host-side collate in data/build.py);
- `fg_mask.sum()` gating and `max(target_scores_sum, 1)` become mask algebra;
- everything else matches term for term, including the `* batch_size` on the
  summed loss (reference loss.py:261).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from yolo_sod_tpu.ops.boxes import bbox2dist, bbox_iou, dist2bbox, make_anchors, xywh2xyxy
from yolo_sod_tpu.utils.tal import TaskAlignedAssigner


def split_feats(feats, reg_max: int, no: int, dtype=jnp.float32):
    """Per-level slice → flatten → concat: (pred_distri (B, A, 4*reg_max),
    pred_scores (B, A, nc)).

    Slicing each 4-D level map BEFORE flatten+concat lets XLA fold
    slice-of-concat back to the head's box/cls tower outputs, so the
    interleaved (B, A, 4*reg_max+nc) tensor (74-channel layout → 128-lane
    pad, copy/layout flips in fwd AND grad graphs) never materializes."""
    B = feats[0].shape[0]
    nd = reg_max * 4
    pred_distri = jnp.concatenate(
        [f[..., :nd].reshape(B, -1, nd) for f in feats], 1).astype(dtype)
    pred_scores = jnp.concatenate(
        [f[..., nd:].reshape(B, -1, no - nd) for f in feats], 1).astype(dtype)
    return pred_distri, pred_scores


def _bce_with_logits(logits, targets):
    """Elementwise binary cross-entropy on logits (reduction='none')."""
    # log(1 + exp(-|x|)) formulation for stability.
    neg_abs = -jnp.abs(logits)
    return jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(jnp.exp(neg_abs))


def dfl_loss(pred_dist, target, reg_max: int = 16):
    """Distribution focal loss (reference DFLoss :65-88).

    Args:
        pred_dist: (..., 4, reg_max) logits.
        target: (..., 4) continuous ltrb distances.

    Returns:
        (..., 1) mean-over-ltrb DFL.
    """
    target = jnp.clip(target, 0, reg_max - 1 - 0.01)
    tl = target.astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist.astype(jnp.float32), axis=-1)
    # One-hot select instead of take_along_axis: last-axis gathers on the
    # (B, A, 4, reg_max) tensor serialize on TPU (measured 83 ms vs ~4 ms
    # for the fused compare-multiply-reduce at A=34k).
    bins = jnp.arange(reg_max, dtype=jnp.int32)
    sel_l = (bins == tl[..., None]).astype(logp.dtype)
    sel_r = (bins == jnp.clip(tr, 0, reg_max - 1)[..., None]).astype(logp.dtype)
    ce_l = -(logp * sel_l).sum(-1)
    ce_r = -(logp * sel_r).sum(-1)
    return (ce_l * wl + ce_r * wr).mean(-1, keepdims=True)


class DetectionLoss:
    """v8-style detection criterion over raw per-level head maps."""

    def __init__(self, nc: int, strides: Sequence[int], reg_max: int = 16,
                 box_gain: float = 7.5, cls_gain: float = 0.5, dfl_gain: float = 1.5,
                 tal_topk: int = 10, per_level: bool = False):
        self.nc = nc
        self.strides = tuple(strides)
        self.reg_max = reg_max
        self.no = nc + reg_max * 4
        self.gains = (box_gain, cls_gain, dfl_gain)
        self.per_level = per_level
        self.assigner = TaskAlignedAssigner(topk=tal_topk, num_classes=nc,
                                            alpha=0.5, beta=6.0)

    def _call_per_level(self, feats: Sequence[jax.Array], batch: dict):
        """Level-local criterion: numerically equal to the dense path (same
        ops on per-level slices; only fp summation order differs) with no
        grad-carrying tensor on the concatenated anchor axis.

        MEASURED PERF-NEUTRAL on v5e (89.28 ms/step both forms,
        back-to-back A/B; the multilevel top-k merge variant is 1.7 ms
        SLOWER — its per-round candidate gathers serialize): the A-axis
        concat seams this was built to kill were already fused away after
        split_feats. Kept off by default as an exactness-tested alternative
        form (tests/test_loss_per_level.py) for shapes where the concat
        does materialize (very large A, many levels)."""
        B = feats[0].shape[0]
        dtype = jnp.float32
        nd = self.reg_max * 4
        proj = jnp.arange(self.reg_max, dtype=dtype)

        scale_first = self.strides[0]
        img_h = feats[0].shape[1] * scale_first
        img_w = feats[0].shape[2] * scale_first
        scale = jnp.array([img_w, img_h, img_w, img_h], dtype)
        gt_bboxes = xywh2xyxy(batch["bboxes"].astype(dtype) * scale)   # (B, M, 4)
        gt_labels = batch["cls"].astype(dtype)[..., None]              # (B, M, 1)
        mask_gt = batch["mask_gt"].astype(dtype)[..., None]            # (B, M, 1)
        gt_bboxes = gt_bboxes * mask_gt

        scores_l, pd_l, boxes_l, anchors_l = [], [], [], []
        for f, s in zip(feats, self.strides):
            pdist = f[..., :nd].reshape(B, -1, nd).astype(dtype)
            scores_l.append(f[..., nd:].reshape(B, -1, self.nc).astype(dtype))
            ap, _ = make_anchors([(f.shape[1], f.shape[2])], [s])      # (A_l, 2) grid units
            anchors_l.append(ap)
            pd = pdist.reshape(B, -1, 4, self.reg_max)
            pd_l.append(pd)
            ltrb = jnp.einsum("bafc,c->baf", jax.nn.softmax(pd, axis=-1), proj)
            boxes_l.append(dist2bbox(ltrb, ap[None], xywh=False))      # grid units

        sg = jax.lax.stop_gradient
        t_labels, t_bboxes, t_scores, fg_l, _ = self.assigner.assign_per_level(
            [sg(jax.nn.sigmoid(ps)) for ps in scores_l],
            [sg(pb) * s for pb, s in zip(boxes_l, self.strides)],
            [ap * s for ap, s in zip(anchors_l, self.strides)],
            gt_labels, gt_bboxes, mask_gt,
        )

        target_scores_sum = jnp.maximum(
            sum(ts.sum() for ts in t_scores), 1.0)

        loss_cls = sum(_bce_with_logits(ps, ts).sum()
                       for ps, ts in zip(scores_l, t_scores)) / target_scores_sum

        loss_box = 0.0
        loss_dfl = 0.0
        for l, s in enumerate(self.strides):
            fg = fg_l[l].astype(dtype)[..., None]                      # (B, A_l, 1)
            tb = t_bboxes[l] / s                                       # grid units
            weight = t_scores[l].sum(-1, keepdims=True)
            iou = bbox_iou(boxes_l[l], tb, xywh=False, CIoU=True)
            loss_box = loss_box + (((1.0 - iou) * weight) * fg).sum()
            target_ltrb = bbox2dist(anchors_l[l][None], tb, self.reg_max)
            ldfl = dfl_loss(pd_l[l], target_ltrb, self.reg_max)
            loss_dfl = loss_dfl + ((ldfl * weight) * fg).sum()
        loss_box = loss_box / target_scores_sum
        loss_dfl = loss_dfl / target_scores_sum

        bg, cg, dg = self.gains
        items = jnp.stack([loss_box * bg, loss_cls * cg, loss_dfl * dg])
        total = items.sum() * B
        return total, jax.lax.stop_gradient(items)

    def _forward_core(self, feats: Sequence[jax.Array], batch: dict):
        """Shared detect criterion core: split → decode → assign → 3 terms.

        Returns (items (3,) UNSCALED [box, cls, dfl], ctx) where ctx carries
        the assignment products the task criteria (seg/pose) reuse — the
        reference shares these the same way (v8SegmentationLoss/v8PoseLoss
        run ONE assignment and read fg_mask/target_gt_idx off it).
        """
        B = feats[0].shape[0]
        dtype = jnp.float32
        pred_distri, pred_scores = split_feats(feats, self.reg_max, self.no)

        hw = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = make_anchors(hw, self.strides)
        img_h = feats[0].shape[1] * self.strides[0]
        img_w = feats[0].shape[2] * self.strides[0]

        # Targets: normalized xywh → pixel xyxy.
        scale = jnp.array([img_w, img_h, img_w, img_h], dtype)
        gt_bboxes = xywh2xyxy(batch["bboxes"].astype(dtype) * scale)   # (B, M, 4)
        gt_labels = batch["cls"].astype(dtype)[..., None]              # (B, M, 1)
        mask_gt = batch["mask_gt"].astype(dtype)[..., None]            # (B, M, 1)
        gt_bboxes = gt_bboxes * mask_gt                                # zero padded rows

        # Decoded boxes in grid units (reference bbox_decode, loss.py:196-203).
        pd = pred_distri.reshape(B, -1, 4, self.reg_max)
        proj = jnp.arange(self.reg_max, dtype=dtype)
        pred_ltrb = jnp.einsum("bafc,c->baf", jax.nn.softmax(pd, axis=-1), proj)
        pred_bboxes = dist2bbox(pred_ltrb, anchor_points[None], xywh=False)    # grid units

        _, target_bboxes, target_scores, fg_mask, target_gt_idx = self.assigner(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
            jax.lax.stop_gradient(pred_bboxes) * stride_tensor[None],
            anchor_points * stride_tensor,
            gt_labels, gt_bboxes, mask_gt,
        )

        target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)

        # Cls: BCE over all anchors/classes.
        loss_cls = _bce_with_logits(pred_scores, target_scores).sum() / target_scores_sum

        # Box + DFL over foreground anchors only (mask algebra instead of
        # boolean indexing — fixed shapes).
        fg = fg_mask.astype(dtype)[..., None]                          # (B, A, 1)
        tb_grid = target_bboxes / stride_tensor[None]
        weight = target_scores.sum(-1, keepdims=True)                  # (B, A, 1)
        iou = bbox_iou(pred_bboxes, tb_grid, xywh=False, CIoU=True)
        loss_box = (((1.0 - iou) * weight) * fg).sum() / target_scores_sum

        target_ltrb = bbox2dist(anchor_points[None], tb_grid, self.reg_max)
        ldfl = dfl_loss(pd, target_ltrb, self.reg_max)                 # (B, A, 1)
        loss_dfl = ((ldfl * weight) * fg).sum() / target_scores_sum

        ctx = {
            "imgsz": (img_h, img_w),
            "anchor_points": anchor_points,      # (A, 2) grid units
            "stride_tensor": stride_tensor,      # (A, 1)
            "fg_mask": fg_mask,                  # (B, A) bool
            "target_gt_idx": target_gt_idx,      # (B, A) int32
            "target_bboxes": target_bboxes,      # (B, A, 4) PIXEL xyxy
            "target_scores": target_scores,      # (B, A, nc)
            "target_scores_sum": target_scores_sum,
        }
        return jnp.stack([loss_box, loss_cls, loss_dfl]), ctx

    def __call__(self, feats: Sequence[jax.Array], batch: dict):
        """Compute (total_loss, loss_items).

        Args:
            feats: per-level (B, H, W, no) NHWC training outputs.
            batch: dict with
                'cls'     (B, M) float class ids (padded rows arbitrary),
                'bboxes'  (B, M, 4) normalized xywh in [0, 1],
                'mask_gt' (B, M) validity (0/1).

        Returns:
            total: scalar = (box*7.5 + cls*0.5 + dfl*1.5).sum() * B,
            items: (3,) detached [box, cls, dfl] components.
        """
        if self.per_level and len(feats) > 1:
            return self._call_per_level(feats, batch)
        core, _ = self._forward_core(feats, batch)
        bg, cg, dg = self.gains
        items = core * jnp.array([bg, cg, dg], core.dtype)
        total = items.sum() * feats[0].shape[0]
        return total, jax.lax.stop_gradient(items)


class E2EDetectLoss:
    """One-to-many + one-to-one dual criterion for the NMS-free v10Detect
    head (reference loss.py:728-743): same v8 loss, TAL topk 10 and 1."""

    def __init__(self, nc: int, strides, reg_max: int = 16,
                 box_gain: float = 7.5, cls_gain: float = 0.5, dfl_gain: float = 1.5):
        self.one2many = DetectionLoss(nc, strides, reg_max, box_gain, cls_gain,
                                      dfl_gain, tal_topk=10)
        self.one2one = DetectionLoss(nc, strides, reg_max, box_gain, cls_gain,
                                     dfl_gain, tal_topk=1)

    def __call__(self, preds, batch):
        if isinstance(preds, (list, tuple)) and not isinstance(preds, dict):
            return self.one2many(preds, batch)
        t1, i1 = self.one2many(preds["one2many"], batch)
        t2, i2 = self.one2one(preds["one2one"], batch)
        return t1 + t2, i1 + i2
