"""SOD loss library: standalone criterion plugins (all jit-safe).

TPU-native re-expression of the reference's experimental loss kit (none of
these are wired into the default criterion, matching the reference —
SURVEY.md §2.2):
- nwd_loss                Normalized Wasserstein Distance (utils/loss_nwd.py:6-78)
- interpiou_*             K-point interpolated IoU (nn/modules/losses/interpiou.py:21-55)
- shape_iou_loss, dsla_targets, focal_loss, MFLoss (utils/loss_mf.py:15-182)
- BoundaryAwareLoss       Sobel-edge BCE (nn/modules/loss_boundary.py:9-147)
- RFLATaskAlignedAssigner RFD/KLD-based assigner with 2-stage HLA
                          (utils/tal_rfla.py:32-250)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from yolo_sod_tpu.ops.boxes import bbox_iou
from yolo_sod_tpu.utils.tal import TaskAlignedAssigner, select_highest_overlaps


# -- NWD ----------------------------------------------------------------------

def nwd_loss(pred_boxes, gt_boxes, eps: float = 1e-7, constant: float = 12.8):
    """NWD loss over (..., 4) xywh boxes: L = 1 - exp(-sqrt(W2²)/C).

    Boxes map to Gaussians N(center, diag(w²/4, h²/4)); for diagonal
    covariances the 2-Wasserstein distance is closed-form:
    W2² = ||μ1-μ2||² + ||(w1-w2)/2||² + ||(h1-h2)/2||².
    """
    mean_d = ((pred_boxes[..., :2] - gt_boxes[..., :2]) ** 2).sum(-1)
    hw_p = jnp.clip(pred_boxes[..., 2:], eps, None) / 2
    hw_g = jnp.clip(gt_boxes[..., 2:], eps, None) / 2
    cov_d = ((hw_p - hw_g) ** 2).sum(-1)
    w2 = jnp.clip(mean_d + cov_d, eps, None)
    return 1.0 - jnp.exp(-jnp.sqrt(w2) / constant)


# -- InterpIoU ----------------------------------------------------------------

def _iou_xyxy(a, b, eps: float = 1e-9):
    tl = jnp.maximum(a[..., :2], b[..., :2])
    br = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0, None) * jnp.clip(a[..., 3] - a[..., 1], 0, None)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0, None) * jnp.clip(b[..., 3] - b[..., 1], 0, None)
    return inter / jnp.clip(area_a + area_b - inter, eps, None)


def interpiou_iou_xyxy(pred_xyxy, gt_xyxy, samples: int = 8, eps: float = 1e-9):
    """Mean IoU of K boxes linearly interpolated pred→gt — a smooth IoU
    surrogate robust for tiny/offset boxes."""
    t = jnp.linspace(0.0, 1.0, max(int(samples), 1)).reshape(-1, *([1] * pred_xyxy.ndim))
    interp = (1.0 - t) * pred_xyxy[None] + t * gt_xyxy[None]
    ious = _iou_xyxy(interp, jnp.broadcast_to(gt_xyxy[None], interp.shape), eps)
    return ious.mean(0)


def interpiou_loss_xyxy(pred_xyxy, gt_xyxy, samples: int = 8, eps: float = 1e-9):
    return (1.0 - interpiou_iou_xyxy(pred_xyxy, gt_xyxy, samples, eps)).mean()


# -- Shape-IoU / DSLA / focal (MambaFusion kit) -------------------------------

def shape_iou_loss(pred_boxes, target_boxes, eps: float = 1e-7):
    """IoU minus a saturating log-space wh-shape penalty, averaged."""
    iou = bbox_iou(pred_boxes, target_boxes, xywh=True)[..., 0]
    wh_diff = ((jnp.log(jnp.clip(pred_boxes[..., 2:], eps, None) + eps)
                - jnp.log(jnp.clip(target_boxes[..., 2:], eps, None) + eps)) ** 2).sum(-1)
    shape_iou = iou - wh_diff / (wh_diff + 1.0)
    return (1.0 - shape_iou).mean()


def dsla_targets(iou_scores, center_distances, gamma: float = 2.0):
    """Dynamic soft label assignment: IoU^γ · (1 - center distance)."""
    return jnp.clip((iou_scores ** gamma) * (1.0 - center_distances), 0.0, 1.0)


def focal_loss(pred_logits, target, alpha: float = 0.25, gamma: float = 2.0):
    """Binary focal loss over logits; target is one-hot/soft (..., C) or (N,) hard."""
    if target.ndim == pred_logits.ndim - 1:
        target = jax.nn.one_hot(target.astype(jnp.int32), pred_logits.shape[-1])
    p = jax.nn.sigmoid(pred_logits)
    ce = jnp.clip(pred_logits, 0, None) - pred_logits * target + \
        jnp.log1p(jnp.exp(-jnp.abs(pred_logits)))
    p_t = jnp.where(target == 1, p, 1 - p)
    alpha_t = jnp.where(target == 1, alpha, 1 - alpha)
    return (alpha_t * (1 - p_t) ** gamma * ce).mean()


class MFLoss:
    """Shape-IoU regression + focal classification composite (loss_mf.py:101-182)."""

    def __init__(self, box_weight: float = 7.5, cls_weight: float = 0.5,
                 alpha: float = 0.25, gamma: float = 2.0):
        self.box_weight = box_weight
        self.cls_weight = cls_weight
        self.alpha = alpha
        self.gamma = gamma

    def __call__(self, pred_boxes, pred_logits, target_boxes, target_scores):
        lbox = shape_iou_loss(pred_boxes, target_boxes)
        lcls = focal_loss(pred_logits, target_scores, self.alpha, self.gamma)
        return self.box_weight * lbox + self.cls_weight * lcls


# -- Boundary-aware loss ------------------------------------------------------

_SOBEL_X = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
_SOBEL_Y = _SOBEL_X.T


def sobel_edges(mask):
    """Edge magnitude of a (B, H, W, 1) mask via Sobel filters."""
    k = jnp.stack([_SOBEL_X, _SOBEL_Y], axis=-1)[:, :, None, :]   # (3,3,1,2)
    g = jax.lax.conv_general_dilated(mask, k, (1, 1), "SAME",
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.sqrt((g ** 2).sum(-1, keepdims=True) + 1e-12)


class BoundaryAwareLoss:
    """Boundary-weighted BCE for dense masks (loss_boundary.py:9-147):
    pixels near GT edges (Sobel magnitude) get up-weighted."""

    def __init__(self, edge_weight: float = 2.0, base_weight: float = 1.0):
        self.edge_weight = edge_weight
        self.base_weight = base_weight

    def __call__(self, pred_logits, gt_mask):
        edges = sobel_edges(gt_mask)
        w = self.base_weight + self.edge_weight * (edges > 0.5).astype(jnp.float32)
        ce = jnp.clip(pred_logits, 0, None) - pred_logits * gt_mask + \
            jnp.log1p(jnp.exp(-jnp.abs(pred_logits)))
        return (w * ce).sum() / jnp.clip(w.sum(), 1.0, None)


# -- RFLA assigner ------------------------------------------------------------

class RFLATaskAlignedAssigner(TaskAlignedAssigner):
    """Receptive-Field-based Label Assignment (utils/tal_rfla.py:32-250).

    Replaces the CIoU localization term with RFD = 1/(1+KLD) between each
    anchor's Gaussian effective receptive field (radius ≈ rf_ratio·stride) and
    the GT box Gaussian; 2-stage hierarchical assignment: top-k, then one
    rescue sample with a decayed ERF for GTs that got nothing. Fully dense /
    jit-safe like the base class.
    """

    def __init__(self, topk: int = 13, num_classes: int = 80, alpha: float = 0.5,
                 beta: float = 6.0, eps: float = 1e-9, *,
                 strides: Sequence[int], hw_list: Sequence[Tuple[int, int]],
                 rf_ratio: float = 2.0, beta_hla: float = 0.9):
        super().__init__(topk=topk, num_classes=num_classes, alpha=alpha,
                         beta=beta, eps=eps)
        ern = []
        for s, (h, w) in zip(strides, hw_list):
            ern.append(jnp.full((h * w,), float(s) * rf_ratio, jnp.float32))
        self.ern = jnp.concatenate(ern)           # (A,) ERF radius per anchor
        self.beta_hla = beta_hla

    def _rfd(self, anc_points, gt_bboxes, ern):
        """RFD (B, M, A) from the closed-form Gaussian KLD."""
        eps = self.eps
        xg = (gt_bboxes[..., 0] + gt_bboxes[..., 2])[..., None] * 0.5   # (B, M, 1)
        yg = (gt_bboxes[..., 1] + gt_bboxes[..., 3])[..., None] * 0.5
        wg = jnp.clip(gt_bboxes[..., 2] - gt_bboxes[..., 0], eps, None)[..., None]
        hg = jnp.clip(gt_bboxes[..., 3] - gt_bboxes[..., 1], eps, None)[..., None]
        xa = anc_points[None, None, :, 0]                                # (1, 1, A)
        ya = anc_points[None, None, :, 1]
        e2 = (ern ** 2)[None, None]
        kld = (e2 / (8 * wg ** 2) + e2 / (8 * hg ** 2)
               + 2 * (xa - xg) ** 2 / wg ** 2 + 2 * (ya - yg) ** 2 / hg ** 2
               + jnp.log(jnp.clip(2 * wg, eps, None)) - jnp.log(jnp.clip(ern, eps, None))[None, None]
               + jnp.log(jnp.clip(2 * hg, eps, None)) - jnp.log(jnp.clip(ern, eps, None))[None, None]
               - 1.0)
        return 1.0 / (1.0 + jnp.clip(kld, 0.0, None))

    def __call__(self, pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt):
        B, M = gt_bboxes.shape[:2]
        A = pd_scores.shape[1]
        valid = (mask_gt[..., 0] > 0)                                     # (B, M)

        labels = jnp.clip(gt_labels[..., 0].astype(jnp.int32), 0, self.num_classes - 1)
        cls_scores = jnp.take_along_axis(pd_scores.transpose(0, 2, 1),
                                         labels[:, :, None], axis=1)      # (B, M, A)
        cls_scores = jnp.where(valid[..., None], cls_scores, 0.0)

        # Stage 1: top-k on score^α · RFD^β.
        rfd1 = self._rfd(anc_points, gt_bboxes, self.ern) * valid[..., None]
        align1 = (jnp.clip(cls_scores, self.eps, None) ** self.alpha) * \
            (jnp.clip(rfd1, self.eps, None) ** self.beta)
        align1 = jnp.where(valid[..., None], align1, 0.0)
        k = min(self.topk, A)
        topk_vals, topk_idx = jax.lax.top_k(align1, k)
        topk_valid = topk_vals > self.eps
        mask_s1 = jnp.zeros_like(align1, dtype=bool)
        mask_s1 = jax.vmap(jax.vmap(
            lambda m, idx, v: m.at[idx].set(v, mode="drop")
        ))(mask_s1, topk_idx, topk_valid)

        # Stage 2: decayed-ERF rescue sample for GTs with no positives.
        rfd2 = self._rfd(anc_points, gt_bboxes, self.ern * self.beta_hla)
        align2 = (jnp.clip(cls_scores, self.eps, None) ** self.alpha) * \
            (jnp.clip(rfd2, self.eps, None) ** self.beta)
        align2 = jnp.where(mask_s1, -1e9, align2)
        top1 = align2.argmax(-1)                                          # (B, M)
        mask_s2 = jax.nn.one_hot(top1, A, dtype=jnp.bool_)
        has_pos = mask_s1.any(-1, keepdims=True)
        mask_s2 = mask_s2 & ~has_pos & valid[..., None]

        mask_pos = (mask_s1 | mask_s2).astype(align1.dtype)
        target_gt_idx, fg_mask, mask_pos = select_highest_overlaps(mask_pos, rfd1, M)

        target_labels = jnp.take_along_axis(labels, target_gt_idx, axis=1)
        target_bboxes = jnp.take_along_axis(gt_bboxes, target_gt_idx[..., None], axis=1)
        target_labels = jnp.where(fg_mask, target_labels, 0)

        one_hot = jax.nn.one_hot(target_labels, self.num_classes, dtype=align1.dtype)
        one_hot = one_hot * fg_mask[..., None]
        align_pos = align1 * mask_pos
        rfd_pos = rfd1 * mask_pos
        norm = (align_pos * rfd_pos.max(-1, keepdims=True)
                / (align_pos.max(-1, keepdims=True) + self.eps)).max(-2)
        target_scores = one_hot * norm[..., None]
        return target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx


def compute_atss_targets(pred_boxes, gt_boxes, gt_labels, mask_gt,
                         num_classes: int, topk: int = 9):
    """ATSS target assignment (reference utils/loss_mf.py:185-253, the MF
    kit's simplified Adaptive Training Sample Selection) — jit-safe.

    For each GT, the top-k anchors by IoU are candidates; the dynamic
    positivity threshold is mean+std of those candidate IoUs; multi-GT
    conflicts resolve to the max-IoU GT.

    Args:
        pred_boxes: (N, 4) xywh predictions.
        gt_boxes: (M, 4) xywh, zero-padded.
        gt_labels: (M,) int class ids.
        mask_gt: (M,) validity 0/1.
        num_classes: class count.
        topk: candidates per GT (reference hardcodes 9).

    Returns:
        dict(labels (N,), bbox_targets (N, 4), weights (N,)).
    """
    N = pred_boxes.shape[0]
    M = gt_boxes.shape[0]
    valid = mask_gt.astype(jnp.float32)                       # (M,)
    ious = bbox_iou(pred_boxes[:, None], gt_boxes[None], xywh=True)[..., 0]
    ious = ious * valid[None]                                 # (N, M)

    k = min(topk, N)
    topk_ious, topk_idx = jax.lax.top_k(ious.T, k)            # (M, k)
    thr = topk_ious.mean(-1) + topk_ious.std(-1)              # (M,)

    # candidate mask via scatter: anchor n positive for GT m if it is one of
    # m's top-k AND its IoU >= m's dynamic threshold
    cand = jax.vmap(lambda row_idx: jnp.zeros(N, bool).at[row_idx].set(True))(
        topk_idx)                                             # (M, N)
    positive = cand.T & (ious >= thr[None]) & (valid[None] > 0)   # (N, M)

    is_pos = positive.any(-1)
    matched = ious.argmax(-1)                                 # (N,) max-IoU GT
    labels = jnp.where(is_pos, gt_labels.astype(jnp.int32)[matched], 0)
    bbox_targets = jnp.where(is_pos[:, None], gt_boxes[matched], 0.0)
    weights = is_pos.astype(jnp.float32)
    return {"labels": labels, "bbox_targets": bbox_targets, "weights": weights}
