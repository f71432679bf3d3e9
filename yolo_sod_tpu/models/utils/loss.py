"""DETR-family losses + Hungarian matching.

TPU-native analog of reference models/utils/loss.py (DETRLoss :13,
RTDETRDetectionLoss :291) and models/utils/ops.py (HungarianMatcher :12,
get_cdn_group :150). The assignment runs host-side via scipy (matching is a
tiny O(Q·M) problem per image — exactly how the reference does it); the loss
terms themselves are jit-friendly given a fixed assignment.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolo_sod_tpu.ops.boxes import bbox_iou, xywh2xyxy


class HungarianMatcher:
    """Optimal query<->GT assignment by class + L1 + GIoU cost
    (reference models/utils/ops.py:12)."""

    def __init__(self, cost_gain: Optional[dict] = None, use_fl: bool = True,
                 alpha: float = 0.25, gamma: float = 2.0):
        self.cost_gain = cost_gain or {"class": 1, "bbox": 5, "giou": 2}
        self.use_fl = use_fl
        self.alpha = alpha
        self.gamma = gamma

    def __call__(self, pred_bboxes, pred_scores, gt_bboxes, gt_cls, gt_groups):
        """Args (host numpy):
            pred_bboxes: (B, Q, 4) normalized xywh.
            pred_scores: (B, Q, nc) logits.
            gt_bboxes: (sum_M, 4) normalized xywh, concatenated over batch.
            gt_cls: (sum_M,) int.
            gt_groups: list[int] per-image GT counts.

        Returns:
            list of (pred_idx, gt_idx) per image.
        """
        from scipy.optimize import linear_sum_assignment

        B, Q, nc = pred_scores.shape
        if sum(gt_groups) == 0:
            return [(np.array([], int), np.array([], int)) for _ in range(B)]

        scores = 1 / (1 + np.exp(-pred_scores.reshape(B * Q, nc)))
        if self.use_fl:
            neg = (1 - self.alpha) * scores ** self.gamma * \
                (-np.log(1 - scores + 1e-8))
            pos = self.alpha * (1 - scores) ** self.gamma * \
                (-np.log(scores + 1e-8))
            cost_class_all = pos - neg
        else:
            cost_class_all = -scores
        cost_class = cost_class_all[:, gt_cls.astype(int)]      # (BQ, sum_M)

        pb = pred_bboxes.reshape(B * Q, 4)
        cost_bbox = np.abs(pb[:, None] - gt_bboxes[None]).sum(-1)
        giou = np.asarray(bbox_iou(jnp.asarray(xywh2xyxy(jnp.asarray(pb[:, None]))),
                                   jnp.asarray(xywh2xyxy(jnp.asarray(gt_bboxes[None]))),
                                   xywh=False, GIoU=True))[..., 0]
        cost_giou = 1.0 - giou

        C = (self.cost_gain["class"] * cost_class
             + self.cost_gain["bbox"] * cost_bbox
             + self.cost_gain["giou"] * cost_giou)
        C = np.nan_to_num(C, nan=1e6).reshape(B, Q, -1)

        out = []
        start = 0
        for b, m in enumerate(gt_groups):
            if m == 0:
                out.append((np.array([], int), np.array([], int)))
                continue
            pi, gi = linear_sum_assignment(C[b, :, start:start + m])
            out.append((pi.astype(int), gi.astype(int)))
            start += m
        return out


class DETRLoss:
    """Set-prediction loss: focal/vfl class + L1 + GIoU over matched pairs,
    optionally repeated for aux decoder layers (reference models/utils/loss.py:13)."""

    def __init__(self, nc: int = 80, loss_gain: Optional[dict] = None,
                 aux_loss: bool = True, use_fl: bool = True,
                 alpha: float = 0.25, gamma: float = 2.0):
        self.nc = nc
        self.loss_gain = loss_gain or {"class": 1, "bbox": 5, "giou": 2}
        self.aux_loss = aux_loss
        self.matcher = HungarianMatcher(cost_gain=self.loss_gain, use_fl=use_fl,
                                        alpha=alpha, gamma=gamma)
        self.use_fl = use_fl
        self.alpha = alpha
        self.gamma = gamma

    def _single(self, pred_bboxes, pred_scores, gt_bboxes, gt_cls, gt_groups):
        B, Q, nc = pred_scores.shape
        match = self.matcher(np.asarray(pred_bboxes), np.asarray(pred_scores),
                             gt_bboxes, gt_cls, gt_groups)
        # Build dense targets.
        tgt_cls = np.full((B, Q), nc, np.int32)      # background = nc
        tgt_box = np.zeros((B, Q, 4), np.float32)
        mask = np.zeros((B, Q), np.float32)
        start = 0
        for b, (pi, gi) in enumerate(match):
            m = gt_groups[b]
            if m:
                tgt_cls[b, pi] = gt_cls[start + gi].astype(np.int32)
                tgt_box[b, pi] = gt_bboxes[start + gi]
                mask[b, pi] = 1.0
            start += m
        n_gt = max(sum(gt_groups), 1)

        scores = jnp.asarray(pred_scores)
        one_hot = jax.nn.one_hot(jnp.asarray(tgt_cls), nc + 1)[..., :nc]
        if self.use_fl:
            p = jax.nn.sigmoid(scores)
            ce = jnp.clip(scores, 0, None) - scores * one_hot + \
                jnp.log1p(jnp.exp(-jnp.abs(scores)))
            p_t = jnp.where(one_hot == 1, p, 1 - p)
            a_t = jnp.where(one_hot == 1, self.alpha, 1 - self.alpha)
            loss_cls = (a_t * (1 - p_t) ** self.gamma * ce).sum() / n_gt
        else:
            loss_cls = ((jnp.clip(scores, 0, None) - scores * one_hot +
                         jnp.log1p(jnp.exp(-jnp.abs(scores)))).mean(-1)).sum() / n_gt

        m = jnp.asarray(mask)[..., None]
        pb = jnp.asarray(pred_bboxes)
        tb = jnp.asarray(tgt_box)
        loss_bbox = (jnp.abs(pb - tb) * m).sum() / n_gt
        giou = bbox_iou(xywh2xyxy(pb), xywh2xyxy(tb), xywh=False, GIoU=True)[..., 0]
        loss_giou = (((1.0 - giou)[..., None] * m).sum()) / n_gt
        return {"loss_class": self.loss_gain["class"] * loss_cls,
                "loss_bbox": self.loss_gain["bbox"] * loss_bbox,
                "loss_giou": self.loss_gain["giou"] * loss_giou}

    def __call__(self, pred_bboxes, pred_scores, batch):
        """pred_bboxes (L?, B, Q, 4) or (B, Q, 4) normalized xywh; pred_scores
        logits matching; batch = {'cls' (sum_M,), 'bboxes' (sum_M, 4),
        'gt_groups' list[int]}."""
        gt_bboxes = np.asarray(batch["bboxes"], np.float32)
        gt_cls = np.asarray(batch["cls"])
        gt_groups = list(batch["gt_groups"])
        if np.ndim(pred_bboxes) == 3:
            pred_bboxes, pred_scores = pred_bboxes[None], pred_scores[None]
        losses = {}
        last = len(pred_bboxes) - 1
        for li in range(len(pred_bboxes)):
            if li != last and not self.aux_loss:
                continue
            d = self._single(pred_bboxes[li], pred_scores[li], gt_bboxes,
                             gt_cls, gt_groups)
            suffix = "" if li == last else f"_aux{li}"
            losses.update({k + suffix: v for k, v in d.items()})
        losses["loss_total"] = sum(losses.values())
        return losses


def get_cdn_group(batch, num_classes: int, num_queries: int, class_embed,
                  num_dn: int = 100, cls_noise_ratio: float = 0.5,
                  box_noise_scale: float = 1.0, training: bool = False):
    """Contrastive denoising groups (reference models/utils/ops.py:150):
    noised positive + negative GT copies as extra decoder queries. Returns
    None tuple when not training or no room (same contract)."""
    if not training or num_dn <= 0:
        return None, None, None, None
    gt_groups = list(batch["gt_groups"])
    total = max(gt_groups)
    if total == 0:
        return None, None, None, None
    group = max(num_dn // max(total, 1), 1)
    rng = np.random.default_rng(0)
    gt_cls = np.asarray(batch["cls"]).astype(int)
    gt_bboxes = np.asarray(batch["bboxes"], np.float32)
    B = len(gt_groups)
    dn_per_img = total * 2 * group
    cls_q = np.full((B, dn_per_img), num_classes, int)
    box_q = np.zeros((B, dn_per_img, 4), np.float32)
    start = 0
    for b, m in enumerate(gt_groups):
        if m == 0:
            continue
        cls_b = gt_cls[start:start + m]
        box_b = gt_bboxes[start:start + m]
        for g in range(group):
            for neg in (0, 1):
                o = (2 * g + neg) * total
                c = cls_b.copy()
                flip = rng.random(m) < cls_noise_ratio * 0.5
                c[flip] = rng.integers(0, num_classes, flip.sum())
                bb = box_b.copy()
                noise = (rng.random((m, 4)) * 2 - 1) * box_noise_scale
                scale = 1.0 + neg   # negatives get larger noise
                bb[:, :2] += noise[:, :2] * bb[:, 2:] * 0.5 * scale
                bb[:, 2:] *= 1 + noise[:, 2:] * 0.4 * scale
                bb = np.clip(bb, 1e-4, 1.0)
                cls_q[b, o:o + m] = c
                box_q[b, o:o + m] = bb
        start += m
    dn_meta = {"dn_num_group": group, "dn_num_split": [dn_per_img, num_queries]}
    return cls_q, box_q, None, dn_meta


class RTDETRDetectionLoss(DETRLoss):
    """DETRLoss over the RTDETRDecoder training outputs: per-decoder-layer
    aux losses + the encoder's query-selection proposals (reference
    models/utils/loss.py:291)."""

    def __call__(self, preds: dict, batch):
        dec_b = np.asarray(preds["dec_bboxes"])     # (L, B, Q, 4)
        dec_s = np.asarray(preds["dec_scores"])
        enc_b = np.asarray(preds["enc_bboxes"])[None]
        enc_s = np.asarray(preds["enc_scores"])[None]
        pred_b = np.concatenate([dec_b, enc_b], 0)
        pred_s = np.concatenate([dec_s, enc_s], 0)
        return super().__call__(pred_b, pred_s, batch)
