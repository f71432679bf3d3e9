"""DETR-family losses + Hungarian matching + contrastive denoising (CDN).

TPU-native analog of reference models/utils/loss.py (DETRLoss :13,
RTDETRDetectionLoss :291) and models/utils/ops.py (HungarianMatcher :12,
get_cdn_group :150), term-for-term:

- class loss: VarifocalLoss (alpha=0.75, gamma=2, IoU-weighted targets,
  reference utils/loss.py:16-37) when GTs exist and use_vfl, else FocalLoss
  (gamma=1.5, alpha=0.25, utils/loss.py:40-62); both normalized sum/num_gts.
- bbox: L1 + GIoU over matched pairs / num_matched.
- aux losses re-match per decoder layer and SUM into single *_aux keys
  (reference _get_loss_aux); `use_uni_match` reuses one layer's assignment.
- CDN groups (get_cdn_group): noised positive+negative GT copies as extra
  decoder queries with a group-isolation attention mask. TPU re-design: the
  slot axis has a FIXED capacity D = 2*max(num_dn, max_boxes) so every batch
  compiles to the same shapes; the reference's dynamic 2*num_group*max_nums
  slots occupy the prefix and the tail is masked padding.

The Hungarian assignment runs host-side via scipy (tiny O(Q*M) problem per
image — exactly how the reference does it); every loss term is jit-friendly
given a fixed assignment.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolo_sod_tpu.ops.boxes import bbox_iou, xywh2xyxy, xyxy2xywh


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


def detr_loss_terms(pred_bboxes, pred_scores, tgt_cls, tgt_box, tgt_mask,
                    num_gts, nc: int, use_vfl: bool, has_gt: bool,
                    loss_gain: dict):
    """Single-layer class/bbox/giou terms from DENSE targets — pure jax, safe
    inside jit (the dynamic assignment has already become data).

    Mirrors reference DETRLoss._get_loss + _get_loss_class + _get_loss_bbox:
    - tgt_cls (B, Q) int, background = nc; tgt_box (B, Q, 4) xywh;
      tgt_mask (B, Q) 1.0 at matched slots; num_gts = matched-pair count.
    - VFL (alpha=0.75, gamma=2): targets are IoU(pred, gt)*one_hot with the
      IoU detached; weight = alpha*p^gamma*(1-label) + gt_score*label.
    - FL (gamma=1.5, alpha=0.25) when no GT or use_vfl False.
    - All sums normalized by max(num_gts, 1) (the reference's
      .mean(1).sum() / (num_gts/nq) algebra collapses to sum/num_gts).
    """
    one_hot = jax.nn.one_hot(tgt_cls, nc + 1, dtype=pred_scores.dtype)[..., :nc]
    n = jnp.maximum(num_gts, 1.0)

    iou = bbox_iou(xywh2xyxy(pred_bboxes), xywh2xyxy(tgt_box),
                   xywh=False)[..., 0]
    iou = jax.lax.stop_gradient(iou) * tgt_mask

    def _bce(s, t):
        # binary_cross_entropy_with_logits(s, t), numerically stable form
        return jnp.clip(s, 0, None) - s * t + jnp.log1p(jnp.exp(-jnp.abs(s)))

    s = pred_scores
    p = jax.nn.sigmoid(s)
    p_t = one_hot * p + (1 - one_hot) * (1 - p)
    a_t = one_hot * 0.25 + (1 - one_hot) * 0.75
    fl = (_bce(s, one_hot) * (1.0 - p_t) ** 1.5 * a_t).sum() / n
    if use_vfl:
        vfl_tgt = iou[..., None] * one_hot
        w = 0.75 * p ** 2 * (1 - one_hot) + vfl_tgt * one_hot
        vfl = (_bce(s, vfl_tgt) * w).sum() / n
        # `has_gt` may be a python bool (host path) or a traced array (the
        # jitted train step) — jnp.where handles both with one graph.
        loss_cls = jnp.where(jnp.asarray(has_gt), vfl, fl)
    else:
        loss_cls = fl

    m = tgt_mask[..., None]
    loss_bbox = (jnp.abs(pred_bboxes - tgt_box) * m).sum() / n
    giou = bbox_iou(xywh2xyxy(pred_bboxes), xywh2xyxy(tgt_box),
                    xywh=False, GIoU=True)[..., 0]
    loss_giou = ((1.0 - giou) * tgt_mask).sum() / n
    return {"loss_class": loss_gain["class"] * loss_cls,
            "loss_bbox": loss_gain["bbox"] * loss_bbox,
            "loss_giou": loss_gain["giou"] * loss_giou}


class DETRLoss:
    """Set-prediction loss (reference models/utils/loss.py:13): per-layer
    matched focal/vfl class + L1 + GIoU, aux layers summed into *_aux keys."""

    def __init__(self, nc: int = 80, loss_gain: Optional[dict] = None,
                 aux_loss: bool = True, use_fl: bool = True,
                 use_vfl: bool = False, use_uni_match: bool = False,
                 uni_match_ind: int = 0, alpha: float = 0.25,
                 gamma: float = 2.0):
        self.nc = nc
        self.loss_gain = loss_gain or {"class": 1, "bbox": 5, "giou": 2,
                                       "no_object": 0.1, "mask": 1, "dice": 1}
        self.aux_loss = aux_loss
        # Matcher cost gains are FIXED at class=2 (reference loss.py:56),
        # independent of the loss gains.
        self.matcher = HungarianMatcher(cost_gain={"class": 2, "bbox": 5,
                                                   "giou": 2},
                                        use_fl=use_fl, alpha=alpha, gamma=gamma)
        self.use_fl = use_fl
        self.use_vfl = use_vfl
        self.use_uni_match = use_uni_match
        self.uni_match_ind = uni_match_ind

    def dense_targets(self, match, gt_bboxes, gt_cls, gt_groups, B, Q):
        """(pred_idx, gt_idx) pairs -> dense (B, Q) targets, background=nc."""
        tgt_cls = np.full((B, Q), self.nc, np.int32)
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
        return tgt_cls, tgt_box, mask

    def _single(self, pred_bboxes, pred_scores, gt_bboxes, gt_cls, gt_groups,
                match_indices=None):
        B, Q, _ = pred_scores.shape
        if match_indices is None:
            match_indices = self.matcher(np.asarray(pred_bboxes),
                                         np.asarray(pred_scores),
                                         gt_bboxes, gt_cls, gt_groups)
        tgt_cls, tgt_box, mask = self.dense_targets(
            match_indices, gt_bboxes, gt_cls, gt_groups, B, Q)
        num_gts = float(sum(len(pi) for pi, _ in match_indices))
        return detr_loss_terms(
            jnp.asarray(pred_bboxes, jnp.float32),
            jnp.asarray(pred_scores, jnp.float32),
            jnp.asarray(tgt_cls), jnp.asarray(tgt_box), jnp.asarray(mask),
            num_gts, self.nc, self.use_vfl and self.use_fl, num_gts > 0,
            self.loss_gain)

    def __call__(self, pred_bboxes, pred_scores, batch, postfix: str = "",
                 match_indices=None):
        """pred_bboxes (L, B, Q, 4) or (B, Q, 4) normalized xywh; pred_scores
        logits matching; batch = {'cls' (sum_M,), 'bboxes' (sum_M, 4),
        'gt_groups' list[int]}. Main loss = LAST layer; earlier layers sum
        into loss_*_aux keys (reference forward :253-289 + _get_loss_aux)."""
        gt_bboxes = np.asarray(batch["bboxes"], np.float32).reshape(-1, 4)
        gt_cls = np.asarray(batch["cls"]).reshape(-1)
        gt_groups = list(batch["gt_groups"])
        if np.ndim(pred_bboxes) == 3:
            pred_bboxes, pred_scores = pred_bboxes[None], pred_scores[None]

        losses = {k + postfix: v for k, v in self._single(
            pred_bboxes[-1], pred_scores[-1], gt_bboxes, gt_cls, gt_groups,
            match_indices=match_indices).items()}

        if self.aux_loss and len(pred_bboxes) > 1:
            aux = {"loss_class": 0.0, "loss_bbox": 0.0, "loss_giou": 0.0}
            uni = match_indices
            if uni is None and self.use_uni_match:
                uni = self.matcher(np.asarray(pred_bboxes[self.uni_match_ind]),
                                   np.asarray(pred_scores[self.uni_match_ind]),
                                   gt_bboxes, gt_cls, gt_groups)
            for li in range(len(pred_bboxes) - 1):
                d = self._single(pred_bboxes[li], pred_scores[li], gt_bboxes,
                                 gt_cls, gt_groups, match_indices=uni)
                for k in aux:
                    aux[k] = aux[k] + d[k]
            losses.update({f"{k}_aux{postfix}": v for k, v in aux.items()})
        losses["loss_total" + postfix] = sum(losses.values())
        return losses


def get_cdn_group(batch, num_classes: int, num_queries: int, class_embed=None,
                  num_dn: int = 100, cls_noise_ratio: float = 0.5,
                  box_noise_scale: float = 1.0, training: bool = False,
                  capacity: Optional[int] = None, rng=None):
    """Contrastive denoising group (reference models/utils/ops.py:150).

    Host-side numpy; fixed-capacity TPU re-design. batch carries the
    concatenated GT contract {'cls' (sum_M,), 'bboxes' (sum_M, 4) normalized
    xywh, 'gt_groups' list[int]}.

    Layout parity with the reference: slot i*max_nums + j holds GT j of tile
    i, tiles 0..G-1 positive, G..2G-1 negative; the group-isolation attention
    mask treats consecutive 2*max_nums chunks as one group. Slots beyond the
    live 2*G*max_nums prefix are inert padding (blocked as keys, background
    targets) so every batch shares one compiled shape.

    Returns (dn_cls, dn_bbox_logit, attn_mask, dn_meta):
      dn_cls (B, D) int32 noised class per slot, -1 = empty;
      dn_bbox_logit (B, D, 4) logit-space noised boxes (0 at empty slots —
        the reference's zero padding_bbox);
      attn_mask (D+nq, D+nq) bool, True = BLOCKED (torch convention);
      dn_meta: dn_num_group, dn_num_split, plus dense reconstruction targets
        tgt_cls (B, D) / tgt_box (B, D, 4) / tgt_mask and num_dn_gts
        (matched positives = sum(gt_groups) * num_group).
    Returns (None,)*4 when not training, num_dn<=0, or no GT (same contract).
    """
    if (not training) or num_dn <= 0:
        return None, None, None, None
    gt_groups = list(batch["gt_groups"])
    total_num = int(sum(gt_groups))
    max_nums = int(max(gt_groups)) if gt_groups else 0
    if max_nums == 0:
        return None, None, None, None
    if rng is None:
        rng = np.random.default_rng(0)

    group = max(num_dn // max_nums, 1)
    bs = len(gt_groups)
    live = max_nums * 2 * group                       # reference's num_dn total
    D = capacity if capacity is not None else live
    assert live <= D, f"CDN capacity {D} < live slots {live}"

    gt_cls = np.asarray(batch["cls"]).reshape(-1).astype(np.int64)
    gt_bbox = np.asarray(batch["bboxes"], np.float32).reshape(-1, 4)

    # Tile GT 2*group times: first `group` tiles positive, rest negative
    # (reference: dn_cls = gt_cls.repeat(2*num_group), neg_idx = second half).
    dn_cls = np.tile(gt_cls, 2 * group)
    dn_bbox = np.tile(gt_bbox, (2 * group, 1))
    neg_mask = np.zeros(len(dn_cls), bool)
    neg_mask[group * total_num:] = True

    if cls_noise_ratio > 0:
        flip = rng.random(dn_cls.shape) < (cls_noise_ratio * 0.5)
        dn_cls = dn_cls.copy()
        dn_cls[flip] = rng.integers(0, num_classes, int(flip.sum()))

    if box_noise_scale > 0:
        known = np.asarray(xywh2xyxy(jnp.asarray(dn_bbox)))
        diff = np.tile(dn_bbox[:, 2:] * 0.5, (1, 2)) * box_noise_scale
        rand_sign = rng.integers(0, 2, dn_bbox.shape) * 2.0 - 1.0
        rand_part = rng.random(dn_bbox.shape)
        rand_part[neg_mask] += 1.0
        known = np.clip(known + rand_sign * rand_part * diff, 0.0, 1.0)
        dn_bbox = np.asarray(xyxy2xywh(jnp.asarray(known)))
        p = np.clip(dn_bbox, 1e-6, 1 - 1e-6)
        dn_bbox = np.log(p / (1 - p))                 # torch.logit(eps=1e-6)

    # Scatter tiles into per-image fixed-capacity slots.
    cls_q = np.full((bs, D), -1, np.int32)
    box_q = np.zeros((bs, D, 4), np.float32)
    tgt_cls = np.full((bs, D), num_classes, np.int32)
    tgt_box = np.zeros((bs, D, 4), np.float32)
    tgt_mask = np.zeros((bs, D), np.float32)
    src = 0
    starts = np.cumsum([0] + gt_groups[:-1])
    for t in range(2 * group):
        for b, m in enumerate(gt_groups):
            if m == 0:
                continue
            sl = slice(t * max_nums, t * max_nums + m)
            seg = slice(src + starts[b], src + starts[b] + m)
            cls_q[b, sl] = dn_cls[seg]
            box_q[b, sl] = dn_bbox[seg]
            # Reconstruction targets: positives -> their ORIGINAL gt;
            # negatives/pads -> background (reference get_dn_match_indices).
            if t < group:
                tgt_cls[b, sl] = gt_cls[starts[b]:starts[b] + m]
                tgt_box[b, sl] = gt_bbox[starts[b]:starts[b] + m]
                tgt_mask[b, sl] = 1.0
        src += total_num

    # Group-isolation mask (True = blocked), reference ops.py:236-250.
    T = D + num_queries
    attn = np.zeros((T, T), bool)
    attn[live:, :live] = True                 # match queries can't see dn
    attn[:, live:D] = True                    # nobody attends to dead pads
    np.fill_diagonal(attn, False)             # keep pad softmax rows finite
    for i in range(group):
        lo, hi = 2 * max_nums * i, 2 * max_nums * (i + 1)
        attn[lo:hi, hi:live] = True
        attn[lo:hi, :lo] = True

    dn_meta = {"dn_num_group": group, "dn_num_split": [live, num_queries],
               "capacity": D, "tgt_cls": tgt_cls, "tgt_box": tgt_box,
               "tgt_mask": tgt_mask,
               "num_dn_gts": float(total_num * group)}
    return cls_q, box_q, attn, dn_meta


class RTDETRDetectionLoss(DETRLoss):
    """DETRLoss over the RTDETRDecoder training outputs (reference
    models/utils/loss.py:291): encoder proposals prepended as aux layer 0
    (reference rtdetr semantics), per-decoder-layer aux losses, and the
    denoising reconstruction loss when dn_meta is present."""

    def __call__(self, preds: dict, batch, dn_meta=None):
        dec_b = np.asarray(preds["dec_bboxes"])     # (L, B, Dq, 4)
        dec_s = np.asarray(preds["dec_scores"])
        if dn_meta is not None:
            D = dn_meta["capacity"]
            dn_b, dec_b = dec_b[:, :, :D], dec_b[:, :, D:]
            dn_s, dec_s = dec_s[:, :, :D], dec_s[:, :, D:]
        pred_b = np.concatenate([np.asarray(preds["enc_bboxes"])[None], dec_b], 0)
        pred_s = np.concatenate([np.asarray(preds["enc_scores"])[None], dec_s], 0)
        losses = super().__call__(pred_b, pred_s, batch)

        if dn_meta is not None:
            live = dn_meta["dn_num_split"][0]
            num_dn_gts = dn_meta["num_dn_gts"]
            dn_losses = {"loss_class_dn": 0.0, "loss_bbox_dn": 0.0,
                         "loss_giou_dn": 0.0, "loss_class_aux_dn": 0.0,
                         "loss_bbox_aux_dn": 0.0, "loss_giou_aux_dn": 0.0}
            L = dn_b.shape[0]
            for li in range(L):
                d = detr_loss_terms(
                    jnp.asarray(dn_b[li], jnp.float32),
                    jnp.asarray(dn_s[li], jnp.float32),
                    jnp.asarray(dn_meta["tgt_cls"]),
                    jnp.asarray(dn_meta["tgt_box"]),
                    jnp.asarray(dn_meta["tgt_mask"]),
                    num_dn_gts, self.nc, self.use_vfl and self.use_fl,
                    num_dn_gts > 0, self.loss_gain)
                sfx = "_dn" if li == L - 1 else "_aux_dn"
                for k, v in d.items():
                    dn_losses[k + sfx] = dn_losses[k + sfx] + v
            losses.update(dn_losses)
            losses["loss_total"] = losses["loss_total"] + sum(dn_losses.values())
        else:
            for k in ("loss_class", "loss_bbox", "loss_giou"):
                losses[k + "_dn"] = jnp.asarray(0.0)
        return losses
