"""Task-Aligned Assigner — fully vectorized, jit-safe, fixed shapes.

TPU-native re-expression of reference utils/tal.py:14-296. Ground-truth boxes
arrive padded to a static max_boxes M with a validity mask, so every tensor is
dense (B, M, A) and the whole assignment compiles into the training graph —
there is no CPU-OOM fallback path (reference tal.py:75-80) because there is
no host round-trip at all.

Semantics parity notes:
- align metric = score^alpha * CIoU^beta over in-gt-box candidates
  (get_box_metrics, reference :133-152).
- top-k per GT with duplicate-count dedup (select_topk_candidates :158-192):
  an anchor counted more than once for the same GT is dropped. With distinct
  metrics this never triggers; we reproduce the effect via one-hot scatter.
- multi-GT conflicts resolved by max CIoU (select_highest_overlaps :269-296).
- target scores = one-hot(label) * (metric / metric.amax per GT * overlaps.amax)
  (reference :111-117, :236-243).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yolo_sod_tpu.ops.boxes import bbox_iou


def select_candidates_in_gts(xy_centers, gt_bboxes, eps: float = 1e-9):
    """(A, 2) anchor centers inside (B, M, 4) xyxy gt boxes → (B, M, A) bool."""
    lt = gt_bboxes[..., None, :2]          # (B, M, 1, 2)
    rb = gt_bboxes[..., None, 2:]          # (B, M, 1, 2)
    xy = xy_centers[None, None]            # (1, 1, A, 2)
    deltas = jnp.concatenate([xy - lt, rb - xy], axis=-1)  # (B, M, A, 4)
    return deltas.min(axis=-1) > eps


def select_highest_overlaps(mask_pos, overlaps, n_max_boxes: int):
    """Resolve anchors claimed by multiple GTs: keep the max-overlap GT.

    Args:
        mask_pos: (B, M, A) positive mask.
        overlaps: (B, M, A) CIoU.

    Returns:
        target_gt_idx (B, A), fg_mask (B, A), mask_pos (B, M, A).
    """
    fg_count = mask_pos.sum(axis=-2)               # (B, A)
    multi = fg_count > 1
    best_gt = overlaps.argmax(axis=1)              # (B, A)
    # one-hot along the M axis directly (broadcast compare) — materializing
    # a (B, A, M) one-hot and transposing it costs a 139 MB copy at P2 scale.
    m_ids = jnp.arange(n_max_boxes)[None, :, None]                 # (1, M, 1)
    is_best = (best_gt[:, None, :] == m_ids).astype(mask_pos.dtype)  # (B, M, A)
    mask_pos = jnp.where(multi[:, None, :], is_best * (mask_pos.sum(-2, keepdims=True) > 0),
                         mask_pos)
    fg_mask = mask_pos.sum(axis=-2) > 0            # (B, A)
    target_gt_idx = mask_pos.argmax(axis=-2)       # (B, A)
    return target_gt_idx, fg_mask, mask_pos


class TaskAlignedAssigner:
    """Stateless functional assigner; __call__ is jit-safe."""

    def __init__(self, topk: int = 10, num_classes: int = 80, alpha: float = 0.5,
                 beta: float = 6.0, eps: float = 1e-9, compressed: bool = False,
                 topk_merge: str = "concat"):
        self.topk = topk
        self.num_classes = num_classes
        self.alpha = alpha
        self.beta = beta
        self.eps = eps
        self.compressed = compressed
        self.topk_merge = topk_merge    # per-level top-k strategy, see assign_per_level

    # Overridable geometry hooks (reference tal.py iou_calculation /
    # select_candidates_in_gts — RotatedTaskAlignedAssigner swaps both).
    def iou_calculation(self, gt_bboxes, pd_bboxes):
        """(B, M, F) gt x (B, A, F) pd → (B, M, A) overlap, clipped to >= 0."""
        return jnp.clip(bbox_iou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :],
                                 xywh=False, CIoU=True)[..., 0], 0, None)

    def select_candidates(self, anc_points, gt_bboxes):
        return select_candidates_in_gts(anc_points, gt_bboxes)

    def __call__(self, pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt):
        """Assign targets.

        Args:
            pd_scores: (B, A, nc) sigmoid scores.
            pd_bboxes: (B, A, 4) xyxy, image pixels.
            anc_points: (A, 2) anchor centers, image pixels.
            gt_labels: (B, M, 1) class ids.
            gt_bboxes: (B, M, 4) xyxy pixels, zero-padded.
            mask_gt: (B, M, 1) validity.

        Returns:
            target_labels (B, A), target_bboxes (B, A, 4),
            target_scores (B, A, nc), fg_mask (B, A) bool, target_gt_idx (B, A).
        """
        B, M = gt_bboxes.shape[:2]
        A = pd_scores.shape[1]
        if M == 0:
            return (jnp.zeros((B, A), jnp.int32),
                    jnp.zeros((B, A, gt_bboxes.shape[-1]), pd_bboxes.dtype),
                    jnp.zeros_like(pd_scores), jnp.zeros((B, A), bool),
                    jnp.zeros((B, A), jnp.int32))

        mask_gt_b = mask_gt[..., 0] > 0                         # (B, M)
        mask_in_gts = self.select_candidates(anc_points, gt_bboxes)  # (B, M, A)

        # Align metric over candidate anchors (get_box_metrics, reference :133-152).
        # One-hot matmul instead of take_along_axis: the (B, nc, A) gather
        # materialized transposed copies (6.0 ms on-chip vs ~2 ms for the
        # einsum at A=34k).
        labels = jnp.clip(gt_labels[..., 0].astype(jnp.int32), 0, self.num_classes - 1)
        label_oh = jax.nn.one_hot(labels, self.num_classes, dtype=pd_scores.dtype)
        scores_per_gt = jnp.einsum("bmc,bac->bma", label_oh, pd_scores)  # (B, M, A)
        overlaps = self.iou_calculation(gt_bboxes, pd_bboxes)    # (B, M, A) >= 0
        valid = mask_in_gts & mask_gt_b[:, :, None]
        # score^alpha * iou^beta with the default (0.5, 6.0) exponents as
        # sqrt + integer powers: generic pow lowers to exp/log transcendental
        # passes over the (B, M, A) tensor.
        if self.alpha == 0.5 and self.beta == 6.0:
            o2 = overlaps * overlaps
            align = jnp.sqrt(scores_per_gt) * (o2 * o2 * o2)
        else:
            align = (scores_per_gt ** self.alpha) * (overlaps ** self.beta)
        align = jnp.where(valid, align, 0.0)
        overlaps = jnp.where(valid, overlaps, 0.0)

        # Top-k per GT (select_topk_candidates, reference :158-192). The
        # reference's topk_mask is mask_gt expanded over k — every top-k
        # entry of a VALID GT counts, including zero-metric anchors (their
        # CIoU clamps to 0 early in training); padded GT rows drop via the
        # `valid` intersection. The reference's scatter-count dedup never
        # triggers (top_k indices are distinct), so plain membership is exact.
        if self.compressed:
            return self._tail_compressed(align, overlaps, valid, labels,
                                         gt_bboxes)
        return self._tail_dense(align, overlaps, valid, labels, gt_bboxes)

    def assign_per_level(self, pd_scores, pd_bboxes, anc_points, gt_labels,
                         gt_bboxes, mask_gt):
        """Level-local assignment: same semantics as `__call__` on the
        concatenated anchors, computed without ever concatenating.

        Args are per-LEVEL lists (pd_scores[l] (B, A_l, nc), pd_bboxes[l]
        (B, A_l, 4) pixels, anc_points[l] (A_l, 2) pixels); GT args are as in
        `__call__`. Returns per-level lists of
        (target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx).

        Only two reductions cross levels — the top-k per GT
        (ops/numerics.topk_mask_multilevel, exact concat-order tie-break) and
        the per-GT norm maxes (max of per-level maxes) — everything else is
        (B, M, A_l) level-local algebra, which keeps XLA from materializing
        the A-axis concat and its gradient splits (the train step's residual
        copy/layout traffic, PERF.md backward accounting).
        """
        from yolo_sod_tpu.ops.numerics import topk_mask_multilevel

        B, M = gt_bboxes.shape[:2]
        L = len(pd_scores)
        if M == 0:
            return ([jnp.zeros((B, s.shape[1]), jnp.int32) for s in pd_scores],
                    [jnp.zeros((B, b.shape[1], 4), b.dtype) for b in pd_bboxes],
                    [jnp.zeros_like(s) for s in pd_scores],
                    [jnp.zeros((B, s.shape[1]), bool) for s in pd_scores],
                    [jnp.zeros((B, s.shape[1]), jnp.int32) for s in pd_scores])

        mask_gt_b = mask_gt[..., 0] > 0
        labels = jnp.clip(gt_labels[..., 0].astype(jnp.int32), 0, self.num_classes - 1)
        label_oh = jax.nn.one_hot(labels, self.num_classes, dtype=pd_scores[0].dtype)

        aligns, overlaps_l, valids = [], [], []
        for ps, pb, ap in zip(pd_scores, pd_bboxes, anc_points):
            mask_in = self.select_candidates(ap, gt_bboxes)            # (B, M, A_l)
            spg = jnp.einsum("bmc,bac->bma", label_oh, ps)
            ov = self.iou_calculation(gt_bboxes, pb)
            valid = mask_in & mask_gt_b[:, :, None]
            if self.alpha == 0.5 and self.beta == 6.0:
                o2 = ov * ov
                align = jnp.sqrt(spg) * (o2 * o2 * o2)
            else:
                align = (spg ** self.alpha) * (ov ** self.beta)
            aligns.append(jnp.where(valid, align, 0.0))
            overlaps_l.append(jnp.where(valid, ov, 0.0))
            valids.append(valid)

        k = min(self.topk, sum(a.shape[-1] for a in aligns))
        if self.topk_merge == "concat":
            # The align tensors are grad-free (assigner inputs are
            # stop_gradient'd), so one concat for the top-k costs a single
            # materialization and no gradient twin; measured the faster
            # merge on v5e (ties the dense criterion, PERF.md round-3).
            from yolo_sod_tpu.ops.numerics import topk_mask_lastdim
            cat = topk_mask_lastdim(jnp.concatenate(aligns, -1), k)
            topk_masks = []
            off = 0
            for a in aligns:
                topk_masks.append(cat[..., off:off + a.shape[-1]])
                off += a.shape[-1]
        else:
            topk_masks = topk_mask_multilevel(aligns, k)

        mask_pos, tgt_idx, fg = [], [], []
        for l in range(L):
            mp = (topk_masks[l] & valids[l]).astype(aligns[l].dtype)
            ti, fm, mp = select_highest_overlaps(mp, overlaps_l[l], M)
            mask_pos.append(mp)
            tgt_idx.append(ti)
            fg.append(fm)

        # Per-GT maxes over ALL levels (max of maxes == max over the concat).
        pos_align_max = jnp.stack(
            [(aligns[l] * mask_pos[l]).max(-1) for l in range(L)], -1).max(-1)
        pos_overlap_max = jnp.stack(
            [(overlaps_l[l] * mask_pos[l]).max(-1) for l in range(L)], -1).max(-1)

        table = jnp.concatenate(
            [labels[..., None].astype(aligns[0].dtype), gt_bboxes], axis=-1)  # (B, M, 5)

        out_labels, out_bboxes, out_scores = [], [], []
        for l in range(L):
            tgt = jnp.einsum("bma,bmf->baf", mask_pos[l], table,
                             precision=jax.lax.Precision.HIGHEST)
            t_labels = tgt[..., 0].astype(jnp.int32)
            one_hot = jax.nn.one_hot(t_labels, self.num_classes,
                                     dtype=aligns[l].dtype) * fg[l][..., None]
            norm = ((aligns[l] * mask_pos[l]) * pos_overlap_max[..., None]
                    / (pos_align_max[..., None] + self.eps)).max(-2)          # (B, A_l)
            out_labels.append(t_labels)
            out_bboxes.append(tgt[..., 1:])
            out_scores.append(one_hot * norm[..., None])

        return out_labels, out_bboxes, out_scores, fg, tgt_idx

    def _tail_dense(self, align, overlaps, valid, labels, gt_bboxes):
        """Reference-shaped dense tail: (B, M, A) mask algebra throughout.

        Kept as the semantics oracle for tests; `_tail_compressed` must match
        it bit-for-bit (tests/test_losses.py::test_tal_compressed_matches_dense).
        """
        B, M, A = align.shape
        from yolo_sod_tpu.ops.numerics import topk_mask_lastdim
        k = min(self.topk, A)
        # Direct top-k membership mask (lowest-index tie-break = lax.top_k's
        # selection). The index-carrying two-stage top-k plus scatter spent
        # 14 ms/step in a variadic stable sort on-chip (jax.profiler trace);
        # the mask form sorts values only.
        mask_topk = topk_mask_lastdim(align, k)

        mask_pos = (mask_topk & valid).astype(align.dtype)       # (B, M, A)
        target_gt_idx, fg_mask, mask_pos = select_highest_overlaps(mask_pos, overlaps, M)

        # Gather targets (get_targets, reference :194-243). mask_pos is the
        # conflict-resolved one-hot (B, M, A) assignment, so the per-anchor
        # label/bbox gathers are one exact contraction with it — the
        # (B, A)-indexed take_along_axis pair serialized on-chip (6.6 ms of
        # the train step, jax.profiler trace) while this is MXU work.
        # Background anchors contract to 0, matching the reference's
        # post-gather `where(fg_mask, ..., 0)` for labels; bbox rows are
        # consumed fg-masked everywhere downstream.
        table = jnp.concatenate(
            [labels[..., None].astype(align.dtype), gt_bboxes], axis=-1)  # (B, M, 5)
        tgt = jnp.einsum("bma,bmf->baf", mask_pos, table,
                         precision=jax.lax.Precision.HIGHEST)             # (B, A, 5)
        target_labels = tgt[..., 0].astype(jnp.int32)
        target_bboxes = tgt[..., 1:]

        one_hot = jax.nn.one_hot(target_labels, self.num_classes, dtype=align.dtype)
        one_hot = one_hot * fg_mask[..., None]

        # Normalize by per-GT max metric (reference _forward :111-117).
        align_pos = align * mask_pos
        overlaps_pos = overlaps * mask_pos
        pos_align_max = align_pos.max(axis=-1, keepdims=True)    # (B, M, 1)
        pos_overlap_max = overlaps_pos.max(axis=-1, keepdims=True)
        norm_align = (align_pos * pos_overlap_max / (pos_align_max + self.eps)).max(-2)  # (B, A)
        target_scores = one_hot * norm_align[..., None]

        return (target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx)

    def _tail_compressed(self, align, overlaps, valid, labels, gt_bboxes):
        """Candidate-compressed tail: identical semantics to `_tail_dense`,
        computed on the (B, M, k) top-k set + (B, M*k) scatters.

        Only top-k candidate anchors can be positive, so the dense
        (B, M, A) mask algebra after the top-k — conflict resolution,
        per-GT norm maxes — touches at most M*k anchors per image.

        MEASURED NEGATIVE on TPU v5e at (16, 64, 34000): 162.6 ms
        fwd+criterion vs 134.0 ms for the dense tail — the four (B, A)
        scatters serialize badly on TPU and cost more than the dense
        (B, M, A) elementwise algebra they replace. Kept (off by default,
        exactness-tested vs the dense oracle) as the better form for
        accelerators with fast scatters and for very large A.

        The subtle case is conflict resolution (select_highest_overlaps):
        an anchor claimed by >1 GTs is reassigned to its max-CIoU VALID GT
        — which may be a GT that did NOT rank the anchor in its own top-k.
        The dense argmax sees those; to match, the per-anchor best GT is
        computed by gathering the full overlap COLUMN of every claimed
        anchor ((B, M, M*k) — still candidate-bounded) before the argmax.
        """
        B, M, A = align.shape
        from yolo_sod_tpu.ops.numerics import exact_topk_lastdim
        k = min(self.topk, A)
        align_c, topk_idx = exact_topk_lastdim(align, k)         # (B, M, k)
        flat_idx = topk_idx.reshape(B, M * k)                    # (B, C)
        C = M * k
        valid_c = jnp.take_along_axis(valid, topk_idx, axis=-1)  # (B, M, k)
        overlaps_c = jnp.take_along_axis(overlaps, topk_idx, axis=-1)
        pos_c = valid_c                                          # mask_topk ∧ valid
        pos_f = pos_c.reshape(B, C)
        gt_ids = jnp.broadcast_to(
            jnp.arange(M, dtype=jnp.int32)[None, :, None], (B, M, k)).reshape(B, C)

        def scat(op_name, payload, init, dtype=None):
            """Scatter flat candidate payloads (B, C) onto anchors (B, A)."""
            out = jnp.full((B, A), init, dtype or payload.dtype)

            def one(o, i, p):
                ref = o.at[i]
                return getattr(ref, op_name)(p, mode="drop")

            return jax.vmap(one)(out, flat_idx, payload)

        fg_count = scat("add", pos_f.astype(jnp.int32), 0)       # (B, A)
        fg_mask = fg_count > 0

        # Per-claimed-anchor best GT over ALL valid in-box GTs (the dense
        # overlaps.argmax(axis=1) semantics, ties -> lowest index): gather
        # each claimed anchor's full (M,) overlap column, argmax over M.
        cols = jax.vmap(lambda ov, ii: ov[:, ii])(overlaps, flat_idx)  # (B, M, C)
        best_gt = jnp.argmax(cols, axis=1).astype(jnp.int32)      # (B, C)

        # Claimant GT for single-claim anchors (exactly one claimant).
        BIGM = jnp.int32(M)
        claimant = scat("min", jnp.where(pos_f, gt_ids, BIGM), M)  # (B, A)
        multi = fg_count > 1
        best_scat = scat("min", jnp.where(pos_f, best_gt, BIGM), M)
        tgt = jnp.where(multi, best_scat, claimant)               # (B, A)
        target_gt_idx = jnp.where(fg_mask, tgt, 0).astype(jnp.int32)

        # Resolved (gt, anchor) pairs per candidate slot: multi-claim anchors
        # re-point to best_gt; their align/overlap values are gathered at the
        # resolved pair (which may lie outside the candidate's own top-k row).
        multi_f = jnp.take_along_axis(multi, flat_idx, axis=-1)   # (B, C)
        res_gt = jnp.where(multi_f, best_gt, gt_ids)              # (B, C)
        lin = res_gt * A + flat_idx                               # (B, C) into (M*A)
        res_align = jnp.take_along_axis(align.reshape(B, M * A), lin, axis=-1)
        res_ov = jnp.take_along_axis(overlaps.reshape(B, M * A), lin, axis=-1)
        # A resolved pair is live iff its slot was a live claim.
        res_align = jnp.where(pos_f, res_align, 0.0)
        res_ov = jnp.where(pos_f, res_ov, 0.0)

        # Per-GT maxes over resolved assignments (segment-max over res_gt;
        # dead slots scatter into the M-th dump row).
        def seg_max(payload):
            out = jnp.zeros((B, M + 1), payload.dtype)
            seg = jnp.where(pos_f, res_gt, M)
            return jax.vmap(lambda o, g, p: o.at[g].max(p, mode="drop"))(
                out, seg, payload)[:, :M]

        pos_align_max = seg_max(res_align)                        # (B, M)
        pos_overlap_max = seg_max(res_ov)                         # (B, M)

        g_amax = jnp.take_along_axis(pos_align_max, res_gt, axis=-1)   # (B, C)
        g_omax = jnp.take_along_axis(pos_overlap_max, res_gt, axis=-1)
        norm_pay = res_align * g_omax / (g_amax + self.eps)
        norm_align = scat("max", jnp.where(pos_f, norm_pay, 0.0), 0.0)  # (B, A)

        # Gather targets (get_targets, reference :194-243). Background rows
        # zero out to match `_tail_dense`'s contraction form (bbox targets
        # are consumed fg-masked everywhere downstream).
        target_labels = jnp.take_along_axis(labels, target_gt_idx, axis=1)  # (B, A)
        target_bboxes = jnp.take_along_axis(gt_bboxes, target_gt_idx[..., None], axis=1)
        target_labels = jnp.where(fg_mask, target_labels, 0)
        target_bboxes = target_bboxes * fg_mask[..., None].astype(target_bboxes.dtype)

        one_hot = jax.nn.one_hot(target_labels, self.num_classes, dtype=align.dtype)
        one_hot = one_hot * fg_mask[..., None]
        target_scores = one_hot * norm_align[..., None]

        return (target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx)


def rotated_corners(rboxes):
    """(..., 5) [cx, cy, w, h, rad] → (..., 4, 2) corner points, reference
    utils/ops.py xywhr2xyxyxyxy corner order (ctr ± w-vec ± h-vec)."""
    ctr = rboxes[..., :2]
    w = rboxes[..., 2:3]
    h = rboxes[..., 3:4]
    angle = rboxes[..., 4:5]
    cos = jnp.cos(angle)
    sin = jnp.sin(angle)
    vec1 = jnp.concatenate([w / 2 * cos, w / 2 * sin], -1)
    vec2 = jnp.concatenate([-h / 2 * sin, h / 2 * cos], -1)
    return jnp.stack([ctr + vec1 + vec2, ctr + vec1 - vec2,
                      ctr - vec1 - vec2, ctr - vec1 + vec2], axis=-2)


def select_candidates_in_rotated_gts(xy_centers, gt_rbboxes):
    """(A, 2) anchor centers inside (B, M, 5) xywhr gt rects → (B, M, A) bool.

    Reference RotatedTaskAlignedAssigner.select_candidates_in_gts
    (tal.py:305-330): projections of (anchor - corner_a) onto the two edge
    vectors must land within [0, |edge|^2]."""
    corners = rotated_corners(gt_rbboxes)          # (B, M, 4, 2)
    a = corners[..., 0, :]                          # (B, M, 2)
    b = corners[..., 1, :]
    d = corners[..., 3, :]
    ab = b - a
    ad = d - a
    ap = xy_centers[None, None] - a[..., None, :]   # (B, M, A, 2)
    norm_ab = (ab * ab).sum(-1)[..., None]          # (B, M, 1)
    norm_ad = (ad * ad).sum(-1)[..., None]
    ap_dot_ab = (ap * ab[..., None, :]).sum(-1)     # (B, M, A)
    ap_dot_ad = (ap * ad[..., None, :]).sum(-1)
    return ((ap_dot_ab >= 0) & (ap_dot_ab <= norm_ab) &
            (ap_dot_ad >= 0) & (ap_dot_ad <= norm_ad))


class RotatedTaskAlignedAssigner(TaskAlignedAssigner):
    """TAL over oriented boxes (reference tal.py:298-330): overlap metric is
    ProbIoU on (..., 5) xywhr boxes and candidate selection is the rotated
    point-in-rect test. gt_bboxes / pd_bboxes carry 5 columns; the returned
    target_bboxes are (B, A, 5) xywhr."""

    def iou_calculation(self, gt_bboxes, pd_bboxes):
        from yolo_sod_tpu.ops.boxes import probiou

        return jnp.clip(probiou(gt_bboxes[:, :, None, :],
                                pd_bboxes[:, None, :, :]), 0, None)

    def select_candidates(self, anc_points, gt_bboxes):
        return select_candidates_in_rotated_gts(anc_points, gt_bboxes)
