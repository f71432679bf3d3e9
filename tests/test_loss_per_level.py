"""Per-level criterion ≡ dense criterion.

The level-local DetectionLoss path (utils/loss.py::_call_per_level +
tal.py::assign_per_level + ops/numerics.topk_mask_multilevel) must reproduce
the dense concatenated-anchor path exactly: same assignment sets, same
targets, and loss/grads equal up to fp summation order.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_sod_tpu.ops.numerics import topk_mask_lastdim, topk_mask_multilevel
from yolo_sod_tpu.utils.loss import DetectionLoss
from yolo_sod_tpu.utils.tal import TaskAlignedAssigner
from yolo_sod_tpu.ops.boxes import dist2bbox, make_anchors, xywh2xyxy

STRIDES = (4, 8, 16, 32)
HW = [(16, 16), (8, 8), (4, 4), (2, 2)]
A_TOT = sum(h * w for h, w in HW)
NC = 5
REG_MAX = 16
NO = NC + 4 * REG_MAX


def _mk_batch(rng, B=3, M=8):
    cls = rng.integers(0, NC, (B, M)).astype(np.float32)
    xy = rng.uniform(0.15, 0.85, (B, M, 2))
    wh = rng.uniform(0.05, 0.4, (B, M, 2))
    boxes = np.concatenate([xy, wh], -1).astype(np.float32)
    mask = (rng.uniform(size=(B, M)) < 0.7).astype(np.float32)
    mask[0] = 0.0                      # an image with zero GTs
    boxes[1, 1] = boxes[1, 0]          # duplicate box → metric ties
    cls[1, 1] = cls[1, 0]
    return {"cls": jnp.asarray(cls), "bboxes": jnp.asarray(boxes),
            "mask_gt": jnp.asarray(mask)}


def _mk_feats(rng, B=3):
    return [jnp.asarray(rng.standard_normal((B, h, w, NO)).astype(np.float32))
            for h, w in HW]


def test_topk_mask_multilevel_matches_dense():
    rng = np.random.default_rng(0)
    shapes = [(2, 4, 13), (2, 4, 37), (2, 4, 6)]
    xs = [rng.standard_normal(s).astype(np.float32) for s in shapes]
    # inject ties, incl. cross-level ties
    xs[0][0, 0, 3] = xs[1][0, 0, 5] = xs[2][0, 0, 1] = 7.0
    xs[0][1, 2, :] = 0.0
    xs = [jnp.asarray(x) for x in xs]
    for k in (1, 3, 10, 56):
        dense = topk_mask_lastdim(jnp.concatenate(xs, -1), k)
        per = jnp.concatenate(topk_mask_multilevel(xs, k), -1)
        np.testing.assert_array_equal(np.asarray(per), np.asarray(dense),
                                      err_msg=f"k={k}")


@pytest.mark.parametrize("merge", ["concat", "multilevel"])
def test_assign_per_level_matches_dense(merge):
    rng = np.random.default_rng(1)
    B, M = 3, 8
    batch = _mk_batch(rng, B, M)
    img = HW[0][0] * STRIDES[0]
    scale = jnp.array([img, img, img, img], jnp.float32)
    gt_bboxes = xywh2xyxy(batch["bboxes"] * scale) * batch["mask_gt"][..., None]
    gt_labels = batch["cls"][..., None]
    mask_gt = batch["mask_gt"][..., None]

    scores_l, boxes_l, anchors_l = [], [], []
    for (h, w), s in zip(HW, STRIDES):
        scores_l.append(jnp.asarray(
            rng.uniform(0.01, 1.0, (B, h * w, NC)).astype(np.float32)))
        ap, _ = make_anchors([(h, w)], [s])
        anchors_l.append(ap * s)
        ltrb = jnp.asarray(rng.uniform(0.5, 4.0, (B, h * w, 4)).astype(np.float32))
        boxes_l.append(dist2bbox(ltrb, ap[None], xywh=False) * s)

    assigner = TaskAlignedAssigner(topk=10, num_classes=NC, topk_merge=merge)
    d_lab, d_box, d_sc, d_fg, d_idx = assigner(
        jnp.concatenate(scores_l, 1), jnp.concatenate(boxes_l, 1),
        jnp.concatenate(anchors_l, 0), gt_labels, gt_bboxes, mask_gt)
    p_lab, p_box, p_sc, p_fg, p_idx = assigner.assign_per_level(
        scores_l, boxes_l, anchors_l, gt_labels, gt_bboxes, mask_gt)

    np.testing.assert_array_equal(np.asarray(jnp.concatenate(p_fg, 1)),
                                  np.asarray(d_fg))
    np.testing.assert_array_equal(np.asarray(jnp.concatenate(p_lab, 1)),
                                  np.asarray(d_lab))
    np.testing.assert_array_equal(np.asarray(jnp.concatenate(p_idx, 1)),
                                  np.asarray(d_idx))
    np.testing.assert_allclose(np.asarray(jnp.concatenate(p_box, 1)),
                               np.asarray(d_box), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(p_sc, 1)),
                               np.asarray(d_sc), rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("seed", [2, 3])
def test_loss_per_level_matches_dense(seed):
    rng = np.random.default_rng(seed)
    batch = _mk_batch(rng)
    feats = _mk_feats(rng)
    dense = DetectionLoss(nc=NC, strides=STRIDES, per_level=False)
    perlv = DetectionLoss(nc=NC, strides=STRIDES, per_level=True)

    def tot(crit, fs):
        return crit(fs, batch)[0]

    t_d, i_d = jax.jit(lambda fs: dense(fs, batch))(feats)
    t_p, i_p = jax.jit(lambda fs: perlv(fs, batch))(feats)
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_d), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(i_p), np.asarray(i_d), rtol=2e-5)

    g_d = jax.jit(jax.grad(lambda fs: tot(dense, fs)))(feats)
    g_p = jax.jit(jax.grad(lambda fs: tot(perlv, fs)))(feats)
    for gd, gp in zip(g_d, g_p):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gd),
                                   rtol=1e-4, atol=1e-6)
