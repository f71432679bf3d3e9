"""DETR loss / Hungarian matcher / checks utils tests."""

import numpy as np
import pytest


def test_hungarian_matcher_prefers_exact_boxes():
    from yolo_sod_tpu.models.utils.loss import HungarianMatcher

    B, Q, nc = 1, 4, 3
    gt_bboxes = np.array([[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.1, 0.1]], np.float32)
    gt_cls = np.array([1, 2])
    pred_bboxes = np.zeros((B, Q, 4), np.float32)
    pred_bboxes[0, 0] = [0.7, 0.7, 0.1, 0.1]   # matches gt 1
    pred_bboxes[0, 3] = [0.3, 0.3, 0.2, 0.2]   # matches gt 0
    pred_scores = np.full((B, Q, nc), -4.0, np.float32)
    pred_scores[0, 0, 2] = 4.0
    pred_scores[0, 3, 1] = 4.0
    m = HungarianMatcher()
    (pi, gi), = m(pred_bboxes, pred_scores, gt_bboxes, gt_cls, [2])
    pairs = dict(zip(pi.tolist(), gi.tolist()))
    assert pairs[0] == 1 and pairs[3] == 0


def test_detr_loss_decreases_for_better_preds():
    from yolo_sod_tpu.models.utils.loss import DETRLoss

    crit = DETRLoss(nc=3, aux_loss=False)
    gt = {"bboxes": np.array([[0.5, 0.5, 0.2, 0.2]], np.float32),
          "cls": np.array([1]), "gt_groups": [1]}
    good_b = np.array([[[0.5, 0.5, 0.2, 0.2], [0.1, 0.1, 0.05, 0.05]]], np.float32)
    good_s = np.full((1, 2, 3), -4.0, np.float32)
    good_s[0, 0, 1] = 4.0
    bad_b = np.array([[[0.9, 0.9, 0.5, 0.5], [0.1, 0.1, 0.05, 0.05]]], np.float32)
    bad_s = np.full((1, 2, 3), 0.0, np.float32)
    lg = crit(good_b, good_s, gt)
    lb = crit(bad_b, bad_s, gt)
    assert float(lg["loss_total"]) < float(lb["loss_total"])


def test_cdn_group():
    from yolo_sod_tpu.models.utils.loss import get_cdn_group

    batch = {"cls": np.array([0, 1, 2]), "gt_groups": [2, 1],
             "bboxes": np.array([[0.3, 0.3, 0.2, 0.2], [0.6, 0.6, 0.1, 0.1],
                                 [0.5, 0.5, 0.3, 0.3]], np.float32)}
    cls_q, box_q, _, meta = get_cdn_group(batch, num_classes=4, num_queries=10,
                                          class_embed=None, num_dn=8, training=True)
    assert cls_q.shape[0] == 2 and box_q.shape[-1] == 4
    assert meta["dn_num_split"][1] == 10
    assert get_cdn_group(batch, 4, 10, None, training=False) == (None,) * 4


def test_check_imgsz_and_version():
    from yolo_sod_tpu.utils.checks import check_imgsz, check_version

    assert check_imgsz(600, stride=32) == 608
    assert check_imgsz([640, 480], stride=32) == [640, 480]
    assert check_version("2.1.0", ">=2.0")
    assert not check_version("1.9", ">=2.0")
    with pytest.raises(ModuleNotFoundError):
        check_version("1.0", ">=2.0", hard=True)
