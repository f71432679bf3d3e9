"""Segment / Pose / OBB heads + task losses (unit level)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _graph(head_row):
    return {
        "nc": 3,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
        ],
        "head": [head_row],
    }


def test_segment_head_and_loss():
    from yolo_sod_tpu.nn.tasks import DetectionModel
    from yolo_sod_tpu.utils.loss_tasks import SegmentationLoss

    m = DetectionModel(_graph([[0, 1, 2], 1, "Segment", ["nc", 8, 32]]))
    m.init(imgsz=32)
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)), jnp.float32)
    det, coeffs, protos = m.apply(m.variables, x, train=False)
    assert len(det) == 3 and len(coeffs) == 3
    assert protos.shape == (2, 32, 32, 8)          # 2x upsample of P1/2 level
    assert coeffs[0].shape[-1] == 8

    M = 4
    Hm, Wm = protos.shape[1], protos.shape[2]
    batch = {
        "cls": jnp.zeros((2, M)),
        "bboxes": jnp.asarray(np.clip(np.random.default_rng(1).random((2, M, 4)) * 0.4 + 0.3, 0, 1)),
        "mask_gt": jnp.ones((2, M)),
        "masks": jnp.asarray((np.random.default_rng(2).random((2, M, Hm, Wm)) > 0.5).astype(np.float32)),
    }
    crit = SegmentationLoss(nc=3, strides=m.graph.detect_strides, max_fg=32)
    out, _ = m.apply(m.variables, x, train=True, mutable=True)
    total, items = crit(out, batch)
    assert np.isfinite(float(total))
    assert items.shape == (4,)                      # box, cls, dfl, mask


def test_pose_head_and_loss():
    from yolo_sod_tpu.nn.tasks import DetectionModel
    from yolo_sod_tpu.utils.loss_tasks import PoseLoss

    m = DetectionModel(_graph([[0, 1, 2], 1, "Pose", ["nc", [5, 3]]]))
    m.init(imgsz=32)
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)), jnp.float32)
    det, kpts = m.apply(m.variables, x, train=False)
    assert kpts[0].shape[-1] == 5 * 3

    M = 3
    batch = {
        "cls": jnp.zeros((2, M)),
        "bboxes": jnp.asarray(np.clip(np.random.default_rng(1).random((2, M, 4)) * 0.4 + 0.3, 0, 1)),
        "mask_gt": jnp.ones((2, M)),
        "keypoints": jnp.asarray(np.random.default_rng(2).random((2, M, 5, 3)), jnp.float32),
    }
    crit = PoseLoss(nc=3, strides=m.graph.detect_strides, kpt_shape=(5, 3), max_fg=16)
    out, _ = m.apply(m.variables, x, train=True, mutable=True)
    total, items = crit(out, batch)
    assert np.isfinite(float(total))


def test_obb_head():
    from yolo_sod_tpu.nn.tasks import DetectionModel

    m = DetectionModel(_graph([[0, 1, 2], 1, "OBB", ["nc", 1]]))
    m.init(imgsz=32)
    x = jnp.zeros((1, 32, 32, 3))
    det, angles = m.apply(m.variables, x, train=False)
    assert len(angles) == 3 and angles[0].shape[-1] == 1
    import math
    a = np.asarray(angles[0])
    assert a.min() >= -math.pi / 4 - 1e-5 and a.max() <= 3 * math.pi / 4 + 1e-5
