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
    assert items.shape == (4,)                      # box, seg, cls, dfl


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
    assert items.shape == (5,)                      # box, pose, kobj, cls, dfl


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


def test_probiou_and_rotated_nms():
    import jax.numpy as jnp

    from yolo_sod_tpu.ops.boxes import probiou
    from yolo_sod_tpu.ops.nms import nms_rotated

    b = jnp.array([[50.0, 50, 20, 10, 0.3]])
    assert float(probiou(b, b)[0]) > 0.98          # self-IoU ~1
    far = jnp.array([[200.0, 200, 20, 10, 0.3]])
    assert float(probiou(b, far)[0]) < 0.05
    rot = jnp.array([[50.0, 50, 20, 10, 0.3 + 1.2]])
    assert float(probiou(b, rot)[0]) < float(probiou(b, b)[0])

    obbs = jnp.array([[50.0, 50, 20, 10, 0.3],
                      [51.0, 50, 20, 10, 0.3],     # duplicate -> suppressed
                      [200.0, 200, 20, 10, 0.0]])
    keep, n = nms_rotated(obbs, jnp.array([0.9, 0.8, 0.7]), iou_thres=0.45)
    assert bool(keep[0]) and not bool(keep[1]) and bool(keep[2])
    assert int(n) == 2


def test_obb_loss():
    import jax.numpy as jnp

    from yolo_sod_tpu.nn.tasks import DetectionModel
    from yolo_sod_tpu.utils.loss_tasks import OBBLoss

    m = DetectionModel(_graph([[0, 1, 2], 1, "OBB", ["nc", 1]]))
    m.init(imgsz=32)
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)), jnp.float32)
    out, _ = m.apply(m.variables, x, train=True, mutable=True)
    M = 3
    batch = {
        "cls": jnp.zeros((2, M)),
        "bboxes": jnp.asarray(np.clip(np.random.default_rng(1).random((2, M, 4)) * 0.4 + 0.3, 0, 1)),
        "mask_gt": jnp.ones((2, M)),
        "angles": jnp.asarray(np.random.default_rng(2).uniform(-0.5, 0.5, (2, M)), jnp.float32),
    }
    crit = OBBLoss(nc=3, strides=m.graph.detect_strides, max_fg=16)
    total, items = crit(out, batch)
    assert np.isfinite(float(total)) and items.shape == (3,)   # box, cls, dfl
