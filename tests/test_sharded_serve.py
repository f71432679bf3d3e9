"""Sharded inference over the 8-device virtual CPU mesh: results must equal
the single-device pipeline exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
def test_sharded_predictor_matches_single_device():
    from yolo_sod_tpu.nn.tasks import DetectionModel
    from yolo_sod_tpu.ops.nms import non_max_suppression
    from yolo_sod_tpu.parallel.serve import ShardedPredictor

    model = DetectionModel("yolov12n.yaml", nc=3)
    model.init(imgsz=64)

    n_chips = len(jax.devices())
    sp = ShardedPredictor(model, imgsz=64, batch_per_chip=1, conf=0.001,
                          half=False)
    assert sp.batch == n_chips

    rng = np.random.default_rng(0)
    imgs = (rng.random((n_chips, 64, 64, 3)) * 255).astype(np.uint8)
    det_s, n_s = sp(imgs)
    assert det_s.shape == (n_chips, 300, 6)

    # single-device reference
    x = jnp.asarray(imgs.astype(np.float32) / 255.0)
    preds = model.predict(model.variables, x)
    det_r, n_r = non_max_suppression(preds, conf_thres=0.001, iou_thres=0.45,
                                     max_det=300)
    np.testing.assert_array_equal(n_s, np.asarray(n_r))
    np.testing.assert_allclose(det_s, np.asarray(det_r), rtol=1e-4, atol=1e-4)
