"""RT-DETR family: model build, NMS-free inference shape, training loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def model():
    from yolo_sod_tpu.nn.tasks import DetectionModel

    m = DetectionModel("rtdetr-l.yaml", nc=5)
    m.init(imgsz=64)
    return m


def test_rtdetr_builds_reasonable_size(model):
    # upstream rtdetr-l is ~32M params; ours lacks the denoising embeds
    assert 25e6 < model.num_params() < 35e6


def test_rtdetr_inference_output(model):
    x = jnp.zeros((1, 64, 64, 3))
    out = model.apply(model.variables, x, train=False)
    # (B, nq<=A, 4+nc): normalized xywh + sigmoid scores, no NMS needed
    assert out.ndim == 3 and out.shape[-1] == 4 + 5
    assert float(out[..., :4].min()) >= 0 and float(out[..., :4].max()) <= 1


def test_rtdetr_training_loss(model):
    from yolo_sod_tpu.models.utils.loss import RTDETRDetectionLoss

    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3)), jnp.float32)
    preds, _ = model.apply(model.variables, x, train=True, mutable=True)
    assert set(preds) == {"dec_bboxes", "dec_scores", "enc_bboxes", "enc_scores"}
    batch = {"bboxes": np.array([[0.5, 0.5, 0.2, 0.2], [0.3, 0.3, 0.1, 0.1],
                                 [0.6, 0.6, 0.2, 0.3]], np.float32),
             "cls": np.array([0, 1, 2]),
             "gt_groups": [2, 1]}
    crit = RTDETRDetectionLoss(nc=5)
    losses = crit(preds, batch)
    assert np.isfinite(float(losses["loss_total"]))
    assert any(k.endswith("_aux0") for k in losses)


def test_rtdetr_predict_pixels_and_nms(model):
    """model.predict emits pixel-space boxes usable by the standard NMS."""
    import jax.numpy as jnp

    from yolo_sod_tpu.ops.nms import non_max_suppression

    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)), jnp.float32)
    preds = model.predict(model.variables, x)
    assert preds.shape[-1] == 4 + 5
    assert float(preds[..., :4].max()) <= 64.0 + 1e-3
    det, n = non_max_suppression(preds, conf_thres=0.01, iou_thres=0.7, max_det=20)
    assert det.shape == (1, 20, 6)
