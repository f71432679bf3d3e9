"""Export + AutoBackend round-trip tests (reference test_exports.py doctrine:
export, reload, re-predict, compare)."""

import os
from pathlib import Path

import numpy as np
import pytest

TMP = Path(__file__).parent / "tmp"


@pytest.fixture(scope="module")
def model():
    from yolo_sod_tpu import YOLO

    m = YOLO("yolov12n.yaml")
    m.model.init(imgsz=64)
    return m


def test_ckpt_roundtrip(model, tmp_path):
    from yolo_sod_tpu.nn.autobackend import AutoBackend
    from yolo_sod_tpu.utils.checkpoint import save_checkpoint

    p = tmp_path / "m.ckpt"
    save_checkpoint(p, model=model.model)
    backend = AutoBackend(str(p), conf=0.001)
    x = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
    det, n = backend.forward(x)
    assert det.shape == (1, 300, 6)
    assert n.shape == (1,)


def test_stablehlo_export_matches_native(model, tmp_path):
    import jax
    import jax.numpy as jnp

    from yolo_sod_tpu.cfg import DEFAULT_CFG_DICT, get_cfg
    from yolo_sod_tpu.engine.exporter import Exporter
    from yolo_sod_tpu.nn.autobackend import AutoBackend
    from yolo_sod_tpu.ops.nms import non_max_suppression

    os.chdir(tmp_path)
    args = get_cfg(DEFAULT_CFG_DICT, {"imgsz": 64, "batch": 1, "half": False,
                                      "conf": 0.001, "mode": "export"})
    path = Exporter(args=args)(model=model.model, fmt="stablehlo")
    backend = AutoBackend(path)
    x = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
    det, n = backend.forward(x)

    preds = model.model.predict(model.model.variables, jnp.asarray(x))
    det_ref, n_ref = non_max_suppression(preds, conf_thres=0.001, iou_thres=0.45,
                                         max_det=300)
    np.testing.assert_allclose(det, np.asarray(det_ref), rtol=1e-4, atol=1e-4)
    assert int(n[0]) == int(np.asarray(n_ref)[0])


def test_model_export_api(model, tmp_path):
    os.chdir(tmp_path)
    out = model.export(format="ckpt", imgsz=64)
    assert Path(out).exists()
