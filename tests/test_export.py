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


def _tf_available():
    try:
        import tensorflow  # noqa: F401
        from jax.experimental import jax2tf  # noqa: F401
        return True
    except Exception:
        return False


# Visible skip (VERDICT r2 item 8): if TF/jax2tf leave this image, the row in
# PARITY.md must flip, not silently pass.
tf_required = pytest.mark.skipif(not _tf_available(),
                                 reason="tensorflow/jax2tf unavailable")


@tf_required
@pytest.mark.parametrize("fmt", ["saved_model", "tflite"])
def test_tf_export_matches_native(model, tmp_path, fmt):
    """saved_model / TFLite round-trip with prediction equality vs the native
    fused pipeline (reference tests/test_exports.py:23-70 doctrine)."""
    import jax.numpy as jnp

    from yolo_sod_tpu.cfg import DEFAULT_CFG_DICT, get_cfg
    from yolo_sod_tpu.engine.exporter import Exporter
    from yolo_sod_tpu.nn.autobackend import AutoBackend
    from yolo_sod_tpu.ops.nms import non_max_suppression

    os.chdir(tmp_path)
    args = get_cfg(DEFAULT_CFG_DICT, {"imgsz": 64, "batch": 1, "half": False,
                                      "conf": 0.001, "mode": "export"})
    path = Exporter(args=args)(model=model.model, fmt=fmt)
    assert Path(path).exists()
    backend = AutoBackend(path)
    assert backend.format == fmt
    x = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
    det, n = backend.forward(x)

    preds = model.model.predict(model.model.variables, jnp.asarray(x))
    det_ref, n_ref = non_max_suppression(preds, conf_thres=0.001, iou_thres=0.45,
                                         max_det=300)
    det_ref, n_ref = np.asarray(det_ref), int(np.asarray(n_ref)[0])
    assert det.shape == det_ref.shape
    assert int(n[0]) == n_ref
    k = n_ref
    # TFLite runs f32 on XNNPack; tolerate small numeric drift on box coords.
    np.testing.assert_allclose(det[0, :k, 4], det_ref[0, :k, 4],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(det[0, :k, 5], det_ref[0, :k, 5])
    np.testing.assert_allclose(det[0, :k, :4], det_ref[0, :k, :4],
                               rtol=2e-3, atol=0.25)


def test_benchmark_format_val_sweep(model, tmp_path):
    """Reference benchmark() doctrine: export N formats, re-val each through
    the standard validator, report latency + mAP per format."""
    import cv2

    os.chdir(tmp_path)
    root = tmp_path / "synth"
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(4):
            img = rng.integers(0, 60, (64, 64, 3), np.uint8)
            cv2.rectangle(img, (19, 19), (45, 45), (0, 0, 220), -1)
            cv2.imwrite(str(root / "images" / split / f"{i}.jpg"), img)
            (root / "labels" / split / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4")
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: images/train\nval: images/val\nnames:\n  0: box\n")

    from yolo_sod_tpu.utils.benchmarks import benchmark

    rows = benchmark(model, imgsz=64, batch=2, half=False,
                     formats=("ckpt", "stablehlo"), iters=2,
                     data=root / "data.yaml")
    assert [r["format"] for r in rows] == ["ckpt", "stablehlo"]
    for r in rows:
        assert r["status"] == "ok", r
        assert "mAP50-95" in r and np.isfinite(r["mAP50-95"])
    # Same weights, same data -> the two backends must agree on mAP.
    assert abs(rows[0]["mAP50-95"] - rows[1]["mAP50-95"]) < 1e-3


@tf_required
def test_tflite_int8_calibrated_roundtrip(model, tmp_path):
    """int8=True TFLite export: post-training quantization with a calibrated
    representative dataset (reference engine/exporter.py:882), then a
    round-trip accuracy check vs the native pipeline on synthetic data
    (VERDICT r3 next-step #8)."""
    import jax.numpy as jnp

    from yolo_sod_tpu.cfg import DEFAULT_CFG_DICT, get_cfg
    from yolo_sod_tpu.engine.exporter import Exporter
    from yolo_sod_tpu.nn.autobackend import AutoBackend
    from yolo_sod_tpu.ops.nms import non_max_suppression

    os.chdir(tmp_path)
    args = get_cfg(DEFAULT_CFG_DICT, {"imgsz": 64, "batch": 1, "half": False,
                                      "conf": 0.001, "int8": True,
                                      "mode": "export"})
    path = Path(Exporter(args=args)(model=model.model, fmt="tflite")).resolve()
    assert path.exists()
    # Quantization actually happened: the int8 artifact is materially smaller
    # than an unquantized export of the same graph.
    args_f = get_cfg(DEFAULT_CFG_DICT, {"imgsz": 64, "batch": 1, "half": False,
                                        "conf": 0.001, "mode": "export"})
    f32_dir = tmp_path / "f32"
    f32_dir.mkdir()
    os.chdir(f32_dir)
    path_f = Path(Exporter(args=args_f)(model=model.model,
                                        fmt="tflite")).resolve()
    os.chdir(tmp_path)
    assert path != path_f
    assert path.stat().st_size < 0.7 * path_f.stat().st_size

    backend = AutoBackend(path, conf=0.001)
    x = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
    det, n = backend.forward(x)

    preds = model.model.predict(model.model.variables, jnp.asarray(x))
    det_ref, n_ref = non_max_suppression(preds, conf_thres=0.001,
                                         iou_thres=0.45, max_det=300)
    det_ref, n_ref = np.asarray(det_ref), int(np.asarray(n_ref)[0])
    # INT8 shifts scores slightly: survivors can reorder or change at the
    # margin, so match rows by box OVERLAP, not position — each reference
    # survivor must have a quantized counterpart with IoU > 0.5 and a close
    # score (positional comparison is flaky on near-equal noise scores).
    assert abs(int(n[0]) - n_ref) <= max(3, n_ref // 3)

    def iou(a, b):
        x1 = np.maximum(a[0], b[:, 0]); y1 = np.maximum(a[1], b[:, 1])
        x2 = np.minimum(a[2], b[:, 2]); y2 = np.minimum(a[3], b[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area = lambda r: np.clip(r[..., 2] - r[..., 0], 0, None) *             np.clip(r[..., 3] - r[..., 1], 0, None)
        return inter / (area(a) + area(b) - inter + 1e-9)

    q_rows = det[0, : int(n[0])]
    matched = 0
    for r in det_ref[0, :n_ref]:
        if not len(q_rows):
            break
        ious = iou(r[:4], q_rows[:, :4])
        j = int(ious.argmax())
        if ious[j] > 0.5 and abs(q_rows[j, 4] - r[4]) < 0.1:
            matched += 1
    assert matched >= max(1, int(0.7 * n_ref)) or n_ref == 0,         f"only {matched}/{n_ref} reference survivors matched in int8 output"


def test_aot_export_fresh_process_roundtrip(model, tmp_path):
    """fmt=aot: serialized compiled executable loads in a FRESH process with
    zero trace / zero XLA compile and matches the native pipeline (VERDICT
    r4 missing #2). Runs in a single-device CPU subprocess: AOT artifacts
    target the serving topology (one process, one device), and the suite's
    forced-8-device mesh cannot execute a 1-device executable."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(f"""
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_cpu_max_isa=AVX2"
        sys.path.insert(0, {str(Path(__file__).resolve().parents[1])!r})
        os.chdir({str(tmp_path)!r})
        import numpy as np, jax, jax.numpy as jnp
        jax.config.update("jax_platforms", "cpu")
        from yolo_sod_tpu import YOLO
        from yolo_sod_tpu.cfg import DEFAULT_CFG_DICT, get_cfg
        from yolo_sod_tpu.engine.exporter import Exporter

        m = YOLO("yolov12n.yaml"); m.model.init(imgsz=64)
        args = get_cfg(DEFAULT_CFG_DICT, {{"imgsz": 64, "batch": 1,
                                           "half": False, "conf": 0.001,
                                           "mode": "export"}})
        path = Exporter(args=args)(model=m.model, fmt="aot")
        x = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
        from yolo_sod_tpu.ops.nms import non_max_suppression
        preds = m.model.predict(m.model.variables, jnp.asarray(x))
        det_ref, n_ref = non_max_suppression(preds, conf_thres=0.001,
                                             iou_thres=0.45, max_det=300)
        np.save("ref_det.npy", np.asarray(det_ref))
        np.save("ref_n.npy", np.asarray(n_ref))
        print("EXPORTED", path)
    """)
    out = subprocess.run([sys.executable, "-c", script], capture_output=True,
                         text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    artifact = [ln.split(" ", 1)[1] for ln in out.stdout.splitlines()
                if ln.startswith("EXPORTED")][0]

    load_script = textwrap.dedent(f"""
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_cpu_max_isa=AVX2"
        sys.path.insert(0, {str(Path(__file__).resolve().parents[1])!r})
        os.chdir({str(tmp_path)!r})
        import numpy as np
        from yolo_sod_tpu.nn.autobackend import AutoBackend
        b = AutoBackend({str(tmp_path)!r} + "/" + {Path(artifact).name!r})
        x = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
        det, n = b.forward(x)
        ref_det, ref_n = np.load("ref_det.npy"), np.load("ref_n.npy")
        np.testing.assert_allclose(det, ref_det, rtol=1e-4, atol=1e-4)
        assert int(n[0]) == int(ref_n[0]), (n, ref_n)
        print("AOT_OK")
    """)
    out2 = subprocess.run([sys.executable, "-c", load_script],
                          capture_output=True, text=True, timeout=900)
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "AOT_OK" in out2.stdout
