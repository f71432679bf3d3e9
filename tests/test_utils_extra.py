"""Tests: instance algebra, plotting, autobatch analysis, KF-LSTM tracker,
COCO json output."""

from pathlib import Path

import numpy as np
import pytest

TMP = Path(__file__).parent / "tmp"


def test_bboxes_roundtrip_and_area():
    from yolo_sod_tpu.utils.instance import Bboxes

    b = Bboxes(np.array([[10.0, 10, 30, 50]]), "xyxy")
    assert np.allclose(b.areas(), [800.0])
    b.convert("xywh")
    assert np.allclose(b.bboxes, [[20, 30, 20, 40]])
    b.convert("ltwh")
    assert np.allclose(b.bboxes, [[10, 10, 20, 40]])
    b.convert("xyxy")
    assert np.allclose(b.bboxes, [[10, 10, 30, 50]])


def test_instances_flip_scale_clip():
    from yolo_sod_tpu.utils.instance import Instances

    inst = Instances(np.array([[0.5, 0.5, 0.2, 0.2]]), bbox_format="xywh",
                     normalized=True)
    inst.denormalize(100, 100)
    assert np.allclose(inst.bboxes, [[50, 50, 20, 20]])
    inst.fliplr(100)
    assert np.allclose(inst.bboxes, [[50, 50, 20, 20]])  # centered box is symmetric
    inst.convert_bbox("xyxy")
    inst.clip(45, 100)
    assert inst.bboxes[:, 2].max() <= 45


def test_plot_images_and_results(tmp_path):
    from yolo_sod_tpu.utils.plotting import plot_images, plot_results

    batch = {
        "img": np.random.rand(4, 32, 32, 3).astype(np.float32),
        "cls": np.zeros((4, 2), np.float32),
        "bboxes": np.tile(np.array([0.5, 0.5, 0.4, 0.4], np.float32), (4, 2, 1)),
        "mask_gt": np.ones((4, 2), np.float32),
    }
    out = plot_images(batch, fname=str(tmp_path / "batch.jpg"))
    assert Path(out).exists()

    csv = tmp_path / "results.csv"
    csv.write_text("epoch,train/box_loss,fitness\n1,2.0,0.1\n2,1.5,0.2\n")
    plot_results(csv)  # may be None without matplotlib; must not raise


def test_autobatch_analysis():
    from yolo_sod_tpu.nn.tasks import DetectionModel
    from yolo_sod_tpu.utils.autobatch import check_train_batch_size, device_memory_bytes

    assert device_memory_bytes() > 1e9
    m = DetectionModel("yolov12n.yaml", nc=2)
    m.init(imgsz=64)
    b = check_train_batch_size(m, imgsz=64, max_boxes=8, candidates=(2, 4))
    assert b in (2, 4)


def test_kf_lstm_tracker_ids_persist():
    from yolo_sod_tpu.trackers.kf_lstm import MultiObjectTracker

    trk = MultiObjectTracker(min_hits=1, use_lstm=True)
    ids = []
    for f in range(6):
        boxes = np.array([[50 + 3 * f, 50, 20, 20], [150, 90 + 2 * f, 30, 30]],
                         np.float32)
        out = trk.update(boxes, np.array([0.9, 0.8]), np.array([0, 1]))
        assert out.shape[1] == 7
        ids.append(set(out[:, 4].astype(int)))
    assert ids[-1] == ids[1] and len(ids[-1]) == 2


def test_validator_pred_to_json(tmp_path):
    from yolo_sod_tpu.engine.validator import DetectionValidator

    v = DetectionValidator.__new__(DetectionValidator)
    v.jdict = []
    v.save_dir = tmp_path
    det = np.array([[10, 10, 30, 40, 0.9, 2.0]], np.float32)
    v.pred_to_json(det, "img_000123.jpg", (1.0, (0.0, 0.0)), (64, 64))
    assert v.jdict[0]["category_id"] == 2
    assert v.jdict[0]["bbox"] == [10.0, 10.0, 20.0, 30.0]
    p = v.save_json_file()
    assert Path(p).exists()


class TestChecks:
    """utils/checks.py (reference utils/checks.py behaviors)."""

    def test_check_imgsz_rounds_to_stride(self):
        from yolo_sod_tpu.utils.checks import check_imgsz

        assert check_imgsz(640, stride=32) == 640
        assert check_imgsz(100, stride=32) == 128
        assert check_imgsz([100, 60], stride=32) == [128, 64]
        assert check_imgsz(640, stride=32, min_dim=2) == [640, 640]

    def test_check_version_constraints(self):
        from yolo_sod_tpu.utils.checks import check_version

        assert check_version("1.2.3", ">=1.0.0")
        assert not check_version("1.2.3", ">=2.0.0")
        assert check_version("1.2.3", ">1.2.2,<2.0.0")
        assert check_version("1.2.3", "==1.2.3")
        import pytest as _pytest

        with _pytest.raises(ModuleNotFoundError):
            check_version("1.0.0", ">=9.0.0", hard=True)

    def test_check_suffix_and_file(self, tmp_path):
        import pytest as _pytest

        from yolo_sod_tpu.utils.checks import check_file, check_suffix

        check_suffix("a.ckpt", (".ckpt",))
        with _pytest.raises(ValueError):
            check_suffix("a.onnx", (".ckpt",))
        p = tmp_path / "x.yaml"
        p.write_text("a: 1")
        assert check_file(str(p)) == str(p)
        # recursive search under the package tree finds bundled configs
        found = check_file("default.yaml")
        assert found and found.endswith("default.yaml")
        assert check_file("definitely_missing_zz.yaml", hard=False) is None
        with _pytest.raises(FileNotFoundError):
            check_file("definitely_missing_zz.yaml")

    def test_path_safety(self, tmp_path):
        from yolo_sod_tpu.utils.checks import check_is_path_safe

        assert check_is_path_safe(tmp_path, tmp_path / "a" / "b")
        assert not check_is_path_safe(tmp_path, tmp_path / ".." / "evil")

    def test_env_probes(self):
        from yolo_sod_tpu.utils.checks import (check_jax, check_python,
                                               check_yolo,
                                               collect_system_info)

        assert check_python("3.8.0")
        info = collect_system_info()
        assert info["jax"] and info["python"]
        assert "yolo-sod-tpu" in check_yolo(verbose=False)
        check_jax(minimum="0.4.0")
