"""End-to-end segment / pose / obb training smoke tests.

The reference covers tasks via tiny-everything integration runs
(tests/test_engine.py: detect :28, segment :67, classify :106). Here each
task gets a generated dataset in its native label format, one short training
run through the real jitted SPMD step, the task validator, and a facade
predict round-trip.
"""

import shutil
from pathlib import Path

import numpy as np
import pytest

TMP = Path(__file__).parent / "tmp"


def _img(rng, imgsz):
    return rng.integers(0, 60, (imgsz, imgsz, 3), np.uint8)


def make_seg_dataset(root: Path, n_images: int = 6, imgsz: int = 96, seed: int = 0):
    import cv2

    rng = np.random.default_rng(seed)
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n_images):
            img = _img(rng, imgsz)
            rows = []
            for _ in range(int(rng.integers(1, 3))):
                c = int(rng.integers(0, 2))
                w, h = rng.uniform(0.25, 0.4, 2)
                cx = rng.uniform(w / 2, 1 - w / 2)
                cy = rng.uniform(h / 2, 1 - h / 2)
                x1, y1, x2, y2 = cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2
                cv2.rectangle(img, (int(x1 * imgsz), int(y1 * imgsz)),
                              (int(x2 * imgsz), int(y2 * imgsz)),
                              (0, 0, 220) if c == 0 else (0, 220, 0), -1)
                poly = f"{x1:.4f} {y1:.4f} {x2:.4f} {y1:.4f} {x2:.4f} {y2:.4f} {x1:.4f} {y2:.4f}"
                rows.append(f"{c} {poly}")
            cv2.imwrite(str(root / "images" / split / f"{i:03d}.jpg"), img)
            (root / "labels" / split / f"{i:03d}.txt").write_text("\n".join(rows))
    y = root / "data.yaml"
    y.write_text(f"path: {root}\ntrain: images/train\nval: images/val\n"
                 "names:\n  0: red\n  1: green\n")
    return y


def make_pose_dataset(root: Path, n_images: int = 6, imgsz: int = 96,
                      K: int = 4, seed: int = 0):
    import cv2

    rng = np.random.default_rng(seed)
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n_images):
            img = _img(rng, imgsz)
            rows = []
            for _ in range(int(rng.integers(1, 3))):
                w, h = rng.uniform(0.25, 0.4, 2)
                cx = rng.uniform(w / 2, 1 - w / 2)
                cy = rng.uniform(h / 2, 1 - h / 2)
                cv2.rectangle(img, (int((cx - w / 2) * imgsz), int((cy - h / 2) * imgsz)),
                              (int((cx + w / 2) * imgsz), int((cy + h / 2) * imgsz)),
                              (0, 0, 220), -1)
                # keypoints = box corners, all visible
                kx = [cx - w / 2, cx + w / 2, cx - w / 2, cx + w / 2]
                ky = [cy - h / 2, cy - h / 2, cy + h / 2, cy + h / 2]
                kp = " ".join(f"{x:.4f} {y:.4f} 2" for x, y in zip(kx, ky))
                rows.append(f"0 {cx:.4f} {cy:.4f} {w:.4f} {h:.4f} {kp}")
            cv2.imwrite(str(root / "images" / split / f"{i:03d}.jpg"), img)
            (root / "labels" / split / f"{i:03d}.txt").write_text("\n".join(rows))
    y = root / "data.yaml"
    y.write_text(f"path: {root}\ntrain: images/train\nval: images/val\n"
                 f"kpt_shape: [{K}, 3]\nflip_idx: [1, 0, 3, 2]\n"
                 "names:\n  0: person\n")
    return y


def make_obb_dataset(root: Path, n_images: int = 6, imgsz: int = 96, seed: int = 0):
    import cv2

    rng = np.random.default_rng(seed)
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n_images):
            img = _img(rng, imgsz)
            rows = []
            for _ in range(int(rng.integers(1, 3))):
                w, h = rng.uniform(0.2, 0.35), rng.uniform(0.1, 0.2)
                cx, cy = rng.uniform(0.3, 0.7, 2)
                ang = rng.uniform(-0.6, 0.6)
                ca, sa = np.cos(ang), np.sin(ang)
                corners = np.array([[-w / 2, -h / 2], [w / 2, -h / 2],
                                    [w / 2, h / 2], [-w / 2, h / 2]])
                rot = corners @ np.array([[ca, -sa], [sa, ca]]).T + [cx, cy]
                rot = np.clip(rot, 0.02, 0.98)
                cv2.fillPoly(img, [(rot * imgsz).astype(np.int32)], (0, 0, 220))
                rows.append("0 " + " ".join(f"{v:.4f}" for v in rot.ravel()))
            cv2.imwrite(str(root / "images" / split / f"{i:03d}.jpg"), img)
            (root / "labels" / split / f"{i:03d}.txt").write_text("\n".join(rows))
    y = root / "data.yaml"
    y.write_text(f"path: {root}\ntrain: images/train\nval: images/val\n"
                 "names:\n  0: vehicle\n")
    return y


@pytest.fixture(scope="module")
def seg_yaml():
    root = TMP / "synth_seg"
    shutil.rmtree(root, ignore_errors=True)
    yield make_seg_dataset(root)
    shutil.rmtree(root, ignore_errors=True)


@pytest.fixture(scope="module")
def pose_yaml():
    root = TMP / "synth_pose"
    shutil.rmtree(root, ignore_errors=True)
    yield make_pose_dataset(root)
    shutil.rmtree(root, ignore_errors=True)


@pytest.fixture(scope="module")
def obb_yaml():
    root = TMP / "synth_obb"
    shutil.rmtree(root, ignore_errors=True)
    yield make_obb_dataset(root)
    shutil.rmtree(root, ignore_errors=True)


COMMON = dict(epochs=1, batch=2, imgsz=64, optimizer="SGD", lr0=0.01,
              mosaic=0.0, mixup=0.0, copy_paste=0.0, warmup_epochs=0.0,
              val=True, plots=False, save=False, workers=0, close_mosaic=0,
              patience=100, nbs=2)


def test_pose_model_rebuilds_for_data_kpt_shape():
    """A dataset kpt_shape different from the model YAML's must rebuild the
    head (reference pose/train.py get_model: data_kpt_shape override)."""
    from yolo_sod_tpu.nn.tasks import PoseModel

    cfg = {"nc": 1, "scale": "n", "scales": {"n": [0.5, 0.25, 1024]},
           "backbone": [[-1, 1, "Conv", [64, 3, 2]],
                        [-1, 1, "Conv", [128, 3, 2]]],
           "head": [[[1], 1, "Pose", ["nc", [17, 3]]]]}
    m = PoseModel(cfg, data_kpt_shape=(4, 3))
    assert tuple(m.kpt_shape) == (4, 3)
    m2 = PoseModel({**cfg, "head": [[[1], 1, "Pose", ["nc", [17, 3]]]]})
    assert tuple(m2.kpt_shape) == (17, 3)


def test_pose_dataset_loading(pose_yaml):
    from yolo_sod_tpu.data import build_dataloader, build_yolo_dataset, check_det_dataset

    data = check_det_dataset(pose_yaml)
    assert tuple(data["kpt_shape"]) == (4, 3)
    ds = build_yolo_dataset({"imgsz": 64, "fliplr": 0.5, "mosaic": 0.5,
                             "translate": 0.1, "scale": 0.5},
                            data["train"], 2, data, mode="train", task="pose")
    item = ds[0]
    assert "keypoints" in item and item["keypoints"].shape[1:] == (4, 3)
    assert len(item["keypoints"]) == len(item["labels"])
    batch = next(iter(build_dataloader(ds, 2, shuffle=False)))
    assert batch["keypoints"].shape == (2, ds.max_boxes(), 4, 3)
    # visible keypoints stay inside the unit square
    vis = batch["keypoints"][..., 2] > 0
    assert (batch["keypoints"][..., 0][vis] <= 1.001).all()
    assert (batch["keypoints"][..., 1][vis] <= 1.001).all()


def test_obb_dataset_loading(obb_yaml):
    from yolo_sod_tpu.data import build_dataloader, build_yolo_dataset, check_det_dataset

    data = check_det_dataset(obb_yaml)
    ds = build_yolo_dataset({"imgsz": 64, "fliplr": 0.5, "mosaic": 0.0,
                             "translate": 0.1, "scale": 0.5},
                            data["train"], 2, data, mode="train", task="obb")
    item = ds[0]
    assert "angles" in item and len(item["angles"]) == len(item["labels"])
    batch = next(iter(build_dataloader(ds, 2, shuffle=False)))
    assert batch["angles"].shape == (2, ds.max_boxes())
    m = batch["mask_gt"] > 0
    # angles regularized to [-pi/4, 3pi/4)
    assert (batch["angles"][m] >= -np.pi / 4 - 1e-5).all()
    assert (batch["angles"][m] < 3 * np.pi / 4 + 1e-5).all()


def test_segment_train_and_val(seg_yaml):
    from yolo_sod_tpu.engine.trainer_tasks import SegmentationTrainer
    from yolo_sod_tpu.nn.tasks import SegmentationModel

    model = SegmentationModel("yolov12n-seg.yaml", nc=2)
    trainer = SegmentationTrainer(
        overrides={"data": str(seg_yaml), "project": str(TMP / "runs"),
                   "name": "seg_smoke", "exist_ok": True, **COMMON},
        model=model)
    trainer.train()
    assert trainer.tloss is not None and np.isfinite(trainer.tloss).all()
    assert len(trainer.tloss) == 4          # box, seg, cls, dfl
    assert trainer.metrics is not None
    assert "metrics/mAP50-95(M)" in trainer.metrics.keys


def test_pose_train_and_val(pose_yaml):
    from yolo_sod_tpu.engine.trainer_tasks import PoseTrainer
    from yolo_sod_tpu.nn.tasks import PoseModel

    model = PoseModel({"nc": 1, "scale": "n",
                       "scales": {"n": [0.5, 0.25, 1024]},
                       "backbone": [[-1, 1, "Conv", [64, 3, 2]],
                                    [-1, 1, "Conv", [128, 3, 2]],
                                    [-1, 1, "C3k2", [256, False, 0.25]],
                                    [-1, 1, "Conv", [256, 3, 2]],
                                    [-1, 1, "C3k2", [512, False, 0.25]],
                                    [-1, 1, "Conv", [512, 3, 2]]],
                       "head": [[[3, 5], 1, "Pose", ["nc", [4, 3]]]]})
    trainer = PoseTrainer(
        overrides={"data": str(pose_yaml), "project": str(TMP / "runs"),
                   "name": "pose_smoke", "exist_ok": True, **COMMON},
        model=model)
    trainer.train()
    assert trainer.tloss is not None and np.isfinite(trainer.tloss).all()
    assert len(trainer.tloss) == 5          # box, pose, kobj, cls, dfl
    assert trainer.metrics is not None
    assert "metrics/mAP50-95(P)" in trainer.metrics.keys


def test_obb_train_and_val(obb_yaml):
    from yolo_sod_tpu.engine.trainer_tasks import OBBTrainer
    from yolo_sod_tpu.nn.tasks import OBBModel

    model = OBBModel({"nc": 1, "scale": "n",
                      "scales": {"n": [0.5, 0.25, 1024]},
                      "backbone": [[-1, 1, "Conv", [64, 3, 2]],
                                   [-1, 1, "Conv", [128, 3, 2]],
                                   [-1, 1, "C3k2", [256, False, 0.25]],
                                   [-1, 1, "Conv", [256, 3, 2]],
                                   [-1, 1, "C3k2", [512, False, 0.25]],
                                   [-1, 1, "Conv", [512, 3, 2]]],
                      "head": [[[3, 5], 1, "OBB", ["nc", 1]]]})
    trainer = OBBTrainer(
        overrides={"data": str(obb_yaml), "project": str(TMP / "runs"),
                   "name": "obb_smoke", "exist_ok": True, **COMMON},
        model=model)
    trainer.train()
    assert trainer.tloss is not None and np.isfinite(trainer.tloss).all()
    assert len(trainer.tloss) == 3          # box, cls, dfl (probiou box)
    assert trainer.metrics is not None


def test_facade_task_routing():
    """Model() infers the task from the YAML head and routes predictors."""
    from yolo_sod_tpu.engine.model import Model
    from yolo_sod_tpu.nn.tasks import guess_model_task

    assert guess_model_task("yolov12n-seg.yaml") == "segment"
    assert guess_model_task("yolov12n-pose.yaml") == "pose"
    assert guess_model_task("yolov12n-obb.yaml") == "obb"
    assert guess_model_task("yolov12-cls.yaml") == "classify"
    assert guess_model_task("yolov12n.yaml") == "detect"

    m = Model("yolov12n-seg.yaml")
    assert m.task == "segment"
    assert m.task_map["segment"]["predictor"].__name__ == "SegmentationPredictor"


def test_classify_predict_probs():
    """Classify predict returns probs, never detection boxes (VERDICT Weak #3)."""
    from yolo_sod_tpu.engine.model import Model

    m = Model("yolov12-cls.yaml", task="classify")
    m.model.nc = m.model.graph.nc
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8)
    res = m.predict(img, imgsz=64)
    assert len(res) == 1
    assert res[0].probs is not None
    assert res[0].probs.data.shape[-1] == m.model.nc
    assert abs(float(res[0].probs.data.sum()) - 1.0) < 1e-3
    assert res[0].probs.top1 in range(m.model.nc)


def test_segment_predict_masks(seg_yaml):
    from yolo_sod_tpu.engine.model import Model

    m = Model("yolov12n-seg.yaml")
    m.model.init(imgsz=64)
    img = np.random.default_rng(0).integers(0, 255, (80, 96, 3), np.uint8)
    res = m.predict(img, imgsz=64, conf=0.0001)
    assert len(res) == 1
    assert res[0].masks is not None
    assert len(res[0].masks) == len(res[0].boxes)
