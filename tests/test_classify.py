"""Classification task tests: model build, tiny train run, accuracy eval."""

import shutil
from pathlib import Path

import numpy as np
import pytest

TMP = Path(__file__).parent / "tmp"


def make_cls_dataset(root: Path, n_per_class: int = 6, imgsz: int = 64):
    import cv2

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for ci, color in enumerate([(0, 0, 220), (0, 220, 0)]):
            d = root / split / f"class{ci}"
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n_per_class):
                img = rng.integers(0, 40, (imgsz, imgsz, 3), np.uint8)
                img[8:56, 8:56] = color
                cv2.imwrite(str(d / f"{i}.jpg"), img)
    return root


@pytest.fixture(scope="module")
def cls_root():
    root = TMP / "cls"
    if root.exists():
        shutil.rmtree(root)
    yield make_cls_dataset(root)
    shutil.rmtree(root, ignore_errors=True)


def test_classification_model_builds():
    import jax.numpy as jnp

    from yolo_sod_tpu.nn.tasks import ClassificationModel

    m = ClassificationModel("yolov12-cls.yaml", nc=2)
    m.init(imgsz=64)
    probs = m.predict(m.variables, jnp.zeros((1, 64, 64, 3)))
    assert probs.shape == (1, 2)
    assert abs(float(probs.sum()) - 1.0) < 1e-5


def test_classification_train_learns(cls_root):
    from yolo_sod_tpu.engine.classify import ClassificationTrainer
    from yolo_sod_tpu.nn.tasks import ClassificationModel

    model = ClassificationModel("yolov12-cls.yaml", nc=2)
    trainer = ClassificationTrainer(
        overrides={"data": str(cls_root), "epochs": 10, "batch": 4, "imgsz": 64,
                   "lr0": 0.01, "project": str(TMP / "runs"), "name": "cls",
                   "exist_ok": True, "amp": False},
        model=model)
    metrics = trainer.train()
    # trivially separable colors -> should classify well above chance
    assert metrics["metrics/accuracy_top1"] >= 0.75
