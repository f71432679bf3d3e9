"""Rect (aspect-grouped) val batching: bucketed letterbox shapes, grouped
batches, and validator correctness on mixed-aspect images
(reference detect/val.py rect path; VERDICT Missing #6)."""

import shutil
from pathlib import Path

import numpy as np
import pytest

TMP = Path(__file__).parent / "tmp"


@pytest.fixture(scope="module")
def mixed_aspect_yaml():
    import cv2

    root = TMP / "synth_rect"
    shutil.rmtree(root, ignore_errors=True)
    rng = np.random.default_rng(0)
    sizes = [(96, 48), (48, 96), (96, 96), (96, 64), (90, 46)]
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i, (h, w) in enumerate(sizes):
            img = rng.integers(0, 60, (h, w, 3), np.uint8)
            bw, bh = 0.4, 0.4
            cx = cy = 0.5
            cv2.rectangle(img, (int((cx - bw / 2) * w), int((cy - bh / 2) * h)),
                          (int((cx + bw / 2) * w), int((cy + bh / 2) * h)),
                          (0, 0, 220), -1)
            cv2.imwrite(str(root / "images" / split / f"{i}.jpg"), img)
            (root / "labels" / split / f"{i}.txt").write_text(
                f"0 {cx} {cy} {bw} {bh}")
    y = root / "data.yaml"
    y.write_text(f"path: {root}\ntrain: images/train\nval: images/val\n"
                 "names:\n  0: box\n")
    yield y
    shutil.rmtree(root, ignore_errors=True)


def test_rect_shapes_bucketed(mixed_aspect_yaml):
    from yolo_sod_tpu.data import build_yolo_dataset, check_det_dataset

    data = check_det_dataset(mixed_aspect_yaml)
    ds = build_yolo_dataset({"imgsz": 128, "rect": True}, data["val"], 2, data,
                            mode="val")
    assert ds.rect_shapes is not None
    shapes = set(map(tuple, ds.rect_shapes))
    # 2:1 tall, 2:1 wide, square, ~1.5:1 tall all quantize to stride buckets
    assert all(h % 64 == 0 and w % 64 == 0 for h, w in shapes)
    assert (128, 64) in shapes and (64, 128) in shapes and (128, 128) in shapes
    # tall image letterboxes to its tall bucket
    i_tall = next(i for i, s in enumerate(ds.rect_shapes) if s == (128, 64))
    item = ds[i_tall]
    assert item["img"].shape[:2] == (128, 64)


def test_rect_loader_groups_batches(mixed_aspect_yaml):
    from yolo_sod_tpu.data import build_dataloader, build_yolo_dataset, check_det_dataset

    data = check_det_dataset(mixed_aspect_yaml)
    ds = build_yolo_dataset({"imgsz": 128}, data["val"], 2, data, mode="val")
    dl = build_dataloader(ds, 2, shuffle=False)
    n_images = 0
    for batch in dl:
        files = set(batch["im_file"])
        tgt = {tuple(ds.rect_shapes[ds.im_files.index(f)]) for f in files}
        assert len(tgt) == 1, "mixed shape buckets inside one batch"
        assert batch["img"].shape[1:3] == next(iter(tgt))
        n_images += batch["img"].shape[0]
    assert n_images == len(ds)   # every image consumed exactly once


def test_rect_val_end_to_end(mixed_aspect_yaml):
    from yolo_sod_tpu.cfg import DEFAULT_CFG_DICT, get_cfg
    from yolo_sod_tpu.engine.validator import DetectionValidator
    from yolo_sod_tpu.nn.tasks import DetectionModel

    model = DetectionModel("yolov12n.yaml", nc=1)
    model.init(imgsz=64)
    vargs = get_cfg(DEFAULT_CFG_DICT, {"data": str(mixed_aspect_yaml),
                                       "imgsz": 64, "batch": 2, "conf": 0.001,
                                       "iou": 0.7, "mode": "val",
                                       "plots": False, "verbose": False})
    metrics = DetectionValidator(args=vargs)(model=model)
    # untrained model: metrics near zero but finite, and the run must cover
    # every image across the shape buckets
    assert np.isfinite(metrics.mean_results()).all()
