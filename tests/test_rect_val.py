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


# ---- aux-task rect val (VERDICT r2 item 5): masks/kpts/rboxes must ride the
# same aspect-bucket letterbox pipeline as detect ---------------------------

def _mixed_sizes():
    return [(96, 48), (48, 96), (96, 96), (96, 64), (90, 46)]


@pytest.fixture(scope="module")
def mixed_task_roots():
    import cv2

    rng = np.random.default_rng(0)
    roots = {}
    for task in ("segment", "pose", "obb"):
        root = TMP / f"synth_rect_{task}"
        shutil.rmtree(root, ignore_errors=True)
        for split in ("train", "val"):
            (root / "images" / split).mkdir(parents=True)
            (root / "labels" / split).mkdir(parents=True)
            for i, (h, w) in enumerate(_mixed_sizes()):
                img = rng.integers(0, 60, (h, w, 3), np.uint8)
                cx, cy, bw, bh = 0.5, 0.5, 0.4, 0.4
                x1, y1, x2, y2 = cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2
                cv2.rectangle(img, (int(x1 * w), int(y1 * h)),
                              (int(x2 * w), int(y2 * h)), (0, 0, 220), -1)
                cv2.imwrite(str(root / "images" / split / f"{i}.jpg"), img)
                if task == "segment":
                    row = (f"0 {x1} {y1} {x2} {y1} {x2} {y2} {x1} {y2}")
                elif task == "pose":
                    kp = f"{x1} {y1} 2 {x2} {y1} 2 {x1} {y2} 2 {x2} {y2} 2"
                    row = f"0 {cx} {cy} {bw} {bh} {kp}"
                else:  # obb: axis-aligned rotated rect corners
                    row = f"0 {x1} {y1} {x2} {y1} {x2} {y2} {x1} {y2}"
                (root / "labels" / split / f"{i}.txt").write_text(row)
        y = root / "data.yaml"
        extra = "kpt_shape: [4, 3]\nflip_idx: [1, 0, 3, 2]\n" if task == "pose" else ""
        y.write_text(f"path: {root}\ntrain: images/train\nval: images/val\n"
                     f"{extra}names:\n  0: box\n")
        roots[task] = y
    yield roots
    for task in roots:
        shutil.rmtree(TMP / f"synth_rect_{task}", ignore_errors=True)


@pytest.mark.parametrize("task", ["segment", "pose", "obb"])
def test_aux_task_rect_dataset_shapes(task, mixed_task_roots):
    """Rect buckets must apply to aux tasks, and masks must rasterize on the
    letterboxed (non-square) canvas."""
    from yolo_sod_tpu.data import build_yolo_dataset, check_det_dataset

    data = check_det_dataset(mixed_task_roots[task])
    ds = build_yolo_dataset({"imgsz": 128, "rect": True}, data["val"], 2, data,
                            mode="val", task=task)
    assert ds.rect_shapes is not None, f"{task}: rect disabled"
    shapes = set(map(tuple, ds.rect_shapes))
    assert (128, 64) in shapes and (64, 128) in shapes
    i_tall = next(i for i, s in enumerate(ds.rect_shapes) if s == (128, 64))
    item = ds[i_tall]
    assert item["img"].shape[:2] == (128, 64)
    if task == "segment":
        assert item["masks"].shape[1:] == (128 // 4, 64 // 4)
        assert item["masks"].sum() > 0
    elif task == "pose":
        k = item["keypoints"]
        assert k.shape[-2:] == (4, 3) and np.isfinite(k).all()
        assert (k[..., :2] >= 0).all() and (k[..., :2] <= 1).all()
    else:
        assert "angles" in item and np.isfinite(item["angles"]).all()


@pytest.mark.parametrize("task", ["segment", "pose", "obb"])
def test_aux_task_rect_val_end_to_end(task, mixed_task_roots):
    from yolo_sod_tpu.cfg import DEFAULT_CFG_DICT, get_cfg
    from yolo_sod_tpu.engine.validator_tasks import (OBBValidator,
                                                     PoseValidator,
                                                     SegmentationValidator)
    from yolo_sod_tpu.nn.tasks import OBBModel, PoseModel, SegmentationModel

    backbone = [[-1, 1, "Conv", [64, 3, 2]],
                [-1, 1, "Conv", [128, 3, 2]],
                [-1, 1, "C3k2", [256, False, 0.25]],
                [-1, 1, "Conv", [256, 3, 2]],
                [-1, 1, "C3k2", [512, False, 0.25]],
                [-1, 1, "Conv", [512, 3, 2]]]
    base = {"nc": 1, "scale": "n", "scales": {"n": [0.5, 0.25, 1024]},
            "backbone": backbone}
    cls = {"segment": SegmentationValidator, "pose": PoseValidator,
           "obb": OBBValidator}[task]
    if task == "segment":
        model = SegmentationModel(
            {**base, "head": [[[3, 5], 1, "Segment", ["nc", 8, 32]]]})
    elif task == "pose":
        model = PoseModel(
            {**base, "head": [[[3, 5], 1, "Pose", ["nc", [4, 3]]]]})
    else:
        model = OBBModel({**base, "head": [[[3, 5], 1, "OBB", ["nc", 1]]]})
    model.init(imgsz=64)
    vargs = get_cfg(DEFAULT_CFG_DICT, {"data": str(mixed_task_roots[task]),
                                       "imgsz": 64, "batch": 2, "conf": 0.001,
                                       "iou": 0.7, "mode": "val",
                                       "plots": False, "verbose": False})
    metrics = cls(args=vargs)(model=model)
    assert np.isfinite(metrics.mean_results()).all()
