"""End-to-end training smoke tests on a tiny synthetic dataset.

Mirrors the reference's tiny-everything doctrine (SURVEY.md §4: coco8,
imgsz=32, 1-2 epochs) with a generated dataset: colored rectangles on noise,
YOLO-layout images/ + labels/ trees.
"""

import shutil
from pathlib import Path

import numpy as np
import pytest

TMP = Path(__file__).parent / "tmp"


def make_synthetic_dataset(root: Path, n_images: int = 8, imgsz: int = 96,
                           nc: int = 2, seed: int = 0) -> Path:
    """Write a tiny dataset; returns the dataset yaml path."""
    import cv2

    rng = np.random.default_rng(seed)
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n_images):
            img = rng.integers(0, 60, (imgsz, imgsz, 3), np.uint8)
            rows = []
            for _ in range(int(rng.integers(1, 4))):
                c = int(rng.integers(0, nc))
                w, h = rng.uniform(0.2, 0.4, 2)
                cx = rng.uniform(w / 2, 1 - w / 2)
                cy = rng.uniform(h / 2, 1 - h / 2)
                x1, y1 = int((cx - w / 2) * imgsz), int((cy - h / 2) * imgsz)
                x2, y2 = int((cx + w / 2) * imgsz), int((cy + h / 2) * imgsz)
                color = (0, 0, 220) if c == 0 else (0, 220, 0)
                cv2.rectangle(img, (x1, y1), (x2, y2), color, -1)
                rows.append(f"{c} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}")
            cv2.imwrite(str(root / "images" / split / f"{i:03d}.jpg"), img)
            (root / "labels" / split / f"{i:03d}.txt").write_text("\n".join(rows))
    yaml_path = root / "data.yaml"
    yaml_path.write_text(
        f"path: {root}\ntrain: images/train\nval: images/val\n"
        f"names:\n  0: red\n  1: green\n")
    return yaml_path


@pytest.fixture(scope="module")
def dataset_yaml():
    root = TMP / "synth"
    if root.exists():
        shutil.rmtree(root)
    yield make_synthetic_dataset(root)
    shutil.rmtree(root, ignore_errors=True)


def test_dataset_and_loader(dataset_yaml):
    from yolo_sod_tpu.data import YOLODataset, build_dataloader, check_det_dataset

    data = check_det_dataset(dataset_yaml)
    assert data["nc"] == 2
    ds = YOLODataset(data["train"], imgsz=64, augment=True,
                     hyp={"mosaic": 1.0, "fliplr": 0.5, "hsv_h": 0.015,
                          "hsv_s": 0.7, "hsv_v": 0.4, "translate": 0.1,
                          "scale": 0.5, "mixup": 0.2, "copy_paste": 0.1},
                     nc=2)
    item = ds[0]
    assert item["img"].shape == (64, 64, 3)
    assert item["labels"].ndim == 2 and item["labels"].shape[1] == 5

    dl = build_dataloader(ds, batch=4, shuffle=True)
    batch = next(iter(dl))
    assert batch["img"].shape == (4, 64, 64, 3)
    # uint8 transfer contract: normalized to [0,1] on-device
    # (ops/numerics.image_to_compute), 4x fewer host->device bytes.
    assert batch["img"].dtype == np.uint8
    M = dl.max_boxes
    assert batch["cls"].shape == (4, M)
    assert batch["bboxes"].shape == (4, M, 4)
    assert batch["mask_gt"].sum() > 0
    # mosaic close zeroes the probabilities
    ds.close_mosaic()
    assert ds.hyp["mosaic"] == 0.0


def test_train_loop_loss_decreases(dataset_yaml):
    from yolo_sod_tpu.engine.trainer import DetectionTrainer
    from yolo_sod_tpu.nn.tasks import DetectionModel

    model = DetectionModel("yolov12n.yaml", nc=2)
    trainer = DetectionTrainer(
        overrides={"data": str(dataset_yaml), "epochs": 2, "batch": 4,
                   "imgsz": 64, "optimizer": "SGD", "lr0": 0.01,
                   "mosaic": 0.0, "mixup": 0.0, "copy_paste": 0.0,
                   "warmup_epochs": 0.0, "val": True, "plots": False,
                   "save": True, "project": str(TMP / "runs"),
                   "name": "smoke", "exist_ok": True, "workers": 0,
                   "close_mosaic": 0, "patience": 100, "nbs": 4},
        model=model)
    trainer.train()
    assert trainer.tloss is not None and np.isfinite(trainer.tloss).all()
    assert trainer.last.exists()
    assert (trainer.save_dir / "results.csv").exists()
    assert trainer.metrics is not None


def test_resume(dataset_yaml):
    from yolo_sod_tpu.engine.trainer import DetectionTrainer
    from yolo_sod_tpu.nn.tasks import DetectionModel

    last = TMP / "runs" / "smoke" / "weights" / "last.ckpt"
    assert last.exists(), "run test_train_loop first"
    model = DetectionModel("yolov12n.yaml", nc=2)
    trainer = DetectionTrainer(
        overrides={"data": str(dataset_yaml), "epochs": 3, "batch": 4,
                   "imgsz": 64, "optimizer": "SGD", "lr0": 0.01,
                   "warmup_epochs": 0.0, "val": False, "save": False,
                   "mosaic": 0.0, "project": str(TMP / "runs"),
                   "name": "smoke", "exist_ok": True, "close_mosaic": 0,
                   "resume": str(last)},
        model=model)
    trainer._setup_train()
    assert trainer.start_epoch == 2


def test_freeze_layers(dataset_yaml):
    """Frozen backbone layers must not move; unfrozen layers must."""
    import jax

    from yolo_sod_tpu.engine.trainer import DetectionTrainer
    from yolo_sod_tpu.nn.tasks import DetectionModel

    model = DetectionModel("yolov12n.yaml", nc=2)
    model.init(imgsz=64)
    before = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), model.variables["params"])
    trainer = DetectionTrainer(
        overrides={"data": str(dataset_yaml), "epochs": 1, "batch": 4,
                   "imgsz": 64, "optimizer": "SGD", "lr0": 0.05, "nbs": 4,
                   "warmup_epochs": 0.0, "val": False, "save": False,
                   "mosaic": 0.0, "project": str(TMP / "runs"),
                   "name": "freeze", "exist_ok": True, "close_mosaic": 0,
                   "freeze": 2},
        model=model)
    trainer.train()
    after = jax.device_get(trainer.state.params)
    assert np.allclose(before["model_0"]["conv"]["kernel"],
                       after["model_0"]["conv"]["kernel"]), \
        "frozen layer parameters changed"
    last_key = sorted(after)[-1]
    moved = not np.allclose(
        np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(before[last_key])]),
        np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(after[last_key])]))
    assert moved, "unfrozen parameters did not update"


@pytest.mark.skipif("not config.getoption('--slow', default=False)",
                    reason="long convergence run; pass --slow")
def test_convergence_to_high_map(dataset_yaml):
    """Full-stack convergence: 300 epochs on the synthetic set must reach
    high mAP (measured 0.907 mAP50 / 0.739 mAP50-95 on a real TPU v5e with
    the flagship model at 320px; this CI variant uses yolov12n at 64px)."""
    from yolo_sod_tpu.cfg import DEFAULT_CFG_DICT, get_cfg
    from yolo_sod_tpu.engine.trainer import DetectionTrainer
    from yolo_sod_tpu.engine.validator import DetectionValidator
    from yolo_sod_tpu.nn.tasks import DetectionModel

    model = DetectionModel("yolov12n.yaml", nc=2)
    trainer = DetectionTrainer(
        overrides={"data": str(dataset_yaml), "epochs": 300, "batch": 8,
                   "imgsz": 64, "optimizer": "SGD", "lr0": 0.01, "nbs": 8,
                   "warmup_epochs": 0.0, "val": False, "save": False,
                   "mosaic": 0.0, "project": str(TMP / "runs"),
                   "name": "conv", "exist_ok": True, "close_mosaic": 0,
                   "patience": 1000},
        model=model)
    trainer.train()
    vargs = get_cfg(DEFAULT_CFG_DICT, {"data": str(dataset_yaml), "imgsz": 64,
                                       "batch": 8, "conf": 0.001, "iou": 0.7,
                                       "mode": "val", "plots": False,
                                       "verbose": False})
    metrics = DetectionValidator(args=vargs)(model=trainer.model,
                                             variables=trainer._ema_variables())
    assert metrics.box.map50 > 0.5


def test_mixed_precision_master_weights():
    """With compute_dtype=bf16 the forward consumes bf16 params but the
    optimizer state and updated params stay f32 masters, and the step
    produces finite f32 grads (the silent-f32-promotion regression guard)."""
    import jax
    import jax.numpy as jnp

    from yolo_sod_tpu.engine.train_step import (build_optimizer,
                                                init_train_state,
                                                make_train_step)
    from yolo_sod_tpu.nn.tasks import DetectionModel
    from yolo_sod_tpu.utils.loss import DetectionLoss

    model = DetectionModel("yolov12n.yaml", nc=3)
    model.init(imgsz=64)
    criterion = DetectionLoss(nc=3, strides=model.graph.detect_strides)
    tx = build_optimizer(model.variables["params"], name="SGD", lr=0.01, nc=3)
    state = init_train_state(model, tx)
    step = make_train_step(model, criterion, tx, compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    B, M = 2, 4
    batch = {
        "img": jnp.asarray(rng.random((B, 64, 64, 3), np.float32)),
        "cls": jnp.asarray(rng.integers(0, 3, (B, M)), jnp.float32),
        "bboxes": jnp.asarray(
            np.clip(rng.random((B, M, 4)), 0.2, 0.8), jnp.float32),
        "mask_gt": jnp.ones((B, M), jnp.float32),
    }
    state, out = step(state, batch)
    assert np.isfinite(float(out["loss"]))
    # master params remain f32 and moved from init
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(l.dtype == jnp.float32 for l in leaves if l.dtype.kind == "f")
    assert int(state.step) == 1


def test_loader_batch_decode_amortization(dataset_yaml):
    """Mosaic/mixup partners come from the current batch and share a decode
    memo (the reference's recently-loaded buffer sampling): decodes per
    batch stay near batch_size instead of ~4x it."""
    import yolo_sod_tpu.data.dataset as dsm
    from yolo_sod_tpu.data.build import build_dataloader
    from yolo_sod_tpu.data.dataset import YOLODataset
    from yolo_sod_tpu.data.utils import check_det_dataset

    info = check_det_dataset(str(dataset_yaml))
    ds = YOLODataset(info["train"], imgsz=96,
                     hyp={"mosaic": 1.0, "mixup": 0.5}, nc=info["nc"])
    counts = {"n": 0}
    orig = dsm.cv2.imread

    def counting(path, *a):
        counts["n"] += 1
        return orig(path, *a)

    dsm.cv2.imread = counting
    try:
        dl = build_dataloader(ds, batch=4, shuffle=True, seed=0, workers=1)
        next(iter(dl))
    finally:
        dsm.cv2.imread = orig
    # 4 primaries + batch-local partners (memo'd): far below the unamortized
    # 4 x 4(mosaic) + mixup's extra mosaic worst case (~24).
    assert counts["n"] <= 8, counts["n"]


def test_loader_determinism_with_batch_context(dataset_yaml):
    """Same seed + epoch -> identical batches, with partners/memo active."""
    from yolo_sod_tpu.data.build import build_dataloader
    from yolo_sod_tpu.data.dataset import YOLODataset
    from yolo_sod_tpu.data.utils import check_det_dataset

    info = check_det_dataset(str(dataset_yaml))

    def first_batch():
        ds = YOLODataset(info["train"], imgsz=96,
                         hyp={"mosaic": 1.0, "mixup": 0.5}, nc=info["nc"])
        return next(iter(build_dataloader(ds, batch=4, shuffle=True, seed=3)))

    a, b = first_batch(), first_batch()
    assert np.array_equal(a["img"], b["img"])
    assert np.array_equal(a["bboxes"], b["bboxes"])


def test_workers_knob_reaches_loader(dataset_yaml):
    """The cfg 'workers' knob must control the loader thread pool, and an
    explicit workers=0 must mean minimal threading, not the host default
    (regression: no caller forwarded args.workers and the loader treated 0
    as unset)."""
    from yolo_sod_tpu.data import build_dataloader, check_det_dataset
    from yolo_sod_tpu.data.build import DataLoader
    from yolo_sod_tpu.data.dataset import YOLODataset

    data = check_det_dataset(dataset_yaml)
    ds = YOLODataset(data["train"], imgsz=64, hyp={"mosaic": 0.0},
                 nc=data["nc"], names=data["names"])
    assert build_dataloader(ds, 2, workers=0).workers == 1
    assert build_dataloader(ds, 2, workers=3).workers == 3
    assert DataLoader(ds, 2, workers=None).workers >= 1   # host default

    from yolo_sod_tpu.engine.trainer import DetectionTrainer

    tr = DetectionTrainer(overrides=dict(
        model="E1.yaml", data=str(dataset_yaml), epochs=1, imgsz=64, batch=2,
        val=False, plots=False, save=False, workers=2, mosaic=0.0,
        warmup_epochs=0))
    tr._setup_train()
    assert tr.train_loader.workers == 2


def test_getitem_labels_align_with_canvas(tmp_path):
    """Labels must live in the LETTERBOXED canvas frame for any source
    resolution (round-4 regression: load_image pre-resizes to imgsz, and
    scaling labels by ori_shape instead put GT in original pixels — 1.5x
    off at 96->64, capping trainable mAP at ~0.1). Checks pixel content:
    the label box must cover the drawn rectangle on the canvas."""
    import cv2

    from yolo_sod_tpu.data.dataset import YOLODataset

    for H, W in ((96, 96), (120, 72)):
        root = tmp_path / f"ds{H}x{W}"
        (root / "images/train").mkdir(parents=True)
        (root / "labels/train").mkdir(parents=True)
        img = np.zeros((H, W, 3), np.uint8)
        cx, cy, w, h = 0.5, 0.4, 0.4, 0.3
        x1, y1 = int((cx - w / 2) * W), int((cy - h / 2) * H)
        x2, y2 = int((cx + w / 2) * W), int((cy + h / 2) * H)
        cv2.rectangle(img, (x1, y1), (x2, y2), (255, 255, 255), -1)
        cv2.imwrite(str(root / "images/train/0.png"), img)
        (root / "labels/train/0.txt").write_text(f"0 {cx} {cy} {w} {h}")

        ds = YOLODataset(str(root / "images/train"), imgsz=64, augment=False)
        item = ds[0]
        canvas, labels = item["img"], item["labels"]
        assert len(labels) == 1
        _, lcx, lcy, lw, lh = labels[0]
        ch, cw = canvas.shape[:2]
        bx1, by1 = int((lcx - lw / 2) * cw), int((lcy - lh / 2) * ch)
        bx2, by2 = int((lcx + lw / 2) * cw), int((lcy + lh / 2) * ch)
        inside = canvas[by1 + 1: by2 - 1, bx1 + 1: bx2 - 1]
        assert inside.size and (inside > 200).mean() > 0.95, \
            f"label box does not cover the drawn rect ({H}x{W} source)"
        # and the box must not be materially larger than the rect
        area_label = (bx2 - bx1) * (by2 - by1)
        area_lit = int((canvas > 200).all(-1).sum())
        assert area_label < 1.3 * area_lit, \
            f"label box {area_label}px vs lit {area_lit}px — inflated labels"
        # ratio_pad carries the TOTAL original->canvas ratio
        r, _ = item["ratio_pad"]
        assert abs(r - 64 / max(H, W)) < 1e-6
