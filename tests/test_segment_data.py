"""Segmentation data pipeline + end-to-end segment training smoke."""

import shutil
from pathlib import Path

import numpy as np
import pytest

TMP = Path(__file__).parent / "tmp"


def make_seg_dataset(root: Path, n: int = 6, imgsz: int = 64):
    import cv2

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = rng.integers(0, 60, (imgsz, imgsz, 3), np.uint8)
            cx, cy, w, h = 0.5, 0.5, 0.4, 0.3
            x1, y1 = int((cx - w / 2) * imgsz), int((cy - h / 2) * imgsz)
            x2, y2 = int((cx + w / 2) * imgsz), int((cy + h / 2) * imgsz)
            cv2.rectangle(img, (x1, y1), (x2, y2), (0, 0, 220), -1)
            cv2.imwrite(str(root / "images" / split / f"{i:02d}.jpg"), img)
            poly = f"0 {cx - w/2} {cy - h/2} {cx + w/2} {cy - h/2} " \
                   f"{cx + w/2} {cy + h/2} {cx - w/2} {cy + h/2}"
            (root / "labels" / split / f"{i:02d}.txt").write_text(poly)
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: images/train\nval: images/val\nnames:\n  0: obj\n")
    return root / "data.yaml"


@pytest.fixture(scope="module")
def seg_yaml():
    root = TMP / "seg"
    if root.exists():
        shutil.rmtree(root)
    yield make_seg_dataset(root)
    shutil.rmtree(root, ignore_errors=True)


def test_segment_dataset_masks(seg_yaml):
    from yolo_sod_tpu.data import YOLODataset, build_dataloader, check_det_dataset

    data = check_det_dataset(seg_yaml)
    ds = YOLODataset(data["train"], imgsz=64, augment=True, hyp={"mosaic": 1.0},
                     nc=1, task="segment")
    item = ds[0]
    assert "masks" in item and item["masks"].shape == (1, 16, 16)
    # the mask covers roughly the box area (0.4*0.3 of the image)
    frac = item["masks"][0].mean()
    assert 0.05 < frac < 0.3
    dl = build_dataloader(ds, batch=2, shuffle=False)
    batch = next(iter(dl))
    assert batch["masks"].shape[0] == 2 and batch["masks"].ndim == 4


def test_segment_loss_via_batch(seg_yaml):
    import jax.numpy as jnp

    from yolo_sod_tpu.data import YOLODataset, build_dataloader, check_det_dataset
    from yolo_sod_tpu.nn.tasks import DetectionModel
    from yolo_sod_tpu.utils.loss_tasks import SegmentationLoss

    data = check_det_dataset(seg_yaml)
    ds = YOLODataset(data["train"], imgsz=64, augment=False, hyp={}, nc=1,
                     task="segment")
    dl = build_dataloader(ds, batch=2, shuffle=False)
    batch = next(iter(dl))

    graph = {"nc": 1,
             "backbone": [[-1, 1, "Conv", [16, 3, 2]],
                          [-1, 1, "Conv", [32, 3, 4]],   # /8
                          [-1, 1, "Conv", [64, 3, 2]]],  # /16
             "head": [[[1, 2], 1, "Segment", ["nc", 8, 32]]]}
    m = DetectionModel(graph)
    m.init(imgsz=64)
    out, _ = m.apply(m.variables, jnp.asarray(batch["img"]), train=True, mutable=True)
    crit = SegmentationLoss(nc=1, strides=m.graph.detect_strides, max_fg=16)
    dev = {k: jnp.asarray(batch[k]) for k in ("cls", "bboxes", "mask_gt", "masks")}
    total, items = crit(out, dev)
    assert np.isfinite(float(total)) and items.shape == (4,)


def test_segment_mosaic_polygon_warp(seg_yaml):
    """Polygons now warp through mosaic + affine: masks align with boxes."""
    from yolo_sod_tpu.data import YOLODataset, check_det_dataset

    data = check_det_dataset(seg_yaml)
    ds = YOLODataset(data["train"], imgsz=64, augment=True,
                     hyp={"mosaic": 1.0, "degrees": 10.0, "translate": 0.1,
                          "scale": 0.5, "fliplr": 0.5}, nc=1, task="segment")
    for i in range(len(ds)):
        item = ds[i]
        n = len(item["labels"])
        assert item["masks"].shape[0] == n, "mask/label count mismatch"
        for j in range(n):
            mask = item["masks"][j]
            if mask.sum() == 0:
                continue  # fully clipped instance
            ys, xs = np.nonzero(mask)
            # mask extent must sit inside the (slightly padded) label box
            cls, cx, cy, w, h = item["labels"][j]
            x1 = (cx - w / 2) * 64 / 4 - 1.5
            x2 = (cx + w / 2) * 64 / 4 + 1.5
            y1 = (cy - h / 2) * 64 / 4 - 1.5
            y2 = (cy + h / 2) * 64 / 4 + 1.5
            assert xs.min() >= x1 and xs.max() <= x2
            assert ys.min() >= y1 and ys.max() <= y2


def test_segmentation_validator_on_trained_synthetic(seg_yaml):
    """SegmentationValidator produces box + mask mAP on a (briefly) trained
    tiny segment model; metrics structure and bounds hold."""
    import jax.numpy as jnp

    from yolo_sod_tpu.cfg import DEFAULT_CFG_DICT, get_cfg
    from yolo_sod_tpu.engine.validator_tasks import SegmentationValidator, mask_iou
    from yolo_sod_tpu.nn.tasks import DetectionModel

    # mask_iou sanity
    gt = np.zeros((1, 8, 8)); gt[0, 2:6, 2:6] = 1
    pred = np.zeros((2, 8, 8)); pred[0, 2:6, 2:6] = 1; pred[1, 0:2, 0:2] = 1
    ious = mask_iou(pred, gt)          # -> (Ngt, Np)
    assert ious.shape == (1, 2)
    assert ious[0, 0] == 1.0 and ious[0, 1] == 0.0

    graph = {"nc": 1,
             "backbone": [[-1, 1, "Conv", [16, 3, 2]],
                          [-1, 1, "Conv", [32, 3, 4]],
                          [-1, 1, "Conv", [64, 3, 2]]],
             "head": [[[1, 2], 1, "Segment", ["nc", 8, 32]]]}
    m = DetectionModel(graph)
    m.init(imgsz=64)
    vargs = get_cfg(DEFAULT_CFG_DICT, {"data": str(seg_yaml), "imgsz": 64,
                                       "batch": 2, "conf": 0.001, "iou": 0.7,
                                       "mode": "val", "half": False})
    metrics = SegmentationValidator(args=vargs)(model=m)
    r = metrics.mean_results()
    assert len(r) == 6
    assert all(0.0 <= v <= 1.0 for v in r)


def test_oks():
    from yolo_sod_tpu.engine.validator_tasks import oks

    gt = np.zeros((1, 3, 3)); gt[0, :, :2] = [[10, 10], [20, 20], [30, 30]]
    gt[0, :, 2] = 1
    pred_same = gt[None, 0, :, :2][None][0]
    sim = oks(gt, gt[:, :, :2], np.array([400.0]))
    assert sim.shape == (1, 1) and sim[0, 0] > 0.99
    far = gt[:, :, :2] + 50
    assert oks(gt, far, np.array([400.0]))[0, 0] < 0.2


def test_auto_annotate_writes_segment_labels(tmp_path):
    """auto_annotate: detector boxes -> SAM masks -> normalized YOLO segment
    label files (upstream data/annotator.py contract). Driven with stub
    models so the test pins the orchestration + label format, not the nets."""
    import cv2

    from yolo_sod_tpu.data import auto_annotate
    from yolo_sod_tpu.engine.results import Results

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    img = np.zeros((80, 120, 3), np.uint8)
    cv2.imwrite(str(img_dir / "a.jpg"), img)

    class StubDet:
        def predict(self, source, **kw):
            im = cv2.imread(str(Path(source) / "a.jpg"))
            boxes = np.array([[10, 10, 50, 40, 0.9, 2],
                              [60, 20, 110, 70, 0.8, 0]], np.float32)
            return iter([Results(im, str(Path(source) / "a.jpg"),
                                 {0: "x", 2: "y"}, boxes=boxes)])

    class StubSAM:
        def predict(self, im, bboxes=None, **kw):
            h, w = im.shape[:2]
            masks = np.zeros((len(bboxes), h, w), bool)
            for i, (x1, y1, x2, y2) in enumerate(np.asarray(bboxes, int)):
                masks[i, y1:y2, x1:x2] = True
            det = np.zeros((len(bboxes), 6), np.float32)
            return [Results(im, "a.jpg", {0: "object"}, boxes=det,
                            masks=masks)]

    out = auto_annotate(img_dir, det_model=StubDet(), sam_model=StubSAM(),
                        output_dir=tmp_path / "labels")
    txt = (out / "a.txt").read_text().strip().splitlines()
    assert len(txt) == 2
    for line, want_cls in zip(txt, (2, 0)):
        parts = line.split()
        assert int(parts[0]) == want_cls
        coords = np.array(parts[1:], np.float32)
        assert len(coords) >= 6 and len(coords) % 2 == 0
        assert (coords >= 0).all() and (coords <= 1).all()
    # the first mask's polygon should hug its box (10..50 x, 10..40 y, norm)
    c0 = np.array(txt[0].split()[1:], np.float32).reshape(-1, 2)
    assert abs(c0[:, 0].min() - 10 / 120) < 0.02
    assert abs(c0[:, 1].max() - (40 - 1) / 80) < 0.03


def test_convert_coco_writes_yolo_labels(tmp_path):
    """convert_coco: COCO instance JSON -> normalized YOLO labels (upstream
    data/converter.py contract): center-xywh, crowd skipped, 91->80 remap,
    polygon tails with use_segments."""
    import json

    from yolo_sod_tpu.data.converter import convert_coco

    ann = {
        "images": [{"id": 7, "file_name": "im7.jpg", "height": 100,
                    "width": 200}],
        "annotations": [
            # category 3 (car) -> 80-class id 2; box (10,20,w=40,h=30)
            {"image_id": 7, "category_id": 3, "iscrowd": 0,
             "bbox": [10, 20, 40, 30],
             "segmentation": [[10, 20, 50, 20, 50, 50]]},
            # crowd: skipped
            {"image_id": 7, "category_id": 1, "iscrowd": 1,
             "bbox": [0, 0, 10, 10], "segmentation": []},
        ],
    }
    (tmp_path / "ann").mkdir()
    (tmp_path / "ann" / "instances_val.json").write_text(json.dumps(ann))
    out = convert_coco(tmp_path / "ann", save_dir=tmp_path / "out",
                       use_segments=True)
    txt = (out / "labels" / "val" / "im7.txt").read_text().strip().splitlines()
    assert len(txt) == 1
    parts = txt[0].split()
    assert int(parts[0]) == 2
    np.testing.assert_allclose(
        [float(v) for v in parts[1:5]],
        [(10 + 20) / 200, (20 + 15) / 100, 40 / 200, 30 / 100], atol=1e-6)
    seg = np.array(parts[5:], np.float64).reshape(-1, 2)
    np.testing.assert_allclose(seg, [[0.05, 0.2], [0.25, 0.2], [0.25, 0.5]],
                               atol=1e-6)


def test_seg_and_pose_labels_align_on_nonnative_source(tmp_path):
    """Masks and keypoints must live in the letterboxed-canvas frame for a
    source resolution != imgsz (round-4 regression class: the detect labels
    were scaled by ori_shape instead of the pre-resized dims — this pins the
    seg/pose branches of the same code path)."""
    import cv2
    import numpy as np

    from yolo_sod_tpu.data.dataset import YOLODataset

    H, W = 120, 72      # non-square, non-native (imgsz=64)
    # --- segmentation: a white triangle, polygon label -------------------
    root = tmp_path / "seg"
    (root / "images/train").mkdir(parents=True)
    (root / "labels/train").mkdir(parents=True)
    img = np.zeros((H, W, 3), np.uint8)
    poly_n = [(0.2, 0.2), (0.8, 0.25), (0.5, 0.75)]
    pts = np.array([(int(x * W), int(y * H)) for x, y in poly_n], np.int32)
    cv2.fillPoly(img, [pts], (255, 255, 255))
    cv2.imwrite(str(root / "images/train/0.png"), img)
    (root / "labels/train/0.txt").write_text(
        "0 " + " ".join(f"{x} {y}" for x, y in poly_n))
    ds = YOLODataset(str(root / "images/train"), imgsz=64, augment=False,
                     task="segment")
    item = ds[0]
    canvas, masks = item["img"], item["masks"]
    assert len(masks) == 1
    m = masks[0]
    mh, mw = m.shape
    lit = cv2.resize((canvas > 200).all(-1).astype(np.float32), (mw, mh))
    inter = float((m * lit).sum())
    union = float(np.maximum(m, lit).sum())
    assert union and inter / union > 0.7, \
        f"mask/pixel IoU {inter / max(union, 1):.2f} — seg labels misaligned"

    # --- pose: one white dot per keypoint --------------------------------
    root = tmp_path / "pose"
    (root / "images/train").mkdir(parents=True)
    (root / "labels/train").mkdir(parents=True)
    img = np.zeros((H, W, 3), np.uint8)
    kpts_n = [(0.3, 0.3), (0.7, 0.6)]
    for x, y in kpts_n:
        cv2.circle(img, (int(x * W), int(y * H)), 4, (255, 255, 255), -1)
    cv2.imwrite(str(root / "images/train/0.png"), img)
    (root / "labels/train/0.txt").write_text(
        "0 0.5 0.45 0.9 0.7 " + " ".join(f"{x} {y} 2" for x, y in kpts_n))
    ds = YOLODataset(str(root / "images/train"), imgsz=64, augment=False,
                     task="pose", kpt_shape=(2, 3))
    item = ds[0]
    canvas, kp = item["img"], item["keypoints"]
    ch, cw = canvas.shape[:2]
    assert kp.shape[0] == 1
    for (kx, ky, v) in kp[0]:
        px, py = int(kx * cw), int(ky * ch)
        patch = canvas[max(py - 3, 0): py + 4, max(px - 3, 0): px + 4]
        assert patch.size and (patch > 200).any(), \
            f"keypoint ({px},{py}) does not land on its drawn dot"
