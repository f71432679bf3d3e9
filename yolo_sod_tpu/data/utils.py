"""Dataset discovery + label IO (contract of the absent ultralytics.data.utils).

check_det_dataset resolves a dataset YAML {path, train, val, names} to
absolute paths; img2label_paths maps images/ -> labels/ txt files in YOLO
format (`cls cx cy w h` normalized, one row per box).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from yolo_sod_tpu.utils import LOGGER, yaml_load

IMG_FORMATS = {"bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm"}


def check_det_dataset(data) -> dict:
    """Resolve a detection dataset YAML (or dict) to absolute paths + names."""
    if isinstance(data, (str, Path)):
        d = yaml_load(data)
        d["yaml_file"] = str(data)
        base = Path(data).parent
    else:
        d = dict(data)
        base = Path(d.get("path", "."))

    root = Path(d.get("path", "")) if d.get("path") else base
    if not root.is_absolute():
        # A relative `path:` may be relative to the yaml's directory OR to
        # the working directory (the yaml often lives inside the dataset).
        for cand in ((base / root).resolve(), Path.cwd() / root, base.resolve()):
            if cand.is_dir():
                root = cand
                break
        else:
            root = (base / root).resolve()
    d["path"] = root

    for split in ("train", "val", "test"):
        if d.get(split):
            p = Path(d[split])
            d[split] = str(p if p.is_absolute() else root / p)

    names = d.get("names")
    if isinstance(names, (list, tuple)):
        names = dict(enumerate(names))
    elif isinstance(names, dict):
        names = {int(k): v for k, v in names.items()}
    else:
        raise ValueError(f"dataset yaml missing 'names': {d.get('yaml_file', d)}")
    d["names"] = names
    d["nc"] = len(names)
    return d


def img2label_paths(img_paths):
    """images/xxx.jpg -> labels/xxx.txt (standard YOLO layout)."""
    out = []
    for p in img_paths:
        p = str(p)
        if "/images/" in p:
            lp = p.replace("/images/", "/labels/", 1)
        else:
            lp = str(Path(p).parent / "labels" / Path(p).name)
        out.append(str(Path(lp).with_suffix(".txt")))
    return out


def list_images(path) -> list[str]:
    """Expand a dir / txt-list / single file into a sorted image path list."""
    path = Path(path)
    files: list[str] = []
    if path.is_dir():
        files = sorted(str(p) for p in path.rglob("*")
                       if p.suffix.lower().lstrip(".") in IMG_FORMATS)
    elif path.suffix == ".txt":
        base = path.parent
        for line in path.read_text().splitlines():
            line = line.strip()
            if line:
                p = Path(line)
                files.append(str(p if p.is_absolute() else base / p))
    elif path.is_file():
        files = [str(path)]
    if not files:
        raise FileNotFoundError(f"no images found in {path}")
    return files


def load_label(label_path, nc: int | None = None) -> np.ndarray:
    """Read one YOLO txt label file -> (n, 5) [cls, cx, cy, w, h] float32.

    Polygon rows (`cls x1 y1 ... xn yn`, > 5 columns — segmentation format)
    reduce to their bounding box here; use load_label_segments for polygons.
    """
    p = Path(label_path)
    if not p.exists():
        return np.zeros((0, 5), np.float32)
    rows = []
    for line in p.read_text().splitlines():
        parts = line.split()
        if len(parts) == 5:
            rows.append([float(x) for x in parts])
        elif len(parts) > 5 and len(parts) % 2 == 1:
            cls = float(parts[0])
            xy = np.array([float(x) for x in parts[1:]], np.float32).reshape(-1, 2)
            x1, y1 = xy.min(0)
            x2, y2 = xy.max(0)
            rows.append([cls, (x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1])
    if not rows:
        return np.zeros((0, 5), np.float32)
    lb = np.array(rows, np.float32)
    lb[:, 1:] = np.clip(lb[:, 1:], 0, 1)
    if nc is not None:
        keep = lb[:, 0] < nc
        if not keep.all():
            LOGGER.warning(f"{label_path}: dropped {int((~keep).sum())} rows with class >= {nc}")
            lb = lb[keep]
    return lb


def load_label_segments(label_path) -> list:
    """Read polygon rows -> list of (cls, (n, 2) normalized xy) tuples."""
    p = Path(label_path)
    if not p.exists():
        return []
    out = []
    for line in p.read_text().splitlines():
        parts = line.split()
        if len(parts) > 5 and len(parts) % 2 == 1:
            cls = float(parts[0])
            xy = np.array([float(x) for x in parts[1:]], np.float32).reshape(-1, 2)
            out.append((cls, np.clip(xy, 0, 1)))
        elif len(parts) == 5:
            # box row -> rectangle polygon
            cls, cx, cy, w, h = (float(x) for x in parts)
            xy = np.array([[cx - w / 2, cy - h / 2], [cx + w / 2, cy - h / 2],
                           [cx + w / 2, cy + h / 2], [cx - w / 2, cy + h / 2]],
                          np.float32)
            out.append((cls, np.clip(xy, 0, 1)))
    return out


def load_label_pose(label_path, kpt_shape=(17, 3)) -> tuple:
    """Read pose rows `cls cx cy w h x1 y1 [v1] ...` (normalized) ->
    ((n, 5) boxes, (n, K, 3) keypoints). Files with D=2 keypoints get v=1
    (reference contract: missing visibility means visible).
    """
    K, D = int(kpt_shape[0]), int(kpt_shape[1])
    p = Path(label_path)
    if not p.exists():
        return np.zeros((0, 5), np.float32), np.zeros((0, K, 3), np.float32)
    boxes, kpts = [], []
    for line in p.read_text().splitlines():
        parts = [float(x) for x in line.split()]
        if len(parts) != 5 + K * D:
            continue
        boxes.append(parts[:5])
        k = np.array(parts[5:], np.float32).reshape(K, D)
        if D == 2:
            k = np.concatenate([k, np.ones((K, 1), np.float32)], 1)
        kpts.append(k)
    if not boxes:
        return np.zeros((0, 5), np.float32), np.zeros((0, K, 3), np.float32)
    lb = np.array(boxes, np.float32)
    lb[:, 1:] = np.clip(lb[:, 1:], 0, 1)
    return lb, np.stack(kpts)


def load_label_obb(label_path) -> tuple:
    """Read DOTA-YOLO rows `cls x1 y1 x2 y2 x3 y3 x4 y4` (normalized) ->
    ((n, 5) axis-aligned boxes for generic machinery, (n, 4, 2) polygons).
    """
    p = Path(label_path)
    if not p.exists():
        return np.zeros((0, 5), np.float32), np.zeros((0, 4, 2), np.float32)
    boxes, polys = [], []
    for line in p.read_text().splitlines():
        parts = [float(x) for x in line.split()]
        if len(parts) != 9:
            continue
        xy = np.clip(np.array(parts[1:], np.float32).reshape(4, 2), 0, 1)
        x1, y1 = xy.min(0)
        x2, y2 = xy.max(0)
        boxes.append([parts[0], (x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1])
        polys.append(xy)
    if not boxes:
        return np.zeros((0, 5), np.float32), np.zeros((0, 4, 2), np.float32)
    return np.array(boxes, np.float32), np.stack(polys)


def poly2xywhr(poly_px: np.ndarray) -> np.ndarray:
    """(4, 2) pixel polygon -> [cx, cy, w, h, r] rotated rect, regularized so
    w >= h and r in [-pi/4, 3pi/4) (the reference's regularize_rboxes range,
    matching the OBB head's (sigmoid - 0.25) * pi decode)."""
    import cv2

    (cx, cy), (w, h), deg = cv2.minAreaRect(poly_px.astype(np.float32))
    r = np.deg2rad(deg)
    if w < h:
        w, h = h, w
        r += np.pi / 2
    r = (r + np.pi / 4) % np.pi - np.pi / 4
    return np.array([cx, cy, w, h, r], np.float32)


def polygons_to_masks(segments, imgsz: int, ratio, pad, mask_ratio: int = 4) -> np.ndarray:
    """Rasterize letterboxed polygons into per-instance masks at
    imgsz/mask_ratio resolution. `segments` is [(cls, (n,2) normalized xy)]
    in ORIGINAL image coords scaled to (w0, h0) implicitly by ratio/pad of
    the letterbox applied to the resized image."""
    import cv2

    m = imgsz // mask_ratio
    masks = np.zeros((len(segments), m, m), np.float32)
    r, (dw, dh) = ratio, pad
    for i, (_, xy) in enumerate(segments):
        pts = xy.copy()
        # normalized original coords -> letterboxed pixels -> mask pixels
        pts[:, 0] = (pts[:, 0] * r[0] + dw) / mask_ratio
        pts[:, 1] = (pts[:, 1] * r[1] + dh) / mask_ratio
        cv2.fillPoly(masks[i], [pts.astype(np.int32)], 1.0)
    return masks


def pixel_polys_to_masks(polys, shape, mask_ratio: int = 4) -> np.ndarray:
    """Rasterize pixel-space polygons (final-image coords) into per-instance
    masks at shape/mask_ratio resolution. `shape` is (h, w) or a square int —
    rect val letterboxes to non-square canvases (reference segment/val.py
    letterboxes masks through the same rect pipeline)."""
    import cv2

    h, w = (shape, shape) if isinstance(shape, int) else shape
    masks = np.zeros((len(polys), h // mask_ratio, w // mask_ratio), np.float32)
    for i, pts in enumerate(polys):
        cv2.fillPoly(masks[i], [(pts / mask_ratio).astype(np.int32)], 1.0)
    return masks
