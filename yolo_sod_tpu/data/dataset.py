"""YOLODataset: image+label loading with the mosaic/mixup/affine pipeline.

Rebuilt from the call-site contract (SURVEY.md §1.1); emits per-item dicts
{"img" HWC uint8 BGR, "labels" (n,5) normalized, "im_file", "ori_shape",
"ratio_pad"}. Augmentation strengths come straight from the flat cfg keys
(mosaic, mixup, copy_paste, degrees, translate, scale, shear, perspective,
fliplr, flipud, hsv_h/s/v), mutated live by the staged-training callbacks —
so they are read at __getitem__ time, not cached at init.
"""

from __future__ import annotations

from typing import Optional

import cv2
import numpy as np

from yolo_sod_tpu.data.augment import (
    augment_hsv,
    copy_paste_flip,
    letterbox_np,
    mixup,
    random_perspective,
    xywhn2xyxy,
    xyxy2xywhn,
)
from yolo_sod_tpu.data.utils import img2label_paths, list_images, load_label
from yolo_sod_tpu.utils import LOGGER


class YOLODataset:
    """Detection dataset over YOLO-layout images/ + labels/ trees."""

    def __init__(self, img_path, imgsz: int = 640, augment: bool = True,
                 hyp=None, rect: bool = False, stride: int = 32,
                 single_cls: bool = False, fraction: float = 1.0,
                 nc: Optional[int] = None, seed: int = 0,
                 task: str = "detect", mask_ratio: int = 4, cache=False,
                 kpt_shape=(17, 3), flip_idx=None,
                 multi_modal: bool = False, names=None):
        # multi_modal: each item also carries `texts` — the class-name
        # vocabulary its cls ids index (reference world/train.py:68
        # build_yolo_dataset(..., multi_modal=True) contract).
        self.multi_modal = multi_modal
        self.names = dict(names) if names else None
        self.img_path = img_path
        self.imgsz = imgsz
        self.augment = augment
        self.hyp = hyp or {}
        self.rect = rect
        self.stride = stride
        self.single_cls = single_cls
        self.im_files = list_images(img_path)
        if fraction < 1.0:
            self.im_files = self.im_files[: max(1, round(len(self.im_files) * fraction))]
        self.label_files = img2label_paths(self.im_files)
        self.nc = nc
        self.task = task
        self.mask_ratio = mask_ratio
        self.kpt_shape = tuple(kpt_shape)
        self.flip_idx = list(flip_idx) if flip_idx else None
        self.segments = None
        self.kpts = None
        if task == "segment":
            from yolo_sod_tpu.data.utils import load_label_segments

            self.labels = [load_label(lf, nc) for lf in self.label_files]
            self.segments = [load_label_segments(lf) for lf in self.label_files]
            # copy-paste operates on boxes only; disable for polygons.
            if isinstance(self.hyp, dict):
                self.hyp["copy_paste"] = 0.0
        elif task == "pose":
            from yolo_sod_tpu.data.utils import load_label_pose

            pairs = [load_label_pose(lf, self.kpt_shape) for lf in self.label_files]
            self.labels = [p[0] for p in pairs]
            self.kpts = [p[1] for p in pairs]
            if isinstance(self.hyp, dict):
                self.hyp["copy_paste"] = 0.0
        elif task == "obb":
            from yolo_sod_tpu.data.utils import load_label_obb

            pairs = [load_label_obb(lf) for lf in self.label_files]
            self.labels = [p[0] for p in pairs]
            # Rotated boxes ride the polygon channel: per-instance (cls, (4,2))
            # tuples, exactly like segmentation polygons.
            self.segments = [[(lb[0], xy) for lb, xy in zip(p[0], p[1])]
                             for p in pairs]
            if isinstance(self.hyp, dict):
                self.hyp["copy_paste"] = 0.0
        else:
            self.labels = [load_label(lf, nc) for lf in self.label_files]
        if single_cls:
            for lb in self.labels:
                lb[:, 0] = 0
        self.seed = seed
        self._post_init(cache)

    def _post_init(self, cache):
        """Shared init tail (also used by GroundingDataset, which builds its
        file/label lists from a JSON instead of a labels/ tree)."""
        self.epoch = 0   # bumped by the loader; salts per-item RNG
        self.cache = "ram" if cache in (True, "ram", "True") else None
        self._im_cache = [None] * len(self.im_files) if self.cache else None
        self.rect_shapes = self._compute_rect_shapes() \
            if (self.rect and not self.augment) else None
        n_boxes = sum(len(l) for l in self.labels)
        LOGGER.info(f"dataset: {len(self.im_files)} images, {n_boxes} boxes "
                    f"({self.img_path})")

    def _compute_rect_shapes(self, granularity: int = 64):
        """Aspect-grouped letterbox targets, quantized to a bounded bucket set.

        The reference's rect val computes a continuous per-batch shape
        (detect/val.py rect path) — on TPU every distinct shape is a compile,
        so the short side quantizes UP to `granularity` (>= stride) instead:
        at 640 that is <= 10 buckets per orientation, and in practice a val
        set hits 2-3. Shapes read from image headers (no pixel decode).
        """
        shapes = []
        for f in self.im_files:
            try:
                from PIL import Image

                with Image.open(f) as im:
                    w0, h0 = im.size
            except Exception:
                im = cv2.imread(f)
                h0, w0 = im.shape[:2] if im is not None else (self.imgsz, self.imgsz)
            g = max(granularity, self.stride)
            if h0 >= w0:
                h = self.imgsz
                w = min(int(np.ceil(self.imgsz * w0 / h0 / g) * g), self.imgsz)
            else:
                w = self.imgsz
                h = min(int(np.ceil(self.imgsz * h0 / w0 / g) * g), self.imgsz)
            shapes.append((h, w))
        return shapes

    def __len__(self):
        return len(self.im_files)

    def _hyp(self, key, default=0.0):
        h = self.hyp
        v = getattr(h, key, None) if not isinstance(h, dict) else h.get(key)
        return default if v is None else v

    def load_image(self, i: int, memo: Optional[dict] = None):
        """Load image i, resized so the long side == imgsz (reference contract:
        train-time images pre-scale to imgsz before mosaic). cache='ram'
        keeps the resized arrays (reference `cache` key / InfiniteDataLoader
        behavior); entries fill lazily and are shared across epochs.

        `memo` is a per-batch decode cache (loader-owned dict): mosaic/mixup
        partner images decode once per batch instead of once per use. Memo
        hits return the shared array WITHOUT a copy — every consumer of a
        partner image only reads it (canvas paste)."""
        if self.cache == "ram" and self._im_cache[i] is not None:
            im, shape = self._im_cache[i]
            return im.copy(), shape
        if memo is not None and i in memo:
            return memo[i]  # read-only consumers (mosaic paste) — no copy
        im = cv2.imread(self.im_files[i])
        if im is None:
            raise FileNotFoundError(f"image not found: {self.im_files[i]}")
        h0, w0 = im.shape[:2]
        r = self.imgsz / max(h0, w0)
        if r != 1:
            im = cv2.resize(im, (min(round(w0 * r), self.imgsz), min(round(h0 * r), self.imgsz)),
                            interpolation=cv2.INTER_LINEAR if (self.augment or r > 1) else cv2.INTER_AREA)
        if self.cache == "ram":
            self._im_cache[i] = (im.copy(), (h0, w0))
        if memo is not None:
            memo[i] = (im, (h0, w0))
        return im, (h0, w0)

    # -- mosaic ---------------------------------------------------------------
    def set_epoch(self, epoch: int):
        """Salt the per-item RNG so augmentations differ across epochs but
        stay deterministic and thread-safe (items never share a Generator)."""
        self.epoch = epoch

    def _rng(self, index: int) -> np.random.Generator:
        return np.random.default_rng((self.seed, self.epoch, index))

    def _pick_partner(self, rng, partners) -> int:
        """Mosaic/mixup partner index. With loader context, partners come
        from the CURRENT BATCH (the reference's recently-loaded `buffer`
        sampling in upstream BaseDataset.load_image/Mosaic — a pool of
        ~batch-size recent images) so each image decodes once per batch;
        standalone use falls back to uniform over the dataset."""
        if partners is not None and len(partners) > 1:
            return int(partners[int(rng.integers(0, len(partners)))])
        return int(rng.integers(0, len(self)))

    def _mosaic4(self, index: int, rng, partners=None, memo=None):
        """4-image mosaic on a 2x canvas; returns (img, labels_xyxy)."""
        s = self.imgsz
        yc = int(rng.uniform(s // 2, 2 * s - s // 2))
        xc = int(rng.uniform(s // 2, 2 * s - s // 2))
        indices = [index] + [self._pick_partner(rng, partners) for _ in range(3)]
        img4 = np.full((s * 2, s * 2, 3), 114, np.uint8)
        labels4 = []
        segs4 = []
        kpts4 = []
        for i, idx in enumerate(indices):
            img, _ = self.load_image(idx, memo)
            h, w = img.shape[:2]
            if i == 0:
                x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
                x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
            elif i == 1:
                x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
                x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
            elif i == 2:
                x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
            else:
                x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
            img4[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            padw, padh = x1a - x1b, y1a - y1b
            lb = xywhn2xyxy(self.labels[idx], w, h, padw, padh)
            labels4.append(lb)
            if self.segments is not None:
                for _, xy in self.segments[idx]:
                    segs4.append(xy * np.array([w, h], np.float32)
                                 + np.array([padw, padh], np.float32))
            if self.kpts is not None:
                k = self.kpts[idx].copy()
                k[..., 0] = k[..., 0] * w + padw
                k[..., 1] = k[..., 1] * h + padh
                kpts4.append(k)
        labels4 = np.concatenate(labels4, 0) if labels4 else np.zeros((0, 5), np.float32)
        labels4[:, 1:] = labels4[:, 1:].clip(0, 2 * s)
        if self.segments is not None:
            return img4, labels4, segs4
        if self.kpts is not None:
            K = self.kpt_shape[0]
            kpts4 = np.concatenate(kpts4, 0) if kpts4 \
                else np.zeros((0, K, 3), np.float32)
            return img4, labels4, kpts4
        return img4, labels4

    # -- item -----------------------------------------------------------------
    def __getitem__(self, index: int) -> dict:
        return self.getitem(index)

    def getitem(self, index: int, partners=None, memo=None) -> dict:
        """__getitem__ with optional loader context: `partners` (the batch's
        index set, used for mosaic/mixup partner picks — see _pick_partner)
        and `memo` (per-batch decode cache)."""
        imgsz = self.imgsz
        rng = self._rng(index)
        ratio_pad = (1.0, (0.0, 0.0))
        segs_px = None
        kpts_px = None
        aff = dict(degrees=self._hyp("degrees"), translate=self._hyp("translate", 0.1),
                   scale=self._hyp("scale", 0.5), shear=self._hyp("shear"),
                   perspective=self._hyp("perspective"))
        if self.augment and rng.random() < self._hyp("mosaic"):
            border = (-imgsz // 2, -imgsz // 2)
            if self.segments is not None:
                img, labels_xyxy, segs_px = self._mosaic4(index, rng, partners, memo)
                img, labels_xyxy, segs_px = random_perspective(
                    img, labels_xyxy, rng, border=border, segments=segs_px, **aff)
            elif self.kpts is not None:
                img, labels_xyxy, kpts_px = self._mosaic4(index, rng, partners, memo)
                img, labels_xyxy, kpts_px = random_perspective(
                    img, labels_xyxy, rng, border=border, keypoints=kpts_px, **aff)
            else:
                img, labels_xyxy = self._mosaic4(index, rng, partners, memo)
                img, labels_xyxy = random_perspective(
                    img, labels_xyxy, rng, border=border, **aff)
                if rng.random() < self._hyp("mixup"):
                    idx2 = self._pick_partner(rng, partners)
                    img2, labels2 = self._mosaic4(idx2, rng, partners, memo)
                    img2, labels2 = random_perspective(
                        img2, labels2, rng, border=border, **aff)
                    img, labels_xyxy = mixup(img, labels_xyxy, img2, labels2, rng)
            ori_shape = (imgsz, imgsz)
        else:
            img, ori_shape = self.load_image(index)
            # load_image PRE-RESIZES so the long side == imgsz; all label
            # math below must use the loaded image's dims, not ori_shape —
            # normalized labels scaled by ori_shape land in ORIGINAL pixels
            # while the canvas is the resized one (a 1.5x box blowup at
            # 96->64 that capped synthetic-set mAP at ~0.1 until round 4).
            rh, rw = img.shape[:2]
            tgt = self.rect_shapes[index] if self.rect_shapes is not None \
                else (imgsz, imgsz)
            img, r, (dw, dh) = letterbox_np(img, tgt, scaleup=self.augment)
            # ratio_pad carries the TOTAL original->canvas ratio (pre-resize
            # x letterbox) so scale_boxes_np maps predictions back to true
            # original pixels (reference keeps the same composition). The
            # pre-resize scalar is exact on the LONG side (load_image targets
            # it); the short side only differs by rounding.
            r0 = max(rh / ori_shape[0], rw / ori_shape[1]) \
                if all(ori_shape) else 1.0
            ratio_pad = (r * r0, (dw, dh))
            labels_xyxy = xywhn2xyxy(self.labels[index], round(rw * r),
                                     round(rh * r), dw, dh)
            if self.segments is not None:
                scale_xy = np.array([round(rw * r), round(rh * r)], np.float32)
                pad_xy = np.array([dw, dh], np.float32)
                segs_px = [xy * scale_xy + pad_xy for _, xy in self.segments[index]]
            if self.kpts is not None:
                kpts_px = self.kpts[index].copy()
                kpts_px[..., 0] = kpts_px[..., 0] * round(rw * r) + dw
                kpts_px[..., 1] = kpts_px[..., 1] * round(rh * r) + dh
            if self.augment:
                img = np.ascontiguousarray(img)
                if self.segments is not None:
                    img, labels_xyxy, segs_px = random_perspective(
                        img, labels_xyxy, rng, segments=segs_px, **aff)
                elif self.kpts is not None:
                    img, labels_xyxy, kpts_px = random_perspective(
                        img, labels_xyxy, rng, keypoints=kpts_px, **aff)
                else:
                    img, labels_xyxy = random_perspective(
                        img, labels_xyxy, rng, **aff)

        if self.augment:
            img = np.ascontiguousarray(img)
            img, labels_xyxy = copy_paste_flip(img, labels_xyxy, rng,
                                               p=self._hyp("copy_paste"))
            augment_hsv(img, rng, self._hyp("hsv_h", 0.015),
                        self._hyp("hsv_s", 0.7), self._hyp("hsv_v", 0.4))
            if rng.random() < self._hyp("flipud"):
                img = np.flipud(img)
                if len(labels_xyxy):
                    y1 = labels_xyxy[:, 2].copy()
                    labels_xyxy[:, 2] = img.shape[0] - labels_xyxy[:, 4]
                    labels_xyxy[:, 4] = img.shape[0] - y1
                if segs_px is not None:
                    for sg in segs_px:
                        sg[:, 1] = img.shape[0] - sg[:, 1]
                if kpts_px is not None and len(kpts_px):
                    kpts_px[..., 1] = img.shape[0] - kpts_px[..., 1]
            if rng.random() < self._hyp("fliplr", 0.5):
                img = np.fliplr(img)
                if len(labels_xyxy):
                    x1 = labels_xyxy[:, 1].copy()
                    labels_xyxy[:, 1] = img.shape[1] - labels_xyxy[:, 3]
                    labels_xyxy[:, 3] = img.shape[1] - x1
                if segs_px is not None:
                    for sg in segs_px:
                        sg[:, 0] = img.shape[1] - sg[:, 0]
                if kpts_px is not None and len(kpts_px):
                    kpts_px[..., 0] = img.shape[1] - kpts_px[..., 0]
                    if self.flip_idx:   # left/right keypoint swap (pose yaml)
                        kpts_px = kpts_px[:, self.flip_idx]

        h, w = img.shape[:2]
        labels = xyxy2xywhn(labels_xyxy, w, h)
        # Drop zero-area boxes produced by warping/clipping.
        keep_rows = None
        if len(labels):
            keep_rows = (labels[:, 3] > 1e-4) & (labels[:, 4] > 1e-4)
            labels = labels[keep_rows]
        item_masks = None
        item_kpts = None
        item_angles = None
        if kpts_px is not None:
            if keep_rows is not None and len(kpts_px) == len(keep_rows):
                kpts_px = kpts_px[keep_rows]
            item_kpts = kpts_px.copy()
            item_kpts[..., 0] /= w
            item_kpts[..., 1] /= h
        if segs_px is not None:
            if keep_rows is not None and len(segs_px) == len(keep_rows):
                segs_px = [sg for sg, k in zip(segs_px, keep_rows) if k]
            if self.task == "obb":
                # Polygon -> regularized rotated rect; xywh rows become the
                # ROTATED rect params (normalized) + per-instance angle, the
                # OBBLoss batch contract.
                from yolo_sod_tpu.data.utils import poly2xywhr

                item_angles = np.zeros(len(segs_px), np.float32)
                for i, sg in enumerate(segs_px):
                    cx, cy, bw, bh, ang = poly2xywhr(sg)
                    labels[i, 1:5] = [cx / w, cy / h, bw / w, bh / h]
                    item_angles[i] = ang
            else:
                from yolo_sod_tpu.data.utils import pixel_polys_to_masks

                item_masks = pixel_polys_to_masks(segs_px, (h, w), self.mask_ratio)
        return {
            "img": np.ascontiguousarray(img),
            "labels": labels.astype(np.float32),
            "im_file": self.im_files[index],
            "ori_shape": ori_shape,
            "ratio_pad": ratio_pad,
            **({"masks": item_masks} if item_masks is not None else {}),
            **({"keypoints": item_kpts} if item_kpts is not None else {}),
            **({"angles": item_angles} if item_angles is not None else {}),
            **({"texts": self._item_texts(index)} if self.multi_modal else {}),
        }

    def _item_texts(self, index: int) -> list:
        """Vocabulary this item's cls ids index: the global class names
        ("person/human" keeps its first variant, reference world/train.py:16).
        GroundingDataset overrides with per-image caption phrases."""
        if self.names:
            return [str(self.names.get(i, i)).split("/")[0]
                    for i in range(len(self.names))]
        return [str(i) for i in range(int(self.nc or 0))]

    def close_mosaic(self):
        """Zero out mosaic/mixup/copy_paste (reference _close_dataloader_mosaic)."""
        for k in ("mosaic", "mixup", "copy_paste"):
            if isinstance(self.hyp, dict):
                self.hyp[k] = 0.0
            else:
                setattr(self.hyp, k, 0.0)
        LOGGER.info("dataset: mosaic/mixup/copy_paste closed")

    def max_boxes(self, cap: int = 800, multiple: int = 32) -> int:
        """Static label-pad size M for jit: max GT count over the dataset,
        rounded up to `multiple`, clipped to `cap` (excess boxes drop)."""
        m = max((len(l) for l in self.labels), default=1)
        m = min(int(np.ceil(max(m, 1) / multiple) * multiple), cap)
        return max(m, multiple)
