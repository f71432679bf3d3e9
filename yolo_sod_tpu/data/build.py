"""DataLoader: threaded prefetch + static-shape collate.

Replaces the reference's InfiniteDataLoader (contract: SURVEY.md §1.1 —
iterate forever, reset() after mutating the dataset, e.g. mosaic close at
trainer.py:355-357). Collation is TPU-shaped: NHWC uint8 RGB images
(normalized on-device, see collate) and labels padded to a STATIC
per-dataset M so the jitted train step never retraces on a ragged batch.
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

import numpy as np

from yolo_sod_tpu import native
from yolo_sod_tpu.data.dataset import YOLODataset


def collate(items: list[dict], max_boxes: int) -> dict:
    """Stack per-item dicts into the training batch contract.

    Returns {"img" (B,H,W,3) uint8 RGB, "cls" (B,M), "bboxes"
    (B,M,4) normalized xywh, "mask_gt" (B,M), "batch_idx" flat GT ownership,
    "im_file", "ori_shape", "ratio_pad"}.

    Images stay uint8 here — 4x fewer host->device bytes than f32 — and are
    normalized to [0,1] on-device inside each consumer's jitted graph
    (ops/numerics.image_to_compute), matching the reference's uint8 transfer
    + on-device `.float() / 255` (reference engine/trainer.py
    preprocess_batch). Measured on the axon tunnel: the f32 contract made
    the validator upload-bound at 7 img/s.
    """
    B = len(items)
    M = max_boxes
    # BGR -> RGB uint8 NHWC. Fused native stack+swap (yolo_sod_tpu/native):
    # numpy's strided reversal copy alone costs more than the device train
    # step (~140 ms vs 89.6 ms at batch 16); the C++ single-pass kernel is
    # ~17 ms on one core and bit-exact (tests/test_native.py).
    img = native.stack_bgr2rgb([it["img"] for it in items])
    cls = np.zeros((B, M), np.float32)
    bboxes = np.zeros((B, M, 4), np.float32)
    mask = np.zeros((B, M), np.float32)
    has_masks = "masks" in items[0]
    has_kpts = "keypoints" in items[0]
    has_angles = "angles" in items[0]
    if has_masks:
        mh, mw = items[0]["masks"].shape[-2:] if items[0]["masks"].ndim == 3 \
            else (items[0]["img"].shape[0] // 4, items[0]["img"].shape[1] // 4)
        masks = np.zeros((B, M, mh, mw), np.float32)
    if has_kpts:
        K = items[0]["keypoints"].shape[1] if items[0]["keypoints"].ndim == 3 else 17
        kpts = np.zeros((B, M, K, 3), np.float32)
    if has_angles:
        angles = np.zeros((B, M), np.float32)
    batch_idx = []
    for b, it in enumerate(items):
        lb = it["labels"][:M]
        n = len(lb)
        if n:
            cls[b, :n] = lb[:, 0]
            bboxes[b, :n] = lb[:, 1:5]
            mask[b, :n] = 1.0
            batch_idx.append(np.full(n, b, np.int32))
        if has_masks and len(it["masks"]):
            nm_i = min(len(it["masks"]), M)
            masks[b, :nm_i] = it["masks"][:nm_i]
        if has_kpts and len(it["keypoints"]):
            nk = min(len(it["keypoints"]), M)
            kpts[b, :nk] = it["keypoints"][:nk]
        if has_angles and len(it["angles"]):
            na = min(len(it["angles"]), M)
            angles[b, :na] = it["angles"][:na]
    return {
        "img": img,
        "cls": cls,
        "bboxes": bboxes,
        "mask_gt": mask,
        "batch_idx": np.concatenate(batch_idx) if batch_idx else np.zeros(0, np.int32),
        **({"masks": masks} if has_masks else {}),
        **({"keypoints": kpts} if has_kpts else {}),
        **({"angles": angles} if has_angles else {}),
        "im_file": [it["im_file"] for it in items],
        "ori_shape": [it["ori_shape"] for it in items],
        "ratio_pad": [it["ratio_pad"] for it in items],
        # multi-modal (YOLO-World) items carry a per-image text vocabulary;
        # stays a python list — the trainer embeds + pads it host-side
        **({"texts": [it.get("texts", []) for it in items]}
           if "texts" in items[0] else {}),
    }


class DataLoader:
    """Deterministic shuffled epoch iterator with background prefetch.

    One host core feeds the chip here, so the loader uses a small thread pool
    (cv2 ops release the GIL) with a bounded queue rather than worker
    processes; `reset()` rebuilds the iterator after dataset mutation.
    """

    def __init__(self, dataset: YOLODataset, batch_size: int = 16,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True,
                 max_boxes: Optional[int] = None, prefetch: int = 2,
                 workers: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.max_boxes = max_boxes or dataset.max_boxes()
        self.prefetch = prefetch
        # Decode/augment thread pool width: scale with the host (production
        # TPU hosts have dozens of cores; cv2 releases the GIL), capped so a
        # 1-core dev box is not oversubscribed.
        import os as _os
        # workers=None -> host-scaled default; an explicit 0 means "minimal
        # threading" (one worker), it must not silently re-enable the default.
        self.workers = min(8, (_os.cpu_count() or 1) + 3) if workers is None \
            else max(1, int(workers))
        self.epoch = 0

    def __len__(self):
        return len(self._epoch_batches())

    def _epoch_batches(self) -> list[np.ndarray]:
        """Index batches for one epoch. Rect datasets group by letterbox
        bucket so every batch stacks to one static shape (the reference's
        aspect-ratio-sorted rect batching, TPU-bucketed)."""
        shapes = getattr(self.dataset, "rect_shapes", None)
        rng = np.random.default_rng(self.seed + self.epoch)
        if shapes is not None:
            groups: dict[tuple, list[int]] = {}
            for i, s in enumerate(shapes):
                groups.setdefault(tuple(s), []).append(i)
            batches = []
            for g in groups.values():
                g = np.asarray(g)
                if self.shuffle:
                    rng.shuffle(g)
                batches += [g[i: i + self.batch_size]
                            for i in range(0, len(g), self.batch_size)]
            return batches
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(idx)
        n = len(idx) if not self.drop_last else \
            len(idx) // self.batch_size * self.batch_size
        return [idx[i: i + self.batch_size]
                for i in range(0, n, self.batch_size) if i < n]

    def __iter__(self):
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self.epoch)
        batches = self._epoch_batches()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            # cv2 decode/warp release the GIL, so a small thread pool loads
            # the items of each batch concurrently even on one host core.
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=self.workers) as pool:
                try:
                    for sel in batches:
                        if stop.is_set():
                            return
                        if len(sel) == 0:
                            continue
                        idxs = [int(i) for i in sel]
                        if hasattr(self.dataset, "getitem"):
                            # Batch context: mosaic/mixup partners come from
                            # this batch and share one decode memo, so each
                            # image decodes ~once per batch instead of ~4x
                            # (the reference's recently-loaded buffer
                            # amortization, upstream BaseDataset).
                            memo: dict = {}
                            items = list(pool.map(
                                lambda i: self.dataset.getitem(i, idxs, memo),
                                idxs))
                        else:
                            items = list(pool.map(self.dataset.__getitem__, idxs))
                        if not _put(collate(items, self.max_boxes)):
                            return
                finally:
                    _put(None)

        def _put(item) -> bool:
            """Bounded put that observes `stop` — an abandoned consumer must
            not leave the producer thread blocked forever on a full queue."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
        self.epoch += 1

    def reset(self):
        """Re-arm after dataset mutation (mosaic close); epoch counter keeps."""
        pass  # iteration state is per-__iter__; nothing cached across epochs


class YOLOConcatDataset:
    """Concatenation of datasets sharing the item contract (reference
    train_world.py:64 YOLOConcatDataset). Index space is the datasets laid
    end to end; epoch/mosaic-close/max-boxes fan out to every child."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self._cum = np.cumsum([len(d) for d in self.datasets])
        self.rect_shapes = None          # train-only: square canvas

    def __len__(self):
        return int(self._cum[-1]) if len(self.datasets) else 0

    def __getitem__(self, index: int) -> dict:
        d = int(np.searchsorted(self._cum, index, side="right"))
        j = index - (int(self._cum[d - 1]) if d else 0)
        return self.datasets[d][int(j)]

    def set_epoch(self, epoch: int):
        for d in self.datasets:
            if hasattr(d, "set_epoch"):
                d.set_epoch(epoch)

    def close_mosaic(self):
        for d in self.datasets:
            d.close_mosaic()

    def max_boxes(self, **kw) -> int:
        return max(d.max_boxes(**kw) for d in self.datasets)


def build_grounding(cfg, img_path: str, json_file: str, batch: int,
                    stride: int = 32, seed: int = 0):
    """Grounding-caption dataset from a COCO-grounding JSON (call-site
    contract: reference train_world.py:61)."""
    from yolo_sod_tpu.data.grounding import GroundingDataset

    get = (cfg.get if isinstance(cfg, dict)
           else lambda k, d=None: getattr(cfg, k, d))
    hyp = cfg if isinstance(cfg, dict) else vars(cfg).copy() \
        if hasattr(cfg, "__dict__") else dict(cfg)
    return GroundingDataset(json_file, img_path, imgsz=get("imgsz", 640),
                            hyp=hyp, stride=stride, seed=seed,
                            cache=get("cache", False))


def build_yolo_dataset(cfg, img_path, batch: int, data: dict, mode: str = "train",
                       stride: int = 32, seed: int = 0,
                       task: str = "detect",
                       multi_modal: bool = False) -> YOLODataset:
    """Construct a YOLODataset from the flat cfg namespace (reference contract).

    Pose extras (kpt_shape, flip_idx) come from the dataset yaml dict, the
    reference's coco-pose contract."""
    augment = mode == "train"
    hyp = cfg if isinstance(cfg, dict) else vars(cfg).copy() if hasattr(cfg, "__dict__") else dict(cfg)
    return YOLODataset(
        img_path,
        imgsz=cfg["imgsz"] if isinstance(cfg, dict) else cfg.imgsz,
        augment=augment,
        hyp=hyp,
        # Reference detect/train.py build_dataset: val datasets are rect
        # (aspect-grouped buckets); train stays square for the mosaic canvas.
        rect=(mode == "val") or bool(cfg.get("rect", False) if isinstance(cfg, dict)
                                     else cfg.rect),
        stride=stride,
        single_cls=cfg.get("single_cls", False) if isinstance(cfg, dict) else cfg.single_cls,
        fraction=(cfg.get("fraction", 1.0) if isinstance(cfg, dict) else cfg.fraction) if mode == "train" else 1.0,
        nc=data.get("nc"),
        seed=seed,
        task=task,
        kpt_shape=tuple(data.get("kpt_shape", (17, 3))),
        flip_idx=data.get("flip_idx"),
        cache=(cfg.get("cache", False) if isinstance(cfg, dict)
               else getattr(cfg, "cache", False)),
        multi_modal=multi_modal,
        names=data.get("names"),
    )


def build_dataloader(dataset: YOLODataset, batch: int,
                     workers: Optional[int] = None,
                     shuffle: bool = True, seed: int = 0,
                     max_boxes: Optional[int] = None) -> DataLoader:
    return DataLoader(dataset, batch_size=batch, shuffle=shuffle, seed=seed,
                      drop_last=shuffle, max_boxes=max_boxes, workers=workers)
