"""Grounding-caption detection data for open-vocabulary (YOLO-World) training.

The reference's from-scratch World route consumes COCO-grounding-style JSONs
(flickr30k / GQA "final_mixed" format) via `build_grounding` — the call-site
contract at models/yolo/world/train_world.py:61; the data package that
implemented it is ABSENT from the reference snapshot (SURVEY §1.1), so this
is a contract rebuild:

- `images`: id, file_name, height, width, caption;
- `annotations`: image_id, bbox (COCO top-left xywh pixels),
  `tokens_positive` char spans into the caption naming the grounded phrase.

Each image becomes one detection item whose cls ids index a PER-IMAGE phrase
vocabulary (`texts`), the multi-modal batch contract the WorldTrainer embeds
per batch.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from yolo_sod_tpu.data.dataset import YOLODataset

__all__ = ["GroundingDataset"]


class GroundingDataset(YOLODataset):
    """Per-image phrase-grounded boxes from a COCO-grounding JSON."""

    def __init__(self, json_file: str, img_path: str, imgsz: int = 640,
                 hyp=None, stride: int = 32, seed: int = 0, cache=False,
                 augment: bool = True):
        self.img_path = img_path
        self.json_file = json_file
        self.imgsz = imgsz
        hyp = dict(hyp or {})
        # Per-image vocabularies cannot cross mosaic/mixup tiles: phrase
        # indices from different captions collide. Single-image aug only.
        hyp["mosaic"] = 0.0
        hyp["mixup"] = 0.0
        hyp["copy_paste"] = 0.0
        self.hyp = hyp
        self.augment = augment
        self.rect = False
        self.stride = stride
        self.single_cls = False
        self.nc = None
        self.task = "detect"
        self.mask_ratio = 4
        self.kpt_shape = (17, 3)
        self.flip_idx = None
        self.segments = None
        self.kpts = None
        self.multi_modal = True
        self.names = None

        with open(json_file) as f:
            ann = json.load(f)
        imgs = {im["id"]: im for im in ann.get("images", [])}
        per: dict = {}
        for a in ann.get("annotations", []):
            if a.get("iscrowd"):
                continue
            per.setdefault(a["image_id"], []).append(a)

        self.im_files, self.labels, self.texts = [], [], []
        for img_id, anns in per.items():
            im = imgs.get(img_id)
            if im is None:
                continue
            H, W = float(im["height"]), float(im["width"])
            cap = im.get("caption", "")
            cat2id: dict = {}
            texts: list = []
            rows: list = []
            for a in anns:
                spans = a.get("tokens_positive") or []
                phrase = " ".join(cap[s:e] for s, e in spans).strip() \
                    or (cap.strip() or "object")
                if phrase not in cat2id:
                    cat2id[phrase] = len(texts)
                    texts.append(phrase)
                x, y, w, h = a["bbox"]
                if w <= 0 or h <= 0:
                    continue
                rows.append([cat2id[phrase], (x + w / 2) / W, (y + h / 2) / H,
                             w / W, h / H])
            if not rows:
                continue
            self.im_files.append(str(Path(img_path) / im["file_name"]))
            self.labels.append(np.asarray(rows, np.float32))
            self.texts.append(texts)
        self.label_files = []
        self.seed = seed
        self._post_init(cache)

    def _item_texts(self, index: int) -> list:
        return self.texts[index]
