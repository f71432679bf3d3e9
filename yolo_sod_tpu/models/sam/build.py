"""SAM model matrix + facade (reference models/sam/build.py:23-66,
model.py:26 SAM).

`build_sam("sam_b")` → SAMModel with the reference's encoder dims;
`SAM("sam_b")` → the user facade: `SAM(...)(img, points=[[x, y]])`.
MobileSAM uses the TinyViT encoder (tiny_encoder.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from yolo_sod_tpu.models.sam.model import SAMModel
from yolo_sod_tpu.models.sam.predict import SAMPredictor

__all__ = ["SAM", "build_sam"]

_CONFIGS = {  # reference build.py:23-118
    "sam_b": dict(encoder="vit_b"),
    "sam_l": dict(encoder="vit_l"),
    "sam_h": dict(encoder="vit_h"),
    "mobile_sam": dict(encoder="tiny"),
    "sam2_t": dict(encoder="sam2"),
    "sam2_s": dict(encoder="sam2"),
    "sam2_b": dict(encoder="sam2"),
    "sam2_l": dict(encoder="sam2"),
}


def build_sam(name: str = "sam_b", img_size: int = 1024, **overrides):
    stem = Path(str(name)).stem.lower().replace("-", "_").replace(".", "_")
    if stem not in _CONFIGS:
        raise ValueError(f"unknown SAM variant '{name}'; "
                         f"choose from {list(_CONFIGS)}")
    cfg = dict(_CONFIGS[stem])
    if cfg["encoder"] == "sam2":
        from yolo_sod_tpu.models.sam.sam2 import SAM2Model

        return SAM2Model(variant=stem, img_size=img_size, **overrides)
    if cfg["encoder"] == "tiny":
        from yolo_sod_tpu.models.sam.tiny_encoder import TinyViT

        enc = TinyViT(img_size=img_size,
                      embed_dims=(64, 128, 160, 320),
                      depths=(2, 2, 6, 2), num_heads=(2, 4, 5, 10),
                      window_sizes=(7, 7, 14, 7),
                      **{k: v for k, v in overrides.items()
                         if k in TinyViT.__dataclass_fields__})
        return SAMModel(img_size=img_size, image_encoder=enc)
    cfg.update(overrides)
    return SAMModel(img_size=img_size, **cfg)


class SAM:
    """SAM user facade (reference model.py:26). Task is always 'segment';
    predict with prompts or everything mode:

        sam = SAM("sam_b")
        res = sam(img, points=[[200, 200]])        # prompted
        res = sam(img)                              # everything mode
    """

    def __init__(self, model: str = "sam_b", img_size: int = 1024,
                 **overrides):
        self.model = build_sam(model, img_size=img_size, **overrides)
        self.task = "segment"
        self.predictor: Optional[SAMPredictor] = None
        self.video_predictor = None

    def predict(self, source=None, stream: bool = False, bboxes=None,
                points=None, labels=None, **kwargs):
        if self.predictor is None:
            self.predictor = SAMPredictor(overrides=kwargs)
            self.predictor.setup_model(self.model)
        return self.predictor(source=source, stream=stream, bboxes=bboxes,
                              points=points, labels=labels, **kwargs)

    def __call__(self, source=None, **kwargs):
        return self.predict(source, **kwargs)

    def track(self, frame, points=None, labels=None, **kwargs):
        """Video object segmentation (SAM2 variants only; reference
        sam/predict.py SAM2VideoPredictor via model.predict(stream=True)).

        First call must carry `points` (+ optional `labels`, default
        foreground) — it prompts the object on a conditioning frame.
        Subsequent calls propagate through the memory bank:

            sam = SAM("sam2_t")
            mask, iou, obj = sam.track(frame0, points=[[x, y]])
            for f in frames:
                mask, iou, obj = sam.track(f)
        """
        from yolo_sod_tpu.models.sam.sam2 import SAM2Model

        if not isinstance(self.model, SAM2Model):
            raise ValueError("video tracking requires a SAM2 variant "
                             "(sam2_t/s/b/l); SAM1 has no memory stack")
        if self.video_predictor is None:
            from yolo_sod_tpu.models.sam.video import SAM2VideoPredictor

            self.video_predictor = SAM2VideoPredictor(self.model, **kwargs)
        vp = self.video_predictor
        if points is not None:
            if labels is None:
                labels = [1] * len(points)
            return vp.add_prompt(frame, points=points, labels=labels)
        if vp.bank is None:
            raise ValueError("first track() call must include `points` to "
                             "prompt the object")
        return vp.track(frame)

    def reset_video(self):
        """Drop the tracked object's memory bank (start a new video)."""
        if self.video_predictor is not None:
            self.video_predictor.reset()

    def info(self):
        return self.model.info()

    @property
    def names(self):
        return self.model.names
