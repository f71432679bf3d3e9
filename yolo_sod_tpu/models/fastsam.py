"""FastSAM: prompt-able segment-anything via a single-class YOLO-seg model.

Capability parity with reference models/fastsam/ (model.py:11 FastSAM,
predict.py:14 FastSAMPredictor, utils.py:4 adjust_bboxes_to_image_border,
val.py:7 FastSAMValidator). The model itself is `fastsam.yaml` (a YOLOv8-seg
graph with nc=1 — the reference ships it inside FastSAM-{s,x}.pt).

Prompt selection is array-first numpy on the host (it filters a handful of
Results after the fused device pipeline); the everything-mode forward runs
the standard jitted segment pipeline unchanged.

Text prompts need a joint image-text embedding space: provision a local CLIP
checkpoint via YOLO_SOD_CLIP_PATH (utils/text_embed.CLIPTextEmbedder) — the
reference downloads ViT-B/32 at runtime (predict.py:133-139), which a
zero-egress deployment cannot.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import cv2
import numpy as np

from yolo_sod_tpu.engine.model import Model
from yolo_sod_tpu.engine.predict_tasks import SegmentationPredictor
from yolo_sod_tpu.engine.results import Results
from yolo_sod_tpu.engine.validator_tasks import SegmentationValidator

__all__ = ["FastSAM", "FastSAMPredictor", "FastSAMValidator",
           "adjust_bboxes_to_image_border"]


def adjust_bboxes_to_image_border(boxes: np.ndarray, image_shape,
                                  threshold: int = 20) -> np.ndarray:
    """Snap near-border box edges onto the border (reference fastsam/utils.py:4)."""
    h, w = image_shape
    out = boxes.copy()
    out[out[:, 0] < threshold, 0] = 0
    out[out[:, 1] < threshold, 1] = 0
    out[out[:, 2] > w - threshold, 2] = w
    out[out[:, 3] > h - threshold, 3] = h
    return out


def scale_masks_np(masks: np.ndarray, orig_shape, imgsz: int,
                   scaleup: bool = False) -> np.ndarray:
    """Un-letterbox proto-resolution masks to original-image pixels.

    Inverts the predictor's letterbox (data/augment.letterbox_np semantics,
    scaleup=False, centered) in mask space: crop the pad, resize to
    (h0, w0). Reference analog: utils/ops.scale_masks.
    """
    if masks.size == 0:
        return np.zeros((0, *orig_shape), bool)
    n, mh, mw = masks.shape
    h0, w0 = orig_shape
    s = mh / imgsz                                # proto cells per input pixel
    r = min(imgsz / h0, imgsz / w0)
    if not scaleup:
        r = min(r, 1.0)
    dw = (imgsz - round(w0 * r)) / 2 * s
    dh = (imgsz - round(h0 * r)) / 2 * s
    x0, y0 = int(round(dw - 0.1)), int(round(dh - 0.1))
    x1, y1 = mw - int(round(dw + 0.1)), mh - int(round(dh + 0.1))
    crop = masks[:, y0:y1, x0:x1].astype(np.uint8)
    out = np.stack([cv2.resize(m, (w0, h0), interpolation=cv2.INTER_NEAREST)
                    for m in crop])
    return out.astype(bool)


class FastSAMPredictor(SegmentationPredictor):
    """Everything-mode segmentation + prompt-based selection
    (reference fastsam/predict.py:14)."""

    def __init__(self, overrides: Optional[dict] = None):
        super().__init__(overrides=overrides)
        self.prompts: dict = {}

    def set_prompts(self, prompts: dict):
        """Stage prompts for the next call (reference predict.py:148)."""
        self.prompts = {k: v for k, v in (prompts or {}).items() if v is not None}

    def stream_inference(self, source):
        bboxes = self.prompts.pop("bboxes", None)
        points = self.prompts.pop("points", None)
        labels = self.prompts.pop("labels", None)
        texts = self.prompts.pop("texts", None)
        for result in super().stream_inference(source):
            h0, w0 = result.orig_shape
            if len(result):
                # Near-full-frame detections become exact full-frame
                # (reference predict.py:36-43).
                d = result.boxes.data
                adj = adjust_bboxes_to_image_border(d[:, :4], (h0, w0))
                full = np.array([0.0, 0.0, w0, h0])
                inter = (np.minimum(adj[:, 2:], full[2:]) -
                         np.maximum(adj[:, :2], full[:2])).clip(0).prod(-1)
                area = (adj[:, 2] - adj[:, 0]) * (adj[:, 3] - adj[:, 1])
                iou = inter / (area + w0 * h0 - inter + 1e-9)
                adj[iou > 0.9] = full
                d[:, :4] = adj
            yield self._prompt(result, bboxes, points, labels, texts)

    # -- prompt selection ----------------------------------------------------
    def _prompt(self, result: Results, bboxes=None, points=None, labels=None,
                texts=None) -> Results:
        """Select the masks matching the prompts (reference predict.py:47-120)."""
        if (bboxes is None and points is None and texts is None) or not len(result):
            return result
        masks = scale_masks_np(np.asarray(result.masks.data), result.orig_shape,
                               int(self.args.imgsz or 640))
        n = len(result)
        idx = np.zeros(n, bool)
        if bboxes is not None:
            b = np.atleast_2d(np.asarray(bboxes, np.int32))
            full_areas = masks.sum((1, 2))                         # (n,)
            box_areas = (b[:, 3] - b[:, 1]) * (b[:, 2] - b[:, 0])  # (k,)
            in_box = np.stack([masks[:, bb[1]:bb[3], bb[0]:bb[2]].sum((1, 2))
                               for bb in b])                       # (k, n)
            union = box_areas[:, None] + full_areas[None] - in_box
            idx[np.argmax(in_box / np.maximum(union, 1e-9), axis=1)] = True
        if points is not None:
            p = np.atleast_2d(np.asarray(points, np.int32))
            lab = np.ones(len(p), np.int32) if labels is None \
                else np.atleast_1d(np.asarray(labels, np.int32))
            assert len(lab) == len(p), \
                f"labels ({len(lab)}) must match points ({len(p)})"
            # All-negative points mean "keep everything except what they hit".
            point_idx = np.full(n, bool(lab.sum() == 0))
            for (px, py), l in zip(p, lab):
                hit = masks[:, int(py), int(px)].astype(bool)
                point_idx[hit] = bool(l)
            idx |= point_idx
        if texts is not None:
            sim = self._text_similarity(result, masks, [texts] if
                                        isinstance(texts, str) else list(texts))
            idx[np.argmax(sim, axis=-1)] = True
        return result[idx]

    def _text_similarity(self, result: Results, masks: np.ndarray,
                         texts: List[str]) -> np.ndarray:
        """(M texts, n regions) CLIP similarity over box crops
        (reference predict.py:102-116 + _clip_inference)."""
        from yolo_sod_tpu.utils.text_embed import CLIPTextEmbedder

        if not hasattr(self, "_clip"):
            path = os.environ.get("YOLO_SOD_CLIP_PATH")
            if not path or not os.path.isdir(path):
                raise RuntimeError(
                    "FastSAM text prompts need a local CLIP checkpoint: set "
                    "YOLO_SOD_CLIP_PATH to a transformers CLIP directory "
                    "(zero-egress deployments cannot download ViT-B/32)")
            self._clip = CLIPTextEmbedder(path)
        h0, w0 = result.orig_shape

        def _gather(min_area: int):
            crops, keep = [], []
            for i, bb in enumerate(result.boxes.xyxy.astype(int)):
                if masks[i].sum() <= min_area:   # tiny fragments are noise
                    continue
                x1 = min(max(int(bb[0]), 0), w0 - 1)
                y1 = min(max(int(bb[1]), 0), h0 - 1)
                x2 = min(max(int(bb[2]), x1 + 1), w0)
                y2 = min(max(int(bb[3]), y1 + 1), h0)
                crops.append(result.orig_img[y1:y2, x1:x2, ::-1])  # BGR→RGB
                keep.append(i)
            return crops, keep

        crops, keep = _gather(100)
        if not crops:
            # Every region is a tiny fragment — score them all rather than
            # crash in CLIP on an empty batch (and rather than let the -1e9
            # placeholder rows make argmax silently pick region 0).
            crops, keep = _gather(-1)
        sim_kept = self._clip.image_text_similarity(crops, texts)  # (M, len(keep))
        sim = np.full((len(texts), len(result)), -np.inf, np.float32)
        sim[:, keep] = sim_kept
        return sim


class FastSAMValidator(SegmentationValidator):
    """Segment validation with plots disabled (reference fastsam/val.py:7)."""

    def __init__(self, args=None, **kwargs):
        super().__init__(args=args, **kwargs)
        if self.args is not None:
            self.args.plots = False


class FastSAM(Model):
    """FastSAM facade (reference fastsam/model.py:11).

    Example:
        model = FastSAM("fastsam-s.yaml")
        results = model.predict(img, bboxes=[[100, 100, 300, 300]])
    """

    def __init__(self, model: str = "fastsam-s.yaml", verbose: bool = False):
        super().__init__(model=model, task="segment", verbose=verbose)

    @property
    def task_map(self) -> dict:
        from yolo_sod_tpu.engine.trainer_tasks import SegmentationTrainer
        from yolo_sod_tpu.nn.tasks import SegmentationModel

        return {"segment": {"model": SegmentationModel,
                            "trainer": SegmentationTrainer,
                            "validator": FastSAMValidator,
                            "predictor": FastSAMPredictor}}

    def predict(self, source=None, stream: bool = False, bboxes=None,
                points=None, labels=None, texts=None, **kwargs):
        """Everything-mode unless prompts narrow it (reference model.py:31-50)."""
        out = super().predict(source, stream=True, **kwargs)
        self.predictor.set_prompts(dict(bboxes=bboxes, points=points,
                                        labels=labels, texts=texts))
        return out if stream else list(out)
