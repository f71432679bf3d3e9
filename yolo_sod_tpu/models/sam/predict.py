"""SAM predictor: promptable + everything-mode segmentation.

Reference models/sam/predict.py:37 (Predictor) and :297 (generate). TPU-first
choices:
- prompt rows are a single static-shape (B, P, 2)+(B, P) tensor pair, padded
  to a small set of P buckets → one compiled decode graph per bucket;
- everything-mode decodes the point grid in FIXED-size chunks whose entire
  filter chain (stability score, thresholding, mask→box) runs on device
  (amg.py jnp helpers); the host only concatenates survivors and runs the
  final few-hundred-box NMS;
- chunk masks stay at the decoder's low resolution (img_size/4) through
  filtering — 16× less HBM/host traffic than the reference's interpolate-
  then-filter order (predict.py:357) — and only post-NMS survivors upscale.
"""

from __future__ import annotations

import math
from typing import List, Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from yolo_sod_tpu.cfg import DEFAULT_CFG_DICT, get_cfg
from yolo_sod_tpu.engine.predictor import load_source
from yolo_sod_tpu.engine.results import Results
from yolo_sod_tpu.models.sam import amg
from yolo_sod_tpu.models.sam.model import SAMModel

_P_BUCKETS = (4, 8, 16, 32, 64)


def _bucket(n: int) -> int:
    for b in _P_BUCKETS:
        if n <= b:
            return b
    return int(2 ** math.ceil(math.log2(n)))


class SAMPredictor:
    """Promptable predictor over a SAMModel (reference predict.py:37)."""

    def __init__(self, model: Optional[SAMModel] = None,
                 overrides: Optional[dict] = None):
        self.args = get_cfg(DEFAULT_CFG_DICT, overrides or {})
        self.model = model
        self.features = None
        self._im_meta = None          # (orig_shape, ratio)
        self.segment_all = False
        self._jit: dict = {}

    def setup_model(self, model: SAMModel):
        self.model = model
        if model.variables is None:
            model.init()

    # -- image lifecycle -----------------------------------------------------
    def set_image(self, image: np.ndarray):
        """Encode one BGR/RGB uint8 image; later prompt calls reuse the
        features (reference predict.py:520)."""
        x, r = self.model.preprocess_np(image)
        self.features = self.model.encode_image(self.model.variables,
                                                jnp.asarray(x))
        self._im_meta = (image.shape[:2], r)

    def reset_image(self):
        self.features, self._im_meta = None, None

    # -- prompted inference --------------------------------------------------
    def _prepare_rows(self, bboxes, points, labels, r: float):
        """Unify prompts into (N, P, 2) points + (N, P) labels rows, one row
        per output mask (reference _prepare_prompts predict.py:255 + the
        prompt-encoder pad rule encoders.py:276-281)."""
        rows_p, rows_l = [], []
        if points is not None:
            pts = np.asarray(points, np.float32) * r
            if pts.ndim == 1:
                pts = pts[None]
            if pts.ndim == 2:
                pts = pts[:, None, :]                       # (N, 1, 2)
            lbl = np.ones(pts.shape[:2], np.int32) if labels is None \
                else np.atleast_2d(np.asarray(labels, np.int32))
            if lbl.shape != pts.shape[:2]:
                lbl = lbl.reshape(pts.shape[:2])
        else:
            pts = lbl = None
        if bboxes is not None:
            b = np.atleast_2d(np.asarray(bboxes, np.float32)) * r
            corners = b.reshape(-1, 2, 2)                   # (N, 2, 2)
            clbl = np.tile(np.array([[2, 3]], np.int32), (len(b), 1))
            if pts is not None and len(pts) == len(b):
                rows_p = np.concatenate([pts, corners], 1)
                rows_l = np.concatenate([lbl, clbl], 1)
            elif pts is not None:
                raise ValueError("bboxes and points row counts must match "
                                 "when combined")
            else:
                rows_p, rows_l = corners, clbl
        elif pts is not None:
            # pad point (label -1) appended when no box (encoders.py:276-281)
            rows_p = np.concatenate([pts, np.zeros((len(pts), 1, 2),
                                                   np.float32)], 1)
            rows_l = np.concatenate([lbl, -np.ones((len(pts), 1),
                                                   np.int32)], 1)
        else:
            raise ValueError("SAM needs bboxes and/or points prompts "
                             "(or use generate() for everything mode)")
        N, P = rows_l.shape
        Pb = _bucket(P)
        pad_p = np.zeros((N, Pb - P, 2), np.float32)
        pad_l = -np.ones((N, Pb - P), np.int32)
        return (np.concatenate([rows_p, pad_p], 1),
                np.concatenate([rows_l, pad_l], 1))

    def prompt_inference(self, bboxes=None, points=None, labels=None,
                         multimask_output: bool = False):
        """Prompts → (masks bool (N*m, h0, w0), scores (N*m,)) against the
        image staged by set_image (reference predict.py:207)."""
        assert self.features is not None, "call set_image() first"
        (h0, w0), r = self._im_meta
        rows_p, rows_l = self._prepare_rows(bboxes, points, labels, r)
        masks, iou = self.model.decode(
            self.model.variables, self.features, jnp.asarray(rows_p),
            jnp.asarray(rows_l), multimask_output=multimask_output)
        S = self.model.img_size
        lowres = np.asarray(jax.device_get(masks))          # (N, m, S/4, S/4)
        scores = np.asarray(jax.device_get(iou)).reshape(-1)
        lowres = lowres.reshape(-1, *lowres.shape[2:])
        # Un-pad + upscale to the original image (reference postprocess
        # :444-470: interpolate → crop padded area → interpolate to orig).
        nh, nw = round(h0 * r), round(w0 * r)
        ch = max(1, round(lowres.shape[1] * nh / S))
        cw = max(1, round(lowres.shape[2] * nw / S))
        out = np.stack([
            cv2.resize(m[:ch, :cw], (w0, h0), interpolation=cv2.INTER_LINEAR)
            for m in lowres])
        return out > 0.0, scores

    # -- everything mode -----------------------------------------------------
    def _chunk_fn(self, chunk: int):
        """Jitted grid-chunk decode + on-device filter metrics."""
        key = ("chunk", chunk)
        if key not in self._jit:
            model = self.model

            @jax.jit
            def fn(variables, features, pts):
                P = pts.shape[0]
                rows_p = jnp.concatenate(
                    [pts[:, None, :], jnp.zeros((P, 1, 2), jnp.float32)], 1)
                rows_l = jnp.concatenate(
                    [jnp.ones((P, 1), jnp.int32),
                     -jnp.ones((P, 1), jnp.int32)], 1)
                masks, iou = model._raw_decode(variables, features,
                                               rows_p, rows_l,
                                               multimask_output=True)
                masks = masks.reshape(-1, *masks.shape[2:])   # (P*3, s, s)
                iou = iou.reshape(-1)
                stab = amg.calculate_stability_score(masks, 0.0, 0.95)
                binm = masks > 0.0
                boxes = amg.batched_mask_to_box(binm)
                return binm, iou, stab, boxes
            self._jit[key] = fn
        return self._jit[key]

    def generate(self, image: np.ndarray, crop_n_layers: int = 0,
                 crop_overlap_ratio: float = 512 / 1500,
                 crop_downscale_factor: int = 1, point_grids=None,
                 points_stride: int = 32, points_batch_size: int = 64,
                 conf_thres: float = 0.88,
                 stability_score_thresh: float = 0.95,
                 crop_nms_thresh: float = 0.7):
        """Segment everything (reference predict.py:297). Returns
        (masks bool (N, h0, w0), scores (N,), boxes (N, 4) in orig pixels)."""
        self.segment_all = True
        h0, w0 = image.shape[:2]
        S = self.model.img_size
        s4 = S // 4                                     # low-res mask side
        crops, layer_idxs = amg.generate_crop_boxes((h0, w0), crop_n_layers,
                                                    crop_overlap_ratio)
        if point_grids is None:
            point_grids = amg.build_all_layer_point_grids(
                points_stride, crop_n_layers, crop_downscale_factor)
        all_m, all_b, all_s, all_a = [], [], [], []
        for crop, layer in zip(crops, layer_idxs):
            x1, y1, x2, y2 = crop
            cw, ch = x2 - x1, y2 - y1
            crop_im = cv2.resize(image[y1:y2, x1:x2], (S, S),
                                 interpolation=cv2.INTER_LINEAR)
            x = ((crop_im.astype(np.float32)
                  - np.array([123.675, 116.28, 103.53], np.float32))
                 / np.array([58.395, 57.12, 57.375], np.float32))
            feats = self.model.encode_image(self.model.variables,
                                            jnp.asarray(x[None]))
            grid = point_grids[layer] * S                # model-input pixels
            fn = self._chunk_fn(points_batch_size)
            cm, cb, cs = [], [], []
            for i in range(0, len(grid), points_batch_size):
                pts = grid[i:i + points_batch_size]
                n_real = len(pts)
                if n_real < points_batch_size:           # static chunk shape
                    pts = np.concatenate(
                        [pts, np.tile(pts[-1:],
                                      (points_batch_size - n_real, 1))])
                binm, iou, stab, boxes = fn(self.model.variables, feats,
                                            jnp.asarray(pts, jnp.float32))
                binm, iou, stab, boxes = (np.asarray(jax.device_get(t))
                                          for t in (binm, iou, stab, boxes))
                valid = np.zeros(len(iou), bool)
                valid[: n_real * 3] = True
                keep = valid & (iou > conf_thres) & \
                    (stab > stability_score_thresh)
                if not keep.any():
                    continue
                # boxes: low-res cells → crop pixels
                bx = boxes[keep] * np.array([cw / s4, ch / s4] * 2,
                                            np.float32)
                edge = amg.is_box_near_crop_edge(bx, crop, [0, 0, w0, h0])
                if edge.all():
                    continue
                cm.append(binm[keep][~edge])
                cb.append(bx[~edge])
                cs.append(iou[keep][~edge])
            if not cm:
                continue
            cm = np.concatenate(cm)
            cb = np.concatenate(cb)
            cs = np.concatenate(cs)
            k = amg.nms_greedy(cb, cs, float(self.args.iou or 0.7))
            # low-res masks → crop pixels → uncrop into the full frame
            mk = np.stack([cv2.resize(m.astype(np.uint8), (cw, ch),
                                      interpolation=cv2.INTER_NEAREST)
                           for m in cm[k]]).astype(bool)
            all_m.append(amg.uncrop_masks(mk, crop, h0, w0))
            all_b.append(amg.uncrop_boxes_xyxy(cb[k], crop))
            all_s.append(cs[k])
            all_a.append(np.full(len(k), cw * ch, np.float32))
        if not all_m:
            z = np.zeros
            return z((0, h0, w0), bool), z((0,), np.float32), z((0, 4), np.float32)
        masks = np.concatenate(all_m)
        boxes = np.concatenate(all_b)
        scores = np.concatenate(all_s)
        areas = np.concatenate(all_a)
        if len(crops) > 1:                # dedupe across crops by 1/area score
            k = amg.nms_greedy(boxes, 1.0 / areas, crop_nms_thresh)
            masks, boxes, scores = masks[k], boxes[k], scores[k]
        return masks, scores, boxes

    # -- Results pipeline ----------------------------------------------------
    def __call__(self, source=None, stream: bool = False, bboxes=None,
                 points=None, labels=None, multimask_output: bool = False,
                 **kwargs):
        gen = self._stream(source, bboxes, points, labels, multimask_output)
        return gen if stream else list(gen)

    def _stream(self, source, bboxes, points, labels, multimask_output):
        for path, im0 in load_source(source,
                                     vid_stride=self.args.vid_stride or 1):
            self.set_image(im0)
            if bboxes is None and points is None:
                masks, scores, boxes = self.generate(
                    im0, points_stride=int(getattr(self.args, "points_stride",
                                                   0) or 32))
            else:
                masks, scores = self.prompt_inference(
                    bboxes, points, labels, multimask_output)
                boxes = np.asarray(jax.device_get(
                    amg.batched_mask_to_box(jnp.asarray(masks))))
            det = np.concatenate(
                [boxes, scores[:, None],
                 np.zeros((len(scores), 1), np.float32)], -1)
            yield Results(im0, path, {0: "object"}, boxes=det, masks=masks)
            self.reset_image()
