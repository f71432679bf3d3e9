"""Automatic mask generation helpers (reference models/sam/amg.py:1-193).

Device-friendly pieces (stability score, mask→box) are jnp and run inside
the chunked decode graph; bookkeeping (crop boxes, grids, NMS over a few
hundred boxes) is host numpy.
"""

from __future__ import annotations

import math
from itertools import product
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


def build_point_grid(n_per_side: int) -> np.ndarray:
    """(n², 2) xy grid in [0,1]² at cell centers (reference amg.py:78)."""
    offset = 1 / (2 * n_per_side)
    pts = np.linspace(offset, 1 - offset, n_per_side, dtype=np.float32)
    x, y = np.meshgrid(pts, pts)
    return np.stack([x.ravel(), y.ravel()], axis=-1)


def build_all_layer_point_grids(n_per_side: int, n_layers: int,
                                scale_per_layer: int) -> List[np.ndarray]:
    """Per-crop-layer grids (reference amg.py:86)."""
    return [build_point_grid(int(n_per_side / (scale_per_layer ** i)))
            for i in range(n_layers + 1)]


def generate_crop_boxes(im_size: Tuple[int, int], n_layers: int,
                        overlap_ratio: float):
    """All crop windows per layer, xyxy + layer index (reference amg.py:92)."""
    crop_boxes, layer_idxs = [[0, 0, im_size[1], im_size[0]]], [0]
    h, w = im_size
    short = min(h, w)
    for layer in range(n_layers):
        n_crops = 2 ** (layer + 1)
        overlap = int(overlap_ratio * short * (2 / n_crops))

        def side(orig, n):
            return int(math.ceil((overlap * (n - 1) + orig) / n))

        cw, ch = side(w, n_crops), side(h, n_crops)
        x0s = [int((cw - overlap) * i) for i in range(n_crops)]
        y0s = [int((ch - overlap) * i) for i in range(n_crops)]
        for x0, y0 in product(x0s, y0s):
            crop_boxes.append([x0, y0, min(x0 + cw, w), min(y0 + ch, h)])
            layer_idxs.append(layer + 1)
    return crop_boxes, layer_idxs


def calculate_stability_score(masks: jnp.ndarray, mask_threshold: float,
                              offset: float) -> jnp.ndarray:
    """IoU between ±offset thresholdings of the logits (reference amg.py:140).
    masks: (..., H, W) logits."""
    hi = (masks > (mask_threshold + offset)).sum((-1, -2), dtype=jnp.int32)
    lo = (masks > (mask_threshold - offset)).sum((-1, -2), dtype=jnp.int32)
    return hi / jnp.maximum(lo, 1)


def batched_mask_to_box(masks: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) bool → (..., 4) xyxy; empty masks → [0,0,0,0]
    (reference amg.py:161). Pure reduces — no host sync."""
    H, W = masks.shape[-2:]
    any_x = masks.any(-2)                      # (..., W)
    any_y = masks.any(-1)                      # (..., H)
    xs = jnp.arange(W)
    ys = jnp.arange(H)
    x1 = jnp.min(jnp.where(any_x, xs, W), -1)
    x2 = jnp.max(jnp.where(any_x, xs, -1), -1)
    y1 = jnp.min(jnp.where(any_y, ys, H), -1)
    y2 = jnp.max(jnp.where(any_y, ys, -1), -1)
    empty = ~masks.any((-1, -2))
    box = jnp.stack([x1, y1, x2 + 1, y2 + 1], -1).astype(jnp.float32)
    return jnp.where(empty[..., None], 0.0, box)


def is_box_near_crop_edge(boxes: np.ndarray, crop_box, orig_box,
                          atol: float = 20.0) -> np.ndarray:
    """True where a box touches the crop edge but not the image edge
    (reference amg.py:17)."""
    crop = np.asarray(crop_box, np.float32)
    orig = np.asarray(orig_box, np.float32)
    b = boxes.astype(np.float32) + np.r_[crop[:2], crop[:2]]
    near_crop = np.isclose(b, np.r_[crop][None], atol=atol)
    near_img = np.isclose(b, np.r_[orig][None], atol=atol)
    return (near_crop & ~near_img).any(-1)


def uncrop_boxes_xyxy(boxes: np.ndarray, crop_box) -> np.ndarray:
    x0, y0 = crop_box[0], crop_box[1]
    return boxes + np.array([x0, y0, x0, y0], boxes.dtype)


def uncrop_masks(masks: np.ndarray, crop_box, h: int, w: int) -> np.ndarray:
    x0, y0, x1, y1 = crop_box
    if (x0, y0, x1, y1) == (0, 0, w, h):
        return masks
    out = np.zeros((len(masks), h, w), masks.dtype)
    out[:, y0:y1, x0:x1] = masks[:, : y1 - y0, : x1 - x0]
    return out


def nms_greedy(boxes: np.ndarray, scores: np.ndarray,
               iou_thres: float) -> np.ndarray:
    """Greedy IoU NMS on the host (a few hundred boxes — bookkeeping, not a
    hot path; the device pipeline's fixed-shape NMS lives in ops/nms.py)."""
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(a[i] + a[rest] - inter, 1e-9)
        order = rest[iou <= iou_thres]
    return np.asarray(keep, np.int64)


def remove_small_regions(mask: np.ndarray, area_thresh: float,
                         mode: str) -> Tuple[np.ndarray, bool]:
    """Drop/fill small connected regions via cv2 (reference predict.py:571)."""
    import cv2

    assert mode in {"holes", "islands"}
    correct_holes = mode == "holes"
    working = (correct_holes ^ mask).astype(np.uint8)
    n_labels, regions, stats, _ = cv2.connectedComponentsWithStats(working, 8)
    sizes = stats[:, -1][1:]
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask, False
    fill = [0, *small]
    if not correct_holes:
        fill = [i for i in range(n_labels) if i not in fill] or \
            [int(np.argmax(sizes)) + 1]
    return np.isin(regions, fill), True
