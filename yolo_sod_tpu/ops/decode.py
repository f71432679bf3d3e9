"""Detect-head decode: per-level maps → (B, A, 4+nc) boxes+scores, inside jit.

TPU-native analog of reference Detect._inference (head.py:100-131) + DFL
(block.py:64-84): anchors are trace-time constants from static shapes, the
DFL expectation is a closed-form softmax·arange einsum, and the whole decode
fuses into the same XLA graph as the backbone.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from yolo_sod_tpu.ops.boxes import dist2bbox, make_anchors


def dfl_expectation(box_logits, reg_max: int = 16):
    """(…, 4*reg_max) DFL logits → (…, 4) ltrb distances via softmax expectation."""
    shape = box_logits.shape
    x = box_logits.reshape(*shape[:-1], 4, reg_max)
    probs = jax.nn.softmax(x.astype(jnp.float32), axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.einsum("...fc,c->...f", probs, bins)


def decode_detections(feats: Sequence[jax.Array], strides: Sequence[int],
                      nc: int, reg_max: int = 16, xywh: bool = True):
    """Decode raw per-level head maps into concatenated predictions.

    Args:
        feats: list of (B, H, W, 4*reg_max+nc) NHWC maps, one per level.
        strides: per-level strides (trace-time constants).
        nc: number of classes.
        xywh: output xywh (True, reference default) or xyxy boxes.

    Returns:
        (B, A, 4+nc): decoded boxes in input-image pixels + sigmoid class scores.
    """
    b = feats[0].shape[0]
    no = 4 * reg_max + nc
    flat = [f.reshape(b, -1, no) for f in feats]
    x = jnp.concatenate(flat, axis=1)                       # (B, A, no)
    box_logits, cls_logits = x[..., : 4 * reg_max], x[..., 4 * reg_max:]

    hw = [(f.shape[1], f.shape[2]) for f in feats]
    anchors, stride_t = make_anchors(hw, strides)           # (A,2), (A,1)

    dist = dfl_expectation(box_logits, reg_max)             # (B, A, 4)
    boxes = dist2bbox(dist, anchors[None], xywh=xywh) * stride_t[None]
    scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    return jnp.concatenate([boxes, scores], axis=-1)
