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

    Decodes each level BEFORE concatenating: the level concat then moves
    (4+nc)-channel decoded tensors instead of (4*reg_max+nc)-channel raw
    maps, so XLA never materializes a re-laid-out copy of the big P2 map
    to satisfy the concat's uniform-layout constraint (hlo_bytes found a
    60.6 MB (16,160,160,74) layout copy per batch on the old form).
    Bit-equal to decoding the concatenated maps: make_anchors is a
    per-level concat and every decode op is per-anchor elementwise.
    """
    outs = []
    for f, s in zip(feats, strides):
        b, h, w, no = f.shape
        x = f.reshape(b, h * w, no)
        box_logits, cls_logits = x[..., : 4 * reg_max], x[..., 4 * reg_max:]
        anchors, stride_t = make_anchors([(h, w)], [s])     # (HW,2), (HW,1)
        dist = dfl_expectation(box_logits, reg_max)         # (B, HW, 4)
        boxes = dist2bbox(dist, anchors[None], xywh=xywh) * stride_t[None]
        scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
        outs.append(jnp.concatenate([boxes, scores], axis=-1))
    return jnp.concatenate(outs, axis=1)


def decode_obb(det_maps: Sequence[jax.Array], angle_maps: Sequence[jax.Array],
               strides: Sequence[int], nc: int, reg_max: int = 16):
    """Decode an OBB head's maps into rotated predictions.

    Reference OBB head inference (head.py OBB.decode_bboxes): the DFL ltrb
    expectation decodes through dist2rbox — the (rb-lt)/2 center offset is
    ROTATED by the predicted angle before being added to the anchor — so the
    inference decode matches the training criterion's exactly
    (utils/loss_tasks.OBBLoss).

    Returns:
        (B, A, 5+nc): [cx, cy, w, h (pixels), angle (rad), sigmoid scores].
    """
    from yolo_sod_tpu.ops.boxes import dist2rbox

    b = det_maps[0].shape[0]
    no = 4 * reg_max + nc
    x = jnp.concatenate([f.reshape(b, -1, no) for f in det_maps], axis=1)
    ang = jnp.concatenate([a.reshape(b, -1, 1) for a in angle_maps],
                          axis=1).astype(jnp.float32)
    box_logits, cls_logits = x[..., : 4 * reg_max], x[..., 4 * reg_max:]

    hw = [(f.shape[1], f.shape[2]) for f in det_maps]
    anchors, stride_t = make_anchors(hw, strides)

    dist = dfl_expectation(box_logits, reg_max)
    rboxes = dist2rbox(dist, ang, anchors[None]) * stride_t[None]
    scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    return jnp.concatenate([rboxes, ang, scores], axis=-1)
