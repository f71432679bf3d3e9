"""On-device, jit-safe, fixed-shape non-max suppression.

TPU-native replacement for the reference CPU round-trip
(utils/ops.py:167-316 — python per-image loop + torchvision.ops.nms C++/CUDA
kernel). Everything here is static-shape: candidates are pre-top-k'd to
`max_nms`, greedy suppression runs as a lax.scan of exactly `max_det` steps
(exact greedy NMS semantics — same selection order as torchvision for
distinct scores), and the output is a padded (B, max_det, 6) tensor plus a
per-image valid count. The whole thing lives inside the same jitted graph as
the model, so batched inference never leaves the device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from yolo_sod_tpu.ops.boxes import xywh2xyxy

# Class-separation offset for class-aware NMS (reference ops.py:289 uses
# max_wh=7680 to offset boxes per class so cross-class pairs never overlap).
MAX_WH = 7680.0


def _greedy_nms_single(off_boxes, out_boxes, scores, classes, iou_thres: float,
                       max_det: int, conf_thres: float):
    """Exact greedy NMS for one image over a fixed-size candidate set.

    Args:
        off_boxes: (N, 4) xyxy used for suppression (class-offset unless agnostic).
        out_boxes: (N, 4) xyxy emitted in the result.
        scores: (N,) confidence; invalid candidates must be < conf_thres.
        classes: (N,) float class ids.

    Returns:
        det: (max_det, 6) [x1, y1, x2, y2, conf, cls] (zero-padded),
        n_valid: () int32 count of valid rows.
    """
    neg = jnp.float32(-1.0)
    areas = jnp.clip(off_boxes[:, 2] - off_boxes[:, 0], 0) * \
        jnp.clip(off_boxes[:, 3] - off_boxes[:, 1], 0)

    def step(s, _):
        j = jnp.argmax(s)
        sj = s[j]
        valid = sj >= conf_thres
        bj = off_boxes[j]
        x1 = jnp.maximum(bj[0], off_boxes[:, 0])
        y1 = jnp.maximum(bj[1], off_boxes[:, 1])
        x2 = jnp.minimum(bj[2], off_boxes[:, 2])
        y2 = jnp.minimum(bj[3], off_boxes[:, 3])
        inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
        area_j = jnp.clip(bj[2] - bj[0], 0) * jnp.clip(bj[3] - bj[1], 0)
        iou = inter / (area_j + areas - inter + 1e-7)
        s = jnp.where(iou > iou_thres, neg, s).at[j].set(neg)
        return s, (j, sj, valid)

    _, (idx, sel_scores, valids) = jax.lax.scan(step, scores, None, length=max_det)
    valid_f = valids.astype(jnp.float32)[:, None]
    det = jnp.concatenate(
        [out_boxes[idx] * valid_f, sel_scores[:, None] * valid_f,
         classes[idx][:, None] * valid_f],
        axis=-1,
    )
    return det, valids.sum().astype(jnp.int32)


def non_max_suppression(
    preds,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    classes=None,
    agnostic: bool = False,
    multi_label: bool = False,
    max_det: int = 300,
    max_nms: int = 4096,
    nc: int | None = None,
):
    """Batched fixed-shape NMS over decoded predictions.

    Args:
        preds: (B, A, 4+nc) — xywh boxes + per-class sigmoid scores
            (output of ops.decode.decode_detections).
        classes: optional list[int]; restrict to these class ids.
        multi_label: emit one candidate per (anchor, class) above threshold
            (val-mode semantics, reference detect/val.py postprocess);
            otherwise best-class-per-anchor (predict-mode).
        max_nms: candidate pool size entering greedy suppression
            (reference caps at 30000; 4096 covers conf>0.001 VisDrone loads).

    Returns:
        det: (B, max_det, 6) [x1, y1, x2, y2, conf, cls], zero-padded.
        n_valid: (B,) int32 valid counts.
    """
    B, A, no = preds.shape
    nc = nc or no - 4
    boxes = xywh2xyxy(preds[..., :4].astype(jnp.float32))
    scores = preds[..., 4: 4 + nc].astype(jnp.float32)

    if classes is not None:
        keep = jnp.zeros((nc,), bool).at[jnp.asarray(classes)].set(True)
        scores = jnp.where(keep[None, None, :], scores, 0.0)

    if multi_label:
        # One candidate per (anchor, class): flatten to A*nc.
        flat = scores.reshape(B, A * nc)
        cls_ids = jnp.tile(jnp.arange(nc, dtype=jnp.float32), (A,))
        k = min(max_nms, A * nc)
        top_scores, top_idx = jax.lax.top_k(flat, k)
        anchor_idx = top_idx // nc
        cand_cls = cls_ids[top_idx]
        cand_boxes = jnp.take_along_axis(boxes, anchor_idx[..., None], axis=1)
    else:
        best = scores.max(-1)
        best_cls = scores.argmax(-1).astype(jnp.float32)
        k = min(max_nms, A)
        top_scores, top_idx = jax.lax.top_k(best, k)
        cand_cls = jnp.take_along_axis(best_cls, top_idx, axis=1)
        cand_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)

    # Mark below-threshold candidates invalid.
    top_scores = jnp.where(top_scores >= conf_thres, top_scores, -1.0)

    offset_cls = jnp.zeros_like(cand_cls) if agnostic else cand_cls
    off_boxes = cand_boxes + (offset_cls * MAX_WH)[..., None]

    nms_fn = partial(_greedy_nms_single, iou_thres=iou_thres, max_det=max_det,
                     conf_thres=conf_thres)
    return jax.vmap(nms_fn)(off_boxes, cand_boxes, top_scores, cand_cls)
