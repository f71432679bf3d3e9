"""On-device ops: box algebra, decode, NMS, letterbox (all jit-safe)."""

from yolo_sod_tpu.ops.boxes import (
    bbox2dist,
    bbox_iou,
    box_iou,
    clip_boxes,
    dist2bbox,
    make_anchors,
    scale_boxes,
    xywh2xyxy,
    xyxy2xywh,
)
from yolo_sod_tpu.ops.decode import decode_detections, dfl_expectation
from yolo_sod_tpu.ops.letterbox import letterbox, letterbox_params
from yolo_sod_tpu.ops.nms import non_max_suppression

__all__ = [
    "bbox2dist", "bbox_iou", "box_iou", "clip_boxes", "dist2bbox",
    "make_anchors", "scale_boxes", "xywh2xyxy", "xyxy2xywh",
    "decode_detections", "dfl_expectation", "letterbox", "letterbox_params",
    "non_max_suppression",
]
