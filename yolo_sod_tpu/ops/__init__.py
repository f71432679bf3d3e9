"""On-device ops: box algebra, decode, NMS, letterbox (all jit-safe)."""

from yolo_sod_tpu.ops.boxes import (
    bbox2dist,
    bbox_iou,
    box_iou,
    clean_str,
    clip_boxes,
    crop_mask,
    dist2bbox,
    ltwh2xywh,
    ltwh2xyxy,
    make_anchors,
    masks2segments,
    regularize_rboxes,
    resample_segments,
    scale_boxes,
    scale_image,
    segment2box,
    segments2boxes,
    xywh2ltwh,
    xywh2xyxy,
    xywhr2xyxyxyxy,
    xyxy2ltwh,
    xyxy2xywh,
    xyxyxyxy2xywhr,
)
from yolo_sod_tpu.ops.decode import decode_detections, dfl_expectation
from yolo_sod_tpu.ops.letterbox import letterbox, letterbox_params
from yolo_sod_tpu.ops.nms import non_max_suppression

__all__ = [
    "bbox2dist", "bbox_iou", "box_iou", "clean_str", "clip_boxes",
    "crop_mask", "dist2bbox", "ltwh2xywh", "ltwh2xyxy", "make_anchors",
    "masks2segments", "regularize_rboxes", "resample_segments", "scale_boxes",
    "scale_image", "segment2box", "segments2boxes", "xywh2ltwh", "xywh2xyxy",
    "xywhr2xyxyxyxy", "xyxy2ltwh", "xyxy2xywh", "xyxyxyxy2xywhr",
    "decode_detections", "dfl_expectation", "letterbox", "letterbox_params",
    "non_max_suppression",
]
