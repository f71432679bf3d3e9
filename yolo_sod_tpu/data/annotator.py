"""Auto-annotation: detector boxes → SAM masks → YOLO segment labels.

Capability analog of upstream ultralytics data/annotator.py `auto_annotate`
(the reference snapshot imports the data layer at the standard 8.3.63 paths —
SURVEY.md §1.1). A detection model proposes boxes on every image, SAM
converts each box into an instance mask, and the polygons are written as
normalized YOLO segment label files — the cheap path from a box dataset (or
no dataset) to a segmentation dataset.

TPU notes: both stages run as jitted graphs — the detector through the
standard fused predict pipeline, SAM through the static-prompt-bucket decode
— so annotating a directory reuses one compiled graph per shape bucket.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional


def auto_annotate(data, det_model: str = "yolov12-sod-fusion-v5-simple.yaml",
                  sam_model: str = "sam_b", conf: float = 0.25,
                  iou: float = 0.45, imgsz: int = 640, max_det: int = 300,
                  classes: Optional[list] = None,
                  output_dir: Optional[str] = None) -> Path:
    """Annotate images in `data` with segment labels; returns the label dir.

    Args mirror the upstream signature: `det_model` is any YOLO facade model
    (YAML or .ckpt), `sam_model` a SAM build name ('sam_b'/'mobile_sam'/...)
    or checkpoint, `classes` an optional class-id whitelist.
    """
    import numpy as np

    from yolo_sod_tpu import YOLO
    from yolo_sod_tpu.models.sam import SAM
    from yolo_sod_tpu.ops.boxes import masks2segments

    det = det_model if hasattr(det_model, "predict") else YOLO(det_model)
    sam = sam_model if hasattr(sam_model, "predict") else SAM(sam_model)

    data = Path(data)
    out = Path(output_dir) if output_dir else \
        data.parent / f"{data.stem}_auto_annotate_labels"
    out.mkdir(parents=True, exist_ok=True)

    results = det.predict(str(data), stream=True, conf=conf, iou=iou,
                          imgsz=imgsz, max_det=max_det, classes=classes,
                          verbose=False)
    for result in results:
        cls_ids = result.boxes.cls.astype(int)
        if len(cls_ids) == 0:
            continue
        sam_results = sam.predict(result.orig_img,
                                  bboxes=result.boxes.xyxy)
        segments = masks2segments(sam_results[0].masks.data,
                                  strategy="largest")
        h, w = result.orig_shape
        lines = []
        for ci, seg in zip(cls_ids, segments):
            if len(seg) == 0:
                continue
            norm = (np.asarray(seg, np.float32) /
                    np.array([w, h], np.float32)).reshape(-1)
            lines.append(f"{int(ci)} " + " ".join(f"{v:.6f}" for v in norm))
        if lines:
            (out / f"{Path(result.path).stem}.txt").write_text(
                "\n".join(lines) + "\n")
    return out
