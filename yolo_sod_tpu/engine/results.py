"""Inference result containers (reference engine/results.py: Results :187,
Boxes :938). Host-side numpy views over the device output; plotting via cv2.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


class Boxes:
    """Detection boxes for one image: (n, 6) [x1, y1, x2, y2, conf, cls]."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data)
        self.orig_shape = orig_shape

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def conf(self):
        return self.data[:, 4]

    @property
    def cls(self):
        return self.data[:, 5]

    @property
    def xywh(self):
        b = self.data[:, :4]
        out = b.copy()
        out[:, 0] = (b[:, 0] + b[:, 2]) / 2
        out[:, 1] = (b[:, 1] + b[:, 3]) / 2
        out[:, 2] = b[:, 2] - b[:, 0]
        out[:, 3] = b[:, 3] - b[:, 1]
        return out

    @property
    def xyxyn(self):
        h, w = self.orig_shape
        return self.xyxy / np.array([w, h, w, h])

    @property
    def xywhn(self):
        h, w = self.orig_shape
        return self.xywh / np.array([w, h, w, h])

    @property
    def id(self):
        """Track ids when present ((n, 7) data from a tracker), else None."""
        return self.data[:, 6] if self.data.shape[1] >= 7 else None

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return Boxes(self.data[idx][None] if np.isscalar(idx) else self.data[idx],
                     self.orig_shape)

    # torch-API compatibility shims (everything is already host numpy)
    def cpu(self):
        return self

    def numpy(self):
        return self


class Masks:
    """Per-detection binary masks (reference Masks :1156): (N, H, W) bool
    at model input resolution (un-letterboxing happens in .data consumers)."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)


class Keypoints:
    """Per-detection keypoints (reference Keypoints :1254): (N, K, 3) in
    original-image pixels + visibility/confidence."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data)
        self.orig_shape = orig_shape

    @property
    def xy(self):
        return self.data[..., :2]

    @property
    def conf(self):
        return self.data[..., 2]

    def __len__(self):
        return len(self.data)


class OBBoxes:
    """Per-detection oriented boxes (reference OBB :1519): (N, 7)
    [cx, cy, w, h, angle(rad), conf, cls] in original-image pixels."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data)
        self.orig_shape = orig_shape

    @property
    def xywhr(self):
        return self.data[:, :5]

    @property
    def conf(self):
        return self.data[:, 5]

    @property
    def cls(self):
        return self.data[:, 6]

    def __len__(self):
        return len(self.data)


class Probs:
    """Classification probabilities (reference Probs :1378)."""

    def __init__(self, data: np.ndarray):
        self.data = np.asarray(data)

    @property
    def top1(self) -> int:
        return int(self.data.argmax())

    @property
    def top1conf(self) -> float:
        return float(self.data.max())

    @property
    def top5(self):
        return np.argsort(-self.data)[:5].tolist()

    @property
    def top5conf(self):
        return np.sort(self.data)[::-1][:5]


class Results:
    """Results for one image (reference Results :187)."""

    def __init__(self, orig_img: np.ndarray, path: str, names: dict,
                 boxes: Optional[np.ndarray] = None, speed: Optional[dict] = None,
                 masks: Optional[np.ndarray] = None,
                 keypoints: Optional[np.ndarray] = None,
                 obb: Optional[np.ndarray] = None,
                 probs: Optional[np.ndarray] = None):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names
        self.boxes = Boxes(boxes if boxes is not None else np.zeros((0, 6)),
                           self.orig_shape)
        self.masks = Masks(masks, self.orig_shape) if masks is not None else None
        self.keypoints = Keypoints(keypoints, self.orig_shape) \
            if keypoints is not None else None
        self.obb = OBBoxes(obb, self.orig_shape) if obb is not None else None
        self.probs = Probs(probs) if probs is not None else None
        self.speed = speed or {"preprocess": None, "inference": None, "postprocess": None}

    def __len__(self):
        return len(self.boxes)

    def __getitem__(self, idx):
        """Index/filter detections; every per-detection component (boxes,
        masks, keypoints, obb) is carried through (reference Results.__getitem__
        → _apply)."""
        r = Results(self.orig_img, self.path, self.names, speed=self.speed)
        r.boxes = self.boxes[idx]
        if self.masks is not None:
            r.masks = Masks(np.asarray(self.masks.data)[idx], self.orig_shape)
        if self.keypoints is not None:
            r.keypoints = Keypoints(np.asarray(self.keypoints.data)[idx],
                                    self.orig_shape)
        if self.obb is not None:
            r.obb = OBBoxes(np.asarray(self.obb.data)[idx], self.orig_shape)
        r.probs = self.probs
        return r

    def new(self, boxes: Optional[np.ndarray] = None):
        return Results(self.orig_img, self.path, self.names, boxes=boxes,
                       speed=self.speed)

    def cpu(self):
        return self

    def numpy(self):
        return self

    def plot(self, line_width: Optional[int] = None, font_scale: float = 0.5,
             img: Optional[np.ndarray] = None, masks: bool = True,
             kpt_line: bool = True, conf_thres: float = 0.25) -> np.ndarray:
        """Render every present modality — masks, then boxes/OBB, then
        keypoints — on (a copy of) the original image via Annotator
        (reference results.py Results.plot)."""
        from yolo_sod_tpu.utils.plotting import Annotator

        im = (img if img is not None else self.orig_img).copy()
        ann = Annotator(im, line_width=line_width)
        if masks and self.masks is not None and len(self.masks):
            cls_src = (self.boxes.cls if self.boxes is not None and
                       len(self.boxes) else np.zeros(len(self.masks)))
            ann.masks(self.masks.data,
                      [_color(int(c)) for c in cls_src[:len(self.masks)]])
        if self.obb is not None and len(self.obb):
            from yolo_sod_tpu.ops.boxes import xywhr2xyxyxyxy
            polys = np.asarray(xywhr2xyxyxyxy(self.obb.xywhr))
            for poly, conf, cls in zip(polys, self.obb.conf, self.obb.cls):
                c = int(cls)
                ann.box_label(poly, f"{self.names.get(c, c)} {conf:.2f}",
                              color=_color(c), rotated=True)
        elif self.boxes is not None:
            for x1, y1, x2, y2, conf, cls, *rest in self.boxes.data:
                c = int(cls)
                label = f"{self.names.get(c, c)} {conf:.2f}"
                if rest:
                    label = f"id:{int(rest[0])} " + label
                ann.box_label((x1, y1, x2, y2), label, color=_color(c))
        if self.keypoints is not None:
            for inst in self.keypoints.data:
                ann.kpts(inst, shape=self.orig_shape, kpt_line=kpt_line,
                         conf_thres=conf_thres)
        if self.probs is not None:
            top = self.probs.top5
            text = "; ".join(f"{self.names.get(i, i)} "
                             f"{float(self.probs.data[i]):.2f}" for i in top[:3])
            ann.text((8, 24), text, txt_color=(255, 255, 255), box_style=True)
        return ann.result()

    def save(self, filename: str) -> str:
        import cv2

        cv2.imwrite(filename, self.plot())
        return filename

    def save_txt(self, txt_file, save_conf: bool = False):
        """YOLO-format label rows: `cls cx cy w h [conf]` normalized."""
        lines = []
        for i in range(len(self.boxes)):
            c = int(self.boxes.cls[i])
            row = [c, *self.boxes.xywhn[i].tolist()]
            if save_conf:
                row.append(float(self.boxes.conf[i]))
            lines.append(" ".join(f"{x:.6g}" if isinstance(x, float) else str(x)
                                  for x in row))
        Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
        with open(txt_file, "a") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))

    def tojson(self, normalize: bool = False) -> str:
        import json

        out = []
        boxes = self.boxes.xyxyn if normalize else self.boxes.xyxy
        for i in range(len(self.boxes)):
            c = int(self.boxes.cls[i])
            x1, y1, x2, y2 = boxes[i].tolist()
            out.append({"name": str(self.names.get(c, c)), "class": c,
                        "confidence": round(float(self.boxes.conf[i]), 5),
                        "box": {"x1": x1, "y1": y1, "x2": x2, "y2": y2}})
        return json.dumps(out, indent=2)

    def summary(self, normalize: bool = False) -> list:
        import json

        return json.loads(self.tojson(normalize))

    def verbose(self) -> str:
        if not len(self.boxes):
            return "(no detections)"
        counts: dict[int, int] = {}
        for c in self.boxes.cls.astype(int):
            counts[c] = counts.get(c, 0) + 1
        return ", ".join(f"{n} {self.names.get(c, c)}{'s' if n > 1 else ''}"
                         for c, n in sorted(counts.items()))


def _color(i: int):
    """Deterministic per-class BGR color (poses as the reference palette)."""
    palette = [(56, 56, 255), (151, 157, 255), (31, 112, 255), (29, 178, 255),
               (49, 210, 207), (10, 249, 72), (23, 204, 146), (134, 219, 61),
               (52, 147, 26), (187, 212, 0), (168, 153, 44), (255, 194, 0),
               (147, 69, 52), (255, 115, 100), (236, 24, 0), (255, 56, 132),
               (133, 0, 82), (255, 56, 203), (200, 149, 255), (199, 55, 255)]
    return palette[i % len(palette)]
