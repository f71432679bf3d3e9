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
             img: Optional[np.ndarray] = None) -> np.ndarray:
        """Draw boxes + labels on (a copy of) the original image."""
        import cv2

        im = (img if img is not None else self.orig_img).copy()
        lw = line_width or max(round(sum(im.shape) / 2 * 0.003), 2)
        for x1, y1, x2, y2, conf, cls, *rest in self.boxes.data:
            c = int(cls)
            color = _color(c)
            p1, p2 = (int(x1), int(y1)), (int(x2), int(y2))
            cv2.rectangle(im, p1, p2, color, lw)
            label = f"{self.names.get(c, c)} {conf:.2f}"
            if rest:
                label = f"id:{int(rest[0])} " + label
            tsize = cv2.getTextSize(label, 0, font_scale, 1)[0]
            cv2.rectangle(im, p1, (p1[0] + tsize[0], p1[1] - tsize[1] - 3), color, -1)
            cv2.putText(im, label, (p1[0], p1[1] - 2), 0, font_scale,
                        (255, 255, 255), 1, cv2.LINE_AA)
        return im

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
