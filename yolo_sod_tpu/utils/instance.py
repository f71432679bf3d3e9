"""Box-format algebra containers (reference utils/instance.py:429 —
Bboxes/Instances used by the data pipeline). Pure numpy.
"""

from __future__ import annotations

import numpy as np

_FORMATS = ("xyxy", "xywh", "ltwh")


def _xyxy2xywh(b):
    out = b.copy()
    out[:, 0] = (b[:, 0] + b[:, 2]) / 2
    out[:, 1] = (b[:, 1] + b[:, 3]) / 2
    out[:, 2] = b[:, 2] - b[:, 0]
    out[:, 3] = b[:, 3] - b[:, 1]
    return out


def _xywh2xyxy(b):
    out = b.copy()
    out[:, 0] = b[:, 0] - b[:, 2] / 2
    out[:, 1] = b[:, 1] - b[:, 3] / 2
    out[:, 2] = b[:, 0] + b[:, 2] / 2
    out[:, 3] = b[:, 1] + b[:, 3] / 2
    return out


def _ltwh2xyxy(b):
    out = b.copy()
    out[:, 2] = b[:, 0] + b[:, 2]
    out[:, 3] = b[:, 1] + b[:, 3]
    return out


def _xyxy2ltwh(b):
    out = b.copy()
    out[:, 2] = b[:, 2] - b[:, 0]
    out[:, 3] = b[:, 3] - b[:, 1]
    return out


_CONVERT = {
    ("xyxy", "xywh"): _xyxy2xywh,
    ("xywh", "xyxy"): _xywh2xyxy,
    ("ltwh", "xyxy"): _ltwh2xyxy,
    ("xyxy", "ltwh"): _xyxy2ltwh,
    ("xywh", "ltwh"): lambda b: _xyxy2ltwh(_xywh2xyxy(b)),
    ("ltwh", "xywh"): lambda b: _xyxy2xywh(_ltwh2xyxy(b)),
}


class Bboxes:
    """Boxes in one of xyxy / xywh / ltwh formats with conversion + scaling."""

    def __init__(self, bboxes: np.ndarray, format: str = "xyxy"):
        assert format in _FORMATS, f"format must be one of {_FORMATS}"
        bboxes = bboxes[None] if bboxes.ndim == 1 else bboxes
        assert bboxes.ndim == 2 and bboxes.shape[1] == 4
        self.bboxes = bboxes.astype(np.float32)
        self.format = format

    def convert(self, format: str):
        assert format in _FORMATS
        if format != self.format:
            self.bboxes = _CONVERT[(self.format, format)](self.bboxes)
            self.format = format
        return self

    def areas(self):
        b = Bboxes(self.bboxes.copy(), self.format).convert("xyxy").bboxes
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    def mul(self, scale):
        """Scale coordinates by (sx, sy, sx2, sy2) or scalar."""
        s = np.asarray(scale if hasattr(scale, "__len__") else [scale] * 4)
        self.bboxes = self.bboxes * s[None]
        return self

    def add(self, offset):
        o = np.asarray(offset if hasattr(offset, "__len__") else [offset] * 4)
        self.bboxes = self.bboxes + o[None]
        return self

    def __len__(self):
        return len(self.bboxes)

    def __getitem__(self, idx):
        return Bboxes(np.atleast_2d(self.bboxes[idx]), self.format)

    @classmethod
    def concatenate(cls, boxes_list, axis=0):
        assert boxes_list
        fmt = boxes_list[0].format
        assert all(b.format == fmt for b in boxes_list)
        return cls(np.concatenate([b.bboxes for b in boxes_list], axis), fmt)


class Instances:
    """Boxes + optional segments/keypoints moving together under transforms."""

    def __init__(self, bboxes, segments=None, keypoints=None,
                 bbox_format: str = "xywh", normalized: bool = True):
        self._bboxes = Bboxes(bboxes, bbox_format)
        self.segments = segments if segments is not None else np.zeros((0, 0, 2), np.float32)
        self.keypoints = keypoints
        self.normalized = normalized

    @property
    def bboxes(self):
        return self._bboxes.bboxes

    @property
    def bbox_areas(self):
        return self._bboxes.areas()

    def convert_bbox(self, format: str):
        self._bboxes.convert(format)
        return self

    def scale(self, scale_w, scale_h, bbox_only: bool = False):
        self._bboxes.mul((scale_w, scale_h, scale_w, scale_h))
        if not bbox_only:
            if self.segments.size:
                self.segments[..., 0] *= scale_w
                self.segments[..., 1] *= scale_h
            if self.keypoints is not None:
                self.keypoints[..., 0] *= scale_w
                self.keypoints[..., 1] *= scale_h
        return self

    def denormalize(self, w, h):
        if self.normalized:
            self.scale(w, h)
            self.normalized = False
        return self

    def normalize(self, w, h):
        if not self.normalized:
            self.scale(1 / w, 1 / h)
            self.normalized = True
        return self

    def add_padding(self, padw, padh):
        assert not self.normalized, "denormalize before padding"
        self._bboxes.add((padw, padh, padw, padh))
        if self.segments.size:
            self.segments[..., 0] += padw
            self.segments[..., 1] += padh
        return self

    def flipud(self, h):
        if self._bboxes.format == "xyxy":
            y1 = self.bboxes[:, 1].copy()
            self.bboxes[:, 1] = h - self.bboxes[:, 3]
            self.bboxes[:, 3] = h - y1
        else:
            self.bboxes[:, 1] = h - self.bboxes[:, 1]
        return self

    def fliplr(self, w):
        if self._bboxes.format == "xyxy":
            x1 = self.bboxes[:, 0].copy()
            self.bboxes[:, 0] = w - self.bboxes[:, 2]
            self.bboxes[:, 2] = w - x1
        else:
            self.bboxes[:, 0] = w - self.bboxes[:, 0]
        return self

    def clip(self, w, h):
        fmt = self._bboxes.format
        self.convert_bbox("xyxy")
        self.bboxes[:, [0, 2]] = self.bboxes[:, [0, 2]].clip(0, w)
        self.bboxes[:, [1, 3]] = self.bboxes[:, [1, 3]].clip(0, h)
        if fmt != "xyxy":
            self.convert_bbox(fmt)
        return self

    def remove_zero_area_boxes(self):
        good = self.bbox_areas > 0
        if not good.all():
            self._bboxes = self._bboxes[good]
        return good

    def __len__(self):
        return len(self._bboxes)

    def __getitem__(self, idx):
        return Instances(np.atleast_2d(self.bboxes[idx]),
                         bbox_format=self._bboxes.format,
                         normalized=self.normalized)
