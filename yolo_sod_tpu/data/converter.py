"""Dataset class-index converters (reference ultralytics.data.converter
contract — the data directory is absent from the reference snapshot, but
detect/val.py:9 imports `converter` for the COCO evaluation class map).

COCO's evaluation annotations use the original 91 category ids with gaps;
trained detectors use the dense 80-class indexing. These two maps translate
between them for pycocotools COCOeval and for ingesting paper predictions.
"""

from __future__ import annotations


def coco91_to_coco80_class():
    """91-index -> 80-index map; None for the 11 removed categories."""
    inv = coco80_to_coco91_class()
    out = [None] * 91
    for i80, i91 in enumerate(inv):
        out[i91 - 1] = i80
    return out


def coco80_to_coco91_class():
    """Dense 80-class index -> original COCO 91 category id (1-based)."""
    return [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19,
            20, 21, 22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38,
            39, 40, 41, 42, 43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55,
            56, 57, 58, 59, 60, 61, 62, 63, 64, 65, 67, 70, 72, 73, 74, 75,
            76, 77, 78, 79, 80, 81, 82, 84, 85, 86, 87, 88, 89, 90]
