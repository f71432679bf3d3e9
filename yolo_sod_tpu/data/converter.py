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


def convert_coco(labels_dir: str = "../coco/annotations/",
                 save_dir: str = "coco_converted/",
                 use_segments: bool = False, use_keypoints: bool = False,
                 cls91to80: bool = True):
    """COCO instance/keypoint JSONs → YOLO-layout label txt trees (upstream
    ultralytics data/converter.py convert_coco contract): one
    `<save_dir>/labels/<json stem>/<image stem>.txt` per annotated image,
    normalized xywh (+ polygon or keypoint tails), crowd boxes skipped,
    optional sparse-91 → dense-80 class remap. Returns the save dir."""
    import json
    from collections import defaultdict
    from pathlib import Path

    import numpy as np

    save_dir = Path(save_dir)
    coco80 = coco91_to_coco80_class()
    for json_file in sorted(Path(labels_dir).resolve().glob("*.json")):
        lname = json_file.stem.replace("instances_", "")
        fn = save_dir / "labels" / lname
        fn.mkdir(parents=True, exist_ok=True)
        data = json.loads(json_file.read_text())

        images = {f'{x["id"]:d}': x for x in data["images"]}
        img_to_anns = defaultdict(list)
        for ann in data["annotations"]:
            img_to_anns[ann["image_id"]].append(ann)

        for img_id, anns in img_to_anns.items():
            img = images[f"{img_id:d}"]
            h, w = img["height"], img["width"]
            lines = []
            for ann in anns:
                if ann.get("iscrowd", False):
                    continue
                # xywh top-left -> normalized center xywh
                box = np.array(ann["bbox"], np.float64)
                box[:2] += box[2:] / 2
                box[[0, 2]] /= w
                box[[1, 3]] /= h
                if box[2] <= 0 or box[3] <= 0:
                    continue
                cls = coco80[ann["category_id"] - 1] if cls91to80 \
                    else ann["category_id"] - 1
                if cls is None:
                    continue
                tail = ""
                if use_segments and ann.get("segmentation"):
                    segs = ann["segmentation"]
                    if isinstance(segs, dict):
                        continue  # RLE crowd-style masks are not polygons
                    # concatenate multi-part polygons (upstream merge rule:
                    # all parts joined into one list)
                    s = np.concatenate(
                        [np.asarray(p, np.float64).reshape(-1, 2)
                         for p in segs], 0)
                    s = (s / np.array([w, h], np.float64)).reshape(-1)
                    tail = " " + " ".join(f"{v:.6f}" for v in s)
                elif use_keypoints and ann.get("keypoints"):
                    k = np.asarray(ann["keypoints"], np.float64).reshape(-1, 3)
                    k[:, 0] /= w
                    k[:, 1] /= h
                    tail = " " + " ".join(f"{v:.6f}" for v in k.reshape(-1))
                lines.append(f"{cls} " + " ".join(f"{v:.6f}" for v in box)
                             + tail)
            stem = Path(img["file_name"]).stem
            (fn / f"{stem}.txt").write_text("\n".join(lines) + "\n"
                                            if lines else "")
    return save_dir
