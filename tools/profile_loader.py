"""Host input-pipeline throughput: dataset → augment → native collate.

The device train step is 89.4 ms/batch-16 (179 img/s, tools/profile_train.py);
the loader must beat that or training is host-bound. This measures the full
host path on a synthetic on-disk dataset (real JPEG decode + mosaic/affine/HSV
+ collate) in items/s and ms/batch, with the native C++ collate on and off.

Usage: python tools/profile_loader.py [imgsz] [batch] [n_images] [batches]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_dataset(root: Path, n: int, imgsz: int) -> Path:
    import cv2

    (root / "images/train").mkdir(parents=True)
    (root / "labels/train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = (rng.random((imgsz, imgsz, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(root / f"images/train/{i:04d}.jpg"), img)
        k = int(rng.integers(1, 8))
        rows = np.concatenate([rng.integers(0, 10, (k, 1)),
                               np.clip(rng.random((k, 4)), 0.05, 0.95)], 1)
        np.savetxt(root / f"labels/train/{i:04d}.txt", rows, fmt="%.4f")
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: images/train\nval: images/train\nnc: 10\n"
        f"names: {list(map(str, range(10)))}\n")
    return root / "data.yaml"


def run(imgsz: int, batch: int, n_images: int, batches: int) -> None:
    import os

    from yolo_sod_tpu.data.build import build_dataloader
    from yolo_sod_tpu.data.dataset import YOLODataset
    from yolo_sod_tpu.data.utils import check_det_dataset

    with tempfile.TemporaryDirectory() as td:
        yaml_path = make_dataset(Path(td), n_images, imgsz)
        info = check_det_dataset(str(yaml_path))
        hyp = {"mosaic": 1.0, "mixup": 0.1, "copy_paste": 0.1, "degrees": 10,
               "translate": 0.1, "scale": 0.5, "shear": 2.0,
               "perspective": 1e-4, "fliplr": 0.5, "hsv_h": 0.015,
               "hsv_s": 0.7, "hsv_v": 0.4}
        for tag in ("native", "numpy"):
            if tag == "numpy":
                os.environ["YOLO_SOD_NO_NATIVE"] = "1"
                import yolo_sod_tpu.native as native
                native._lib, native._tried = None, False
            ds = YOLODataset(info["train"], imgsz=imgsz, hyp=dict(hyp), nc=10)
            dl = build_dataloader(ds, batch=batch, shuffle=True, seed=0)

            def stream():  # epoch-bounded iterator -> endless batch stream
                while True:
                    yield from dl

            it = stream()
            next(it)  # warm: open files, page caches
            t0 = time.perf_counter()
            for _ in range(batches):
                next(it)
            dt = (time.perf_counter() - t0) / batches
            print(f"loader[{tag:6s}] imgsz={imgsz} batch={batch}: "
                  f"{dt * 1e3:7.1f} ms/batch  {batch / dt:7.1f} img/s")


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    run(*(a + [640, 16, 64, 20][len(a):]))
