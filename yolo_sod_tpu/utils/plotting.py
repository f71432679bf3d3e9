"""Plotting utilities: batch mosaics, training curves, PR curves.

Host-side analog of reference utils/plotting.py (plot_images mosaics,
plot_results curves, feature_visualization :1347). cv2-based drawing (no
matplotlib hard dependency; curves fall back to CSV-only when absent).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from yolo_sod_tpu.utils import LOGGER


def plot_images(batch: dict, fname="train_batch.jpg", max_images: int = 16,
                names: dict | None = None):
    """Tile a training batch with its boxes into one annotated mosaic image
    (reference plot_images). batch follows the collate contract."""
    import cv2

    imgs = batch["img"][:max_images]
    B = imgs.shape[0]
    cols = int(np.ceil(np.sqrt(B)))
    rows = int(np.ceil(B / cols))
    h, w = imgs.shape[1:3]
    canvas = np.full((rows * h, cols * w, 3), 255, np.uint8)
    for i in range(B):
        r, c = divmod(i, cols)
        im = imgs[i, ..., ::-1]                           # RGB->BGR
        if im.dtype != np.uint8:                          # float [0,1] batches
            im = (im * 255).astype(np.uint8)
        im = np.ascontiguousarray(im)
        m = batch["mask_gt"][i] > 0
        for cls, (cx, cy, bw, bh) in zip(batch["cls"][i][m], batch["bboxes"][i][m]):
            x1 = int((cx - bw / 2) * w)
            y1 = int((cy - bh / 2) * h)
            x2 = int((cx + bw / 2) * w)
            y2 = int((cy + bh / 2) * h)
            cv2.rectangle(im, (x1, y1), (x2, y2), (0, 220, 0), 1)
            label = str((names or {}).get(int(cls), int(cls)))
            cv2.putText(im, label, (x1, max(y1 - 2, 8)), 0, 0.35, (0, 220, 0), 1)
        canvas[r * h:(r + 1) * h, c * w:(c + 1) * w] = im
    Path(fname).parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(fname), canvas)
    return str(fname)


def plot_results(csv_file="results.csv", out: str | None = None):
    """Training-curve plots from results.csv (reference plot_results)."""
    import csv as _csv

    csv_file = Path(csv_file)
    with open(csv_file) as f:
        rows = list(_csv.DictReader(f))
    if not rows:
        LOGGER.warning(f"plot_results: {csv_file} is empty")
        return None
    keys = [k for k in rows[0] if k not in ("epoch",) and rows[0][k] not in ("", None)]
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = len(keys)
        cols = min(4, n)
        rws = int(np.ceil(n / cols))
        fig, axes = plt.subplots(rws, cols, figsize=(4 * cols, 3 * rws), squeeze=False)
        epochs = [float(r["epoch"]) for r in rows]
        for ax, k in zip(axes.flat, keys):
            vals = [float(r[k]) if r[k] else np.nan for r in rows]
            ax.plot(epochs, vals, marker=".")
            ax.set_title(k, fontsize=9)
        for ax in axes.flat[len(keys):]:
            ax.axis("off")
        out = out or str(csv_file.with_name("results.png"))
        fig.tight_layout()
        fig.savefig(out, dpi=120)
        plt.close(fig)
        return out
    except Exception as e:
        LOGGER.warning(f"plot_results: matplotlib unavailable ({e}); csv only")
        return None


def plot_pr_curve(px, py, ap, names=(), out="PR_curve.png"):
    """Precision-recall curves per class (reference metrics.py:456)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 5))
        py = np.asarray(py)
        for i in range(py.shape[0]):
            label = f"{names[i] if i < len(names) else i} {ap[i, 0]:.3f}" \
                if len(ap) else None
            ax.plot(px, py[i], linewidth=1, label=label)
        ax.plot(px, py.mean(0), linewidth=2, color="blue",
                label=f"all classes {ap[:, 0].mean():.3f} mAP@0.5" if len(ap) else "mean")
        ax.set_xlabel("Recall")
        ax.set_ylabel("Precision")
        ax.legend(fontsize=7)
        fig.savefig(out, dpi=120)
        plt.close(fig)
        return out
    except Exception:
        return None


def feature_visualization(x, module_name: str, stage: int, n: int = 32,
                          save_dir=Path("runs/features")):
    """Save the first n channels of an NHWC activation as a tiled image
    (reference plotting.py:1347)."""
    import cv2

    x = np.asarray(x)
    if x.ndim != 4:
        return None
    fm = x[0]                                 # (H, W, C)
    C = min(n, fm.shape[-1])
    cols = int(np.ceil(np.sqrt(C)))
    rows = int(np.ceil(C / cols))
    h, w = fm.shape[:2]
    canvas = np.zeros((rows * h, cols * w), np.uint8)
    for i in range(C):
        ch = fm[..., i]
        ch = (255 * (ch - ch.min()) / (np.ptp(ch) + 1e-9)).astype(np.uint8)
        r, c = divmod(i, cols)
        canvas[r * h:(r + 1) * h, c * w:(c + 1) * w] = ch
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    out = save_dir / f"stage{stage}_{module_name}.png"
    cv2.imwrite(str(out), canvas)
    return str(out)
