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


# ---------------------------------------------------------------------------
# Annotator — the host-side drawing toolkit (reference plotting.py:153).
# Re-designed cv2-only: one vectorized mask-blend (no per-pixel loops, no
# torch/PIL), one shared filled-label primitive reused by every *_label
# method, and a generated HSV palette instead of hard-coded hex tables.
# ---------------------------------------------------------------------------


class Colors:
    """Deterministic class-index -> color palette (reference Colors :20).

    Generated from evenly spaced hues at two saturation/value rings (golden-
    ratio hop for adjacent-class contrast) rather than a fixed hex table.
    `__call__(i, bgr=...)` matches the reference calling convention. Also
    carries pose keypoint/limb palettes used by Annotator.kpts.
    """

    N = 20

    def __init__(self):
        import colorsys

        self.palette = []
        for i in range(self.N):
            hue = (i * 0.61803398875) % 1.0
            s, v = (0.75, 1.0) if i % 2 == 0 else (0.95, 0.85)
            r, g, b = colorsys.hsv_to_rgb(hue, s, v)
            self.palette.append((int(r * 255), int(g * 255), int(b * 255)))
        self.n = len(self.palette)
        # pose: head/arms/legs hue groups, 17 kpts + 19 limbs (COCO order)
        grp = lambda h: tuple(  # noqa: E731
            int(c * 255) for c in colorsys.hsv_to_rgb(h, 0.85, 1.0))
        self.pose_palette = np.array(
            [grp(0.58)] * 5 + [grp(0.33)] * 6 + [grp(0.08)] * 6, np.uint8)

    def __call__(self, i, bgr: bool = False):
        c = self.palette[int(i) % self.n]
        return (c[2], c[1], c[0]) if bgr else c

    @staticmethod
    def hex2rgb(h: str):
        return tuple(int(h[1 + j:1 + j + 2], 16) for j in (0, 2, 4))


colors = Colors()

# COCO-17 skeleton (limb endpoint indices, 0-based) for Annotator.kpts.
_SKELETON = [(15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11),
             (6, 12), (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2),
             (0, 1), (0, 2), (1, 3), (2, 4), (3, 5), (4, 6)]


class Annotator:
    """Drawing toolkit over one BGR numpy image (reference plotting.py:153).

    cv2-only re-design; method surface matches the reference contract used
    by Results.plot and the solutions apps: box_label (axis-aligned and
    rotated), masks, kpts, rectangle/text, circle_label/text_label, region
    and track drawing, queue/analytics displays, workout helpers, visioneye.
    """

    def __init__(self, im, line_width: int | None = None,
                 font_size: int | None = None, font: str = "",
                 pil: bool = False, example: str = "abc"):
        import cv2

        self.im = np.ascontiguousarray(im) if not im.flags.writeable or not \
            im.flags["C_CONTIGUOUS"] else im
        self.lw = line_width or max(round(sum(im.shape) / 2 * 0.003), 2)
        self.sf = font_size or max(self.lw - 1, 1) * 0.4
        self.tf = max(self.lw - 1, 1)
        self._cv2 = cv2

    # -- label primitives ---------------------------------------------------

    def get_txt_color(self, color=(128, 128, 128), txt_color=(255, 255, 255)):
        """Black text on light backgrounds, white on dark (reference :240)."""
        return (0, 0, 0) if sum(color) > 3 * 128 else txt_color

    def _filled_text(self, org, label, color, txt_color, above: bool = True):
        """Filled rectangle + text anchored at org (shared primitive)."""
        cv2 = self._cv2
        w, h = cv2.getTextSize(label, 0, self.sf, self.tf)[0]
        x, y = int(org[0]), int(org[1])
        if above and y - h - 3 < 0:
            above = False
        y0, y1 = (y - h - 3, y) if above else (y, y + h + 3)
        cv2.rectangle(self.im, (x, y0), (x + w, y1), color, -1, cv2.LINE_AA)
        ty = y - 2 if above else y + h + 1
        cv2.putText(self.im, label, (x, ty), 0, self.sf,
                    self.get_txt_color(color, txt_color), self.tf, cv2.LINE_AA)

    # -- detection/obb ------------------------------------------------------

    def box_label(self, box, label="", color=(128, 128, 128),
                  txt_color=(255, 255, 255), rotated: bool = False):
        """Axis-aligned xyxy box, or a 4x2 polygon when rotated=True
        (reference :336)."""
        cv2 = self._cv2
        if rotated:
            pts = np.asarray(box, np.int32).reshape(-1, 2)
            cv2.polylines(self.im, [pts], True, color, self.lw, cv2.LINE_AA)
            anchor = pts[pts[:, 1].argmin()]
        else:
            x1, y1, x2, y2 = (int(v) for v in box)
            cv2.rectangle(self.im, (x1, y1), (x2, y2), color, self.lw,
                          cv2.LINE_AA)
            anchor = (x1, y1)
        if label:
            self._filled_text(anchor, label, color, txt_color)

    def circle_label(self, box, label="", color=(128, 128, 128),
                     txt_color=(255, 255, 255), margin: int = 2):
        """Centroid disc sized to the label (reference :258)."""
        cv2 = self._cv2
        cx = int((box[0] + box[2]) / 2)
        cy = int((box[1] + box[3]) / 2)
        (w, h), _ = cv2.getTextSize(str(label), 0, self.sf, self.tf)
        radius = int(((w ** 2 + h ** 2) ** 0.5) / 2) + margin
        cv2.circle(self.im, (cx, cy), radius, color, -1)
        cv2.putText(self.im, str(label), (cx - w // 2, cy + h // 2), 0,
                    self.sf, self.get_txt_color(color, txt_color), self.tf,
                    cv2.LINE_AA)

    def text_label(self, box, label="", color=(128, 128, 128),
                   txt_color=(255, 255, 255), margin: int = 5):
        """Centroid filled text box (reference :299)."""
        cv2 = self._cv2
        cx = int((box[0] + box[2]) / 2)
        cy = int((box[1] + box[3]) / 2)
        (w, h), _ = cv2.getTextSize(str(label), 0, self.sf, self.tf)
        cv2.rectangle(self.im, (cx - w // 2 - margin, cy - h // 2 - margin),
                      (cx + w // 2 + margin, cy + h // 2 + margin), color, -1)
        cv2.putText(self.im, str(label), (cx - w // 2, cy + h // 2), 0,
                    self.sf, self.get_txt_color(color, txt_color), self.tf,
                    cv2.LINE_AA)

    # -- segmentation -------------------------------------------------------

    def masks(self, masks, colors_, im_gpu=None, alpha: float = 0.5,
              retina_masks: bool = False):
        """Alpha-blend instance masks, vectorized (reference :394, minus the
        torch/GPU path: masks arrive as a (N, H, W) numpy/array stack that
        is resized to the image if needed)."""
        cv2 = self._cv2
        masks = np.asarray(masks)
        if masks.size == 0:
            return
        H, W = self.im.shape[:2]
        if masks.shape[-2:] != (H, W):
            masks = np.stack([cv2.resize(m.astype(np.float32), (W, H))
                              for m in masks])
        masks = masks > 0.5
        overlay = self.im.astype(np.float32)
        for m, c in zip(masks, colors_):
            overlay[m] = overlay[m] * (1 - alpha) + np.array(c, np.float32) * alpha
        self.im[:] = overlay.astype(np.uint8)

    def seg_bbox(self, mask, mask_color=(255, 0, 255), label=None,
                 txt_color=(255, 255, 255)):
        """Outline one mask polygon + optional label (reference :790)."""
        cv2 = self._cv2
        pts = np.asarray(mask, np.int32).reshape(-1, 1, 2)
        cv2.polylines(self.im, [pts], True, mask_color, self.lw)
        if label:
            self._filled_text(tuple(pts[pts[:, 0, 1].argmin(), 0]), label,
                              mask_color, txt_color)

    # -- pose ---------------------------------------------------------------

    def kpts(self, kpts, shape=(640, 640), radius: int | None = None,
             kpt_line: bool = True, conf_thres: float = 0.25,
             kpt_color=None):
        """Keypoint dots + skeleton limbs for one instance, (17, 2|3)
        (reference :430). Limbs drawn only when both endpoints are
        confident and in-frame."""
        cv2 = self._cv2
        kpts = np.asarray(kpts)
        radius = radius or self.lw
        nk = kpts.shape[0]
        is_pose = nk == 17
        conf = kpts[:, 2] if kpts.shape[-1] == 3 else np.ones(nk)
        ok = (conf > conf_thres) & (kpts[:, 0] > 0) & (kpts[:, 1] > 0)
        for i in range(nk):
            if not ok[i]:
                continue
            c = (kpt_color or (tuple(int(v) for v in colors.pose_palette[i])
                               if is_pose else colors(i)))
            cv2.circle(self.im, (int(kpts[i, 0]), int(kpts[i, 1])), radius,
                       c, -1, cv2.LINE_AA)
        if kpt_line and is_pose:
            for a, b in _SKELETON:
                if ok[a] and ok[b]:
                    lc = kpt_color or tuple(int(v) for v in
                                            colors.pose_palette[a])
                    cv2.line(self.im, (int(kpts[a, 0]), int(kpts[a, 1])),
                             (int(kpts[b, 0]), int(kpts[b, 1])), lc,
                             max(self.lw - 1, 1), cv2.LINE_AA)

    @staticmethod
    def estimate_pose_angle(a, b, c):
        """Angle ABC in degrees from three (x, y) points (reference :688)."""
        a, b, c = (np.asarray(p, np.float32) for p in (a, b, c))
        ang = abs(np.degrees(np.arctan2(c[1] - b[1], c[0] - b[0])
                             - np.arctan2(a[1] - b[1], a[0] - b[0])))
        return 360.0 - ang if ang > 180.0 else ang

    def draw_specific_points(self, keypoints, indices=None, radius: int = 2,
                             conf_thres: float = 0.25):
        """Highlight selected keypoints (reference :707)."""
        for i in indices or [2, 5, 7]:
            k = keypoints[i]
            if len(k) < 3 or k[2] > conf_thres:
                self._cv2.circle(self.im, (int(k[0]), int(k[1])), radius,
                                 (0, 255, 0), -1, self._cv2.LINE_AA)
        return self.im

    def plot_workout_information(self, display_text, position,
                                 color=(104, 31, 17),
                                 txt_color=(255, 255, 255)):
        """Filled text block for AIGym overlays (reference :737)."""
        self._filled_text(position, str(display_text), color, txt_color,
                          above=False)

    def plot_angle_and_count_and_stage(self, angle_text, count_text,
                                       stage_text, center_kpt,
                                       color=(104, 31, 17),
                                       txt_color=(255, 255, 255)):
        """Stacked angle/count/stage readout at a joint (reference :762)."""
        x, y = int(center_kpt[0]), int(center_kpt[1])
        for j, t in enumerate((f"{float(angle_text):.2f}" if not isinstance(
                angle_text, str) else angle_text, f"Steps : {count_text}",
                str(stage_text))):
            self._filled_text((x, y + j * int(30 * self.sf + 6)), t, color,
                              txt_color, above=False)

    # -- regions / tracks / dashboards --------------------------------------

    def rectangle(self, xy, fill=None, outline=None, width: int = 1):
        p1, p2 = (int(xy[0]), int(xy[1])), (int(xy[2]), int(xy[3]))
        self._cv2.rectangle(self.im, p1, p2, fill or outline,
                            -1 if fill else width)

    def text(self, xy, text, txt_color=(255, 255, 255), anchor="top",
             box_style: bool = False):
        if box_style:
            self._filled_text(xy, text, txt_color,
                              self.get_txt_color(txt_color), above=False)
        else:
            self._cv2.putText(self.im, text, (int(xy[0]), int(xy[1])), 0,
                              self.sf, txt_color, self.tf, self._cv2.LINE_AA)

    @staticmethod
    def get_bbox_dimension(bbox=None):
        """(width, height, area) of an xyxy box (reference :549)."""
        x1, y1, x2, y2 = bbox
        w, h = x2 - x1, y2 - y1
        return w, h, w * h

    def draw_region(self, reg_pts=None, color=(0, 255, 0), thickness: int = 5):
        pts = np.asarray(reg_pts, np.int32).reshape(-1, 1, 2)
        self._cv2.polylines(self.im, [pts], True, color, thickness)
        for p in pts[:, 0]:
            self._cv2.circle(self.im, tuple(p), thickness * 2, color, -1)

    def draw_centroid_and_tracks(self, track, color=(255, 0, 255),
                                 track_thickness: int = 2):
        pts = np.asarray(track, np.int32).reshape(-1, 1, 2)
        self._cv2.polylines(self.im, [pts], False, color, track_thickness)
        self._cv2.circle(self.im, tuple(pts[-1, 0]),
                         track_thickness * 3, color, -1)

    def queue_counts_display(self, label, points=None,
                             region_color=(255, 255, 255),
                             txt_color=(0, 0, 0)):
        """Queue-count readout at the region centroid (reference :594)."""
        pts = np.asarray(points, np.float32)
        cx, cy = int(pts[:, 0].mean()), int(pts[:, 1].mean())
        self._filled_text((cx, cy), str(label), region_color, txt_color,
                          above=False)

    def display_objects_labels(self, im0, text, txt_color, bg_color,
                               x_center, y_center, margin: int):
        """Centered filled label used by distance/heatmap apps
        (reference :634)."""
        cv2 = self._cv2
        (w, h), _ = cv2.getTextSize(text, 0, self.sf, self.tf)
        x, y = int(x_center - w / 2), int(y_center + h / 2)
        cv2.rectangle(im0, (x - margin, y - h - margin),
                      (x + w + margin, y + margin), bg_color, -1)
        cv2.putText(im0, text, (x, y), 0, self.sf, txt_color, self.tf,
                    cv2.LINE_AA)

    def display_analytics(self, im0, text, txt_color, bg_color,
                          margin: int):
        """Top-right stacked key:value dashboard (reference :658)."""
        cv2 = self._cv2
        y = int(im0.shape[0] * 0.02) + 10
        for k, v in (text or {}).items():
            t = f"{k}: {v}"
            (w, h), _ = cv2.getTextSize(t, 0, self.sf, self.tf)
            x = im0.shape[1] - w - 2 * margin - 4
            cv2.rectangle(im0, (x - margin, y - margin),
                          (x + w + margin, y + h + margin), bg_color, -1)
            cv2.putText(im0, t, (x, y + h), 0, self.sf, txt_color, self.tf,
                        cv2.LINE_AA)
            y += h + 3 * margin

    def sweep_annotator(self, line_x: int = 0, line_y: int = 0, label=None,
                        color=(221, 0, 186), txt_color=(255, 255, 255)):
        """Vertical sweep line + optional center label (reference :818)."""
        cv2 = self._cv2
        cv2.line(self.im, (line_x, 0), (line_x, line_y), color, self.lw * 2)
        if label:
            self._filled_text((line_x, line_y // 2), label, color, txt_color,
                              above=False)

    def plot_distance_and_line(self, pixels_distance, centroids,
                               line_color=(104, 31, 17),
                               centroid_color=(255, 0, 255)):
        """Distance readout + connecting line (reference :852)."""
        cv2 = self._cv2
        self._filled_text((15, 25), f"Pixels Distance: {pixels_distance:.2f}",
                          line_color, (255, 255, 255), above=False)
        cv2.line(self.im, tuple(map(int, centroids[0])),
                 tuple(map(int, centroids[1])), line_color, 3)
        for c in centroids:
            cv2.circle(self.im, tuple(map(int, c)), 6, centroid_color, -1)

    def visioneye(self, box, center_point, color=(235, 219, 11),
                  pin_color=(255, 0, 255)):
        """Eye-to-object mapping line (reference :888)."""
        cv2 = self._cv2
        cx, cy = int((box[0] + box[2]) / 2), int((box[1] + box[3]) / 2)
        cv2.circle(self.im, tuple(map(int, center_point)), self.lw * 2,
                   pin_color, -1)
        cv2.circle(self.im, (cx, cy), self.lw * 2, color, -1)
        cv2.line(self.im, tuple(map(int, center_point)), (cx, cy), color,
                 self.lw)

    # -- IO -----------------------------------------------------------------

    def fromarray(self, im):
        self.im = np.ascontiguousarray(im)

    def result(self):
        return self.im

    def show(self, title=None):  # pragma: no cover - display-dependent
        try:
            self._cv2.imshow(title or "image", self.im)
            self._cv2.waitKey(1)
        except Exception as e:
            LOGGER.warning(f"Annotator.show unavailable: {e}")

    def save(self, filename: str = "image.jpg"):
        self._cv2.imwrite(filename, self.im)
        return filename


def save_one_box(xyxy, im, file=Path("im.jpg"), gain: float = 1.02,
                 pad: int = 10, square: bool = False, BGR: bool = False,
                 save: bool = True):
    """Crop one padded box from an image, optionally save (reference :960)."""
    import cv2

    x1, y1, x2, y2 = (float(v) for v in np.asarray(xyxy).reshape(4))
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    w, h = (x2 - x1) * gain + pad, (y2 - y1) * gain + pad
    if square:
        w = h = max(w, h)
    H, W = im.shape[:2]
    xa, xb = max(int(cx - w / 2), 0), min(int(cx + w / 2), W)
    ya, yb = max(int(cy - h / 2), 0), min(int(cy + h / 2), H)
    crop = im[ya:yb, xa:xb, ::(1 if BGR else -1)]
    if save:
        file = Path(file)
        file.parent.mkdir(parents=True, exist_ok=True)
        f = str(file.with_suffix(".jpg"))
        cv2.imwrite(f, np.ascontiguousarray(crop))
    return crop
