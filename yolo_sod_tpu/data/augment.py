"""Train-time augmentations (contract of the absent ultralytics.data.augment).

Implements the default.yaml-driven pipeline the reference trainer expects
(SURVEY.md §1.1): mosaic-4, mixup, copy-paste (flip mode), random affine
(degrees / translate / scale / shear / perspective), HSV jitter, flips, and
the LetterBox resize+pad. All host-side numpy/cv2 on uint8 HWC BGR images with
labels as (n, 5) [cls, cx, cy, w, h] normalized rows.
"""

from __future__ import annotations

import math

import cv2
import numpy as np


def xywhn2xyxy(labels: np.ndarray, w: int, h: int, padw: float = 0, padh: float = 0):
    """(n,5) normalized [cls,cx,cy,w,h] -> (n,5) [cls,x1,y1,x2,y2] pixels."""
    out = labels.copy()
    cx, cy, bw, bh = labels[:, 1] * w, labels[:, 2] * h, labels[:, 3] * w, labels[:, 4] * h
    out[:, 1] = cx - bw / 2 + padw
    out[:, 2] = cy - bh / 2 + padh
    out[:, 3] = cx + bw / 2 + padw
    out[:, 4] = cy + bh / 2 + padh
    return out


def xyxy2xywhn(labels: np.ndarray, w: int, h: int):
    """(n,5) [cls,x1,y1,x2,y2] pixels -> (n,5) normalized [cls,cx,cy,w,h]."""
    out = labels.copy()
    x1, y1, x2, y2 = labels[:, 1], labels[:, 2], labels[:, 3], labels[:, 4]
    out[:, 1] = ((x1 + x2) / 2) / w
    out[:, 2] = ((y1 + y2) / 2) / h
    out[:, 3] = (x2 - x1) / w
    out[:, 4] = (y2 - y1) / h
    return np.clip(out, 0, None)


def letterbox_np(img: np.ndarray, new_shape=(640, 640), color=(114, 114, 114),
                 scaleup: bool = True, center: bool = True):
    """Aspect-preserving resize + pad (host-side twin of ops/letterbox.py).

    Returns (img, ratio, (dw, dh)) like the reference LetterBox.
    """
    shape = img.shape[:2]
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if center:
        dw, dh = dw / 2, dh / 2
    if shape[::-1] != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color)
    return img, r, (dw, dh)


def augment_hsv(img: np.ndarray, rng: np.random.Generator,
                hgain: float = 0.5, sgain: float = 0.5, vgain: float = 0.5):
    """In-place HSV color jitter (reference augment contract, hsv_h/s/v keys)."""
    if hgain or sgain or vgain:
        r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
        hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
        x = np.arange(0, 256, dtype=r.dtype)
        lut_hue = ((x * r[0]) % 180).astype(img.dtype)
        lut_sat = np.clip(x * r[1], 0, 255).astype(img.dtype)
        lut_val = np.clip(x * r[2], 0, 255).astype(img.dtype)
        im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)))
        cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR, dst=img)
    return img


def random_perspective(img: np.ndarray, labels_xyxy: np.ndarray,
                       rng: np.random.Generator, degrees: float = 0.0,
                       translate: float = 0.1, scale: float = 0.5,
                       shear: float = 0.0, perspective: float = 0.0,
                       border=(0, 0), segments=None, keypoints=None):
    """Random affine/perspective warp of image + xyxy labels (+ polygons /
    keypoints).

    `border` is negative half the mosaic margin: output is
    (H + 2*border[0], W + 2*border[1]) — how mosaic's 2x canvas comes back to
    imgsz (reference random_perspective contract). When `segments` (list of
    (n, 2) pixel polygons parallel to the label rows) is given, polygons warp
    through the same matrix, boxes recompute FROM the warped polygons, and
    the call returns (img, labels, segments). When `keypoints` ((n, K, 3)
    pixel xy + visibility, parallel to label rows) is given, keypoint xy warp
    through the matrix, points landing outside the canvas become invisible
    (v=0), boxes warp via their corners, and the call returns
    (img, labels, keypoints).
    """
    height = img.shape[0] + border[0] * 2
    width = img.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2

    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)

    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)

    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)

    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * height

    M = T @ S @ R @ P @ C
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(width, height), borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(width, height), borderValue=(114, 114, 114))

    n = len(labels_xyxy)
    if n and segments is not None:
        warped_segs = []
        new = np.zeros((n, 4), np.float32)
        for i, seg in enumerate(segments):
            pts = np.ones((len(seg), 3))
            pts[:, :2] = seg
            pts = pts @ M.T
            pts = pts[:, :2] / pts[:, 2:3] if perspective else pts[:, :2]
            pts[:, 0] = pts[:, 0].clip(0, width)
            pts[:, 1] = pts[:, 1].clip(0, height)
            warped_segs.append(pts.astype(np.float32))
            new[i] = [pts[:, 0].min(), pts[:, 1].min(),
                      pts[:, 0].max(), pts[:, 1].max()]
        keep = box_candidates(labels_xyxy[:, 1:5].T * s, new.T, area_thr=0.01)
        labels_xyxy = labels_xyxy[keep]
        labels_xyxy[:, 1:5] = new[keep]
        segments = [sg for sg, k in zip(warped_segs, keep) if k]
        return img, labels_xyxy, segments
    if n:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = labels_xyxy[:, [1, 2, 3, 4, 1, 4, 3, 2]].reshape(n * 4, 2)  # 4 corners
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.stack((x.min(1), y.min(1), x.max(1), y.max(1)), axis=1)
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
        keep = box_candidates(labels_xyxy[:, 1:5].T * s, new.T)
        labels_xyxy = labels_xyxy[keep]
        labels_xyxy[:, 1:5] = new[keep]
        if keypoints is not None:
            kp = np.ones((n * keypoints.shape[1], 3))
            kp[:, :2] = keypoints[..., :2].reshape(-1, 2)
            kp = kp @ M.T
            kxy = kp[:, :2] / kp[:, 2:3] if perspective else kp[:, :2]
            kxy = kxy.reshape(n, -1, 2)
            inside = ((kxy[..., 0] >= 0) & (kxy[..., 0] < width) &
                      (kxy[..., 1] >= 0) & (kxy[..., 1] < height))
            vis = keypoints[..., 2] * inside.astype(np.float32)
            keypoints = np.concatenate([kxy, vis[..., None]],
                                       -1).astype(np.float32)[keep]
    if keypoints is not None:
        return img, labels_xyxy, keypoints
    if segments is not None:
        return img, labels_xyxy, list(segments)
    return img, labels_xyxy


def box_candidates(box1, box2, wh_thr: float = 2, ar_thr: float = 100,
                   area_thr: float = 0.1, eps: float = 1e-16):
    """Filter degenerate post-warp boxes (reference box_candidates contract)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


def mixup(img1, labels1, img2, labels2, rng: np.random.Generator):
    """Beta(32, 32) image blend, labels concatenated."""
    r = rng.beta(32.0, 32.0)
    img = (img1.astype(np.float32) * r + img2.astype(np.float32) * (1 - r)).astype(np.uint8)
    return img, np.concatenate([labels1, labels2], axis=0)


def copy_paste_flip(img: np.ndarray, labels_xyxy: np.ndarray,
                    rng: np.random.Generator, p: float = 0.5):
    """Box-level copy-paste in 'flip' mode: paste horizontally-mirrored crops
    of a fraction p of the boxes at their mirrored locations (the box-only
    approximation used when no segmentation masks exist)."""
    n = len(labels_xyxy)
    if p == 0 or n == 0:
        return img, labels_xyxy
    h, w = img.shape[:2]
    new_rows = []
    for j in rng.permutation(n)[: round(p * n)]:
        cls, x1, y1, x2, y2 = labels_xyxy[j]
        bw, bh = x2 - x1, y2 - y1
        if bw < 2 or bh < 2:
            continue
        xm1, xm2 = w - x2, w - x1   # mirrored x-range
        ious = _bbox_ioa(np.array([[xm1, y1, xm2, y2]]), labels_xyxy[:, 1:5])
        if (ious < 0.30).all():
            xi1, yi1, xi2, yi2 = int(x1), int(y1), int(x2), int(y2)
            xmi1 = int(xm1)
            crop = img[yi1:yi2, xi1:xi2]
            img[yi1:yi1 + crop.shape[0], xmi1:xmi1 + crop.shape[1]] = crop[:, ::-1]
            new_rows.append([cls, xm1, y1, xm2, y2])
    if new_rows:
        labels_xyxy = np.concatenate([labels_xyxy, np.array(new_rows, np.float32)], axis=0)
    return img, labels_xyxy


def _bbox_ioa(box1, box2, eps: float = 1e-7):
    """Intersection over box2 area: (N,4),(M,4)->(N,M)."""
    ix1 = np.maximum(box1[:, None, 0], box2[None, :, 0])
    iy1 = np.maximum(box1[:, None, 1], box2[None, :, 1])
    ix2 = np.minimum(box1[:, None, 2], box2[None, :, 2])
    iy2 = np.minimum(box1[:, None, 3], box2[None, :, 3])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    area2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1])
    return inter / (area2[None] + eps)
