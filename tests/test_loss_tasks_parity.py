"""Task-criterion parity vs the torch reference: identical (preds, targets)
through reference v8SegmentationLoss / v8PoseLoss / v8OBBLoss and our
SegmentationLoss / PoseLoss / OBBLoss must produce matching loss items.

Completes the criterion half of the accuracy-parity chain for the aux tasks
(detect is covered by tests/test_loss_parity.py). Reference:
/root/reference/ultralytics/utils/loss.py:263-730, tal.py:298-330.
"""

from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.is_dir(), reason="reference unavailable")

B, NC, IMGSZ = 2, 6, 64
STRIDES = (8, 16, 32)
REG_MAX = 16
NO = NC + 4 * REG_MAX


def _install():
    from tests.reference_shim import install

    install()


def _det_feats(seed: int = 0):
    rng = np.random.default_rng(seed)
    feats = []
    for s in STRIDES:
        h = IMGSZ // s
        f = rng.normal(0, 1.0, (B, h, h, NO)).astype(np.float32)
        f[..., 4 * REG_MAX:] -= 6.0
        feats.append(f)
    return feats


def _level_maps(ch: int, seed: int, scale: float = 1.0):
    rng = np.random.default_rng(seed)
    return [rng.normal(0, scale, (B, IMGSZ // s, IMGSZ // s, ch)).astype(np.float32)
            for s in STRIDES]


def _targets(seed: int = 1, extra_cols: int = 0):
    """Padded (ours) + flat batch_idx (reference) GT boxes."""
    rng = np.random.default_rng(seed)
    counts = [3, 2]
    M = max(counts)
    cls = np.zeros((B, M), np.float32)
    boxes = np.zeros((B, M, 4), np.float32)
    mask = np.zeros((B, M), np.float32)
    flat_idx, flat_cls, flat_box = [], [], []
    for b, n in enumerate(counts):
        for j in range(n):
            c = float(rng.integers(0, NC))
            w, h = rng.uniform(0.2, 0.5, 2)
            cx = rng.uniform(w / 2, 1 - w / 2)
            cy = rng.uniform(h / 2, 1 - h / 2)
            cls[b, j], boxes[b, j], mask[b, j] = c, (cx, cy, w, h), 1.0
            flat_idx.append(b)
            flat_cls.append(c)
            flat_box.append((cx, cy, w, h))
    ours = {"cls": cls, "bboxes": boxes, "mask_gt": mask}
    ref = {"batch_idx": np.array(flat_idx, np.float32),
           "cls": np.array(flat_cls, np.float32),
           "bboxes": np.array(flat_box, np.float32)}
    return ours, ref, counts


def _to_torch_feats(feats):
    import torch

    return [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats]


def _flat_anchor_maps(maps):
    """Per-level NHWC (B, H, W, C) → torch (B, C, A) train-format tensor."""
    import torch

    flat = np.concatenate([m.reshape(B, -1, m.shape[-1]) for m in maps], 1)
    return torch.from_numpy(flat.transpose(0, 2, 1).copy())


def test_segmentation_loss_matches_reference():
    import torch

    _install()
    from ultralytics.utils.loss import v8SegmentationLoss

    import jax.numpy as jnp

    from yolo_sod_tpu.utils.loss_tasks import SegmentationLoss

    NM = 8
    Hm = Wm = IMGSZ // 4
    feats = _det_feats(0)
    coeff_maps = _level_maps(NM, seed=10)
    rng = np.random.default_rng(11)
    protos = rng.normal(0, 1.0, (B, Hm, Wm, NM)).astype(np.float32)
    ours, ref, counts = _targets(1)
    M = max(counts)
    masks = (rng.random((B, M, Hm, Wm)) > 0.5).astype(np.float32)
    N = sum(counts)
    flat_masks = np.concatenate(
        [masks[b, :n] for b, n in enumerate(counts)], 0)      # (N, Hm, Wm)

    detect = SimpleNamespace(stride=torch.tensor(STRIDES, dtype=torch.float32),
                             nc=NC, reg_max=REG_MAX)
    model = SimpleNamespace(
        model=[detect],
        args=SimpleNamespace(box=7.5, cls=0.5, dfl=1.5, overlap_mask=False),
        parameters=lambda: iter([torch.zeros(1)]))
    crit_t = v8SegmentationLoss(model)
    preds_t = (_to_torch_feats(feats), _flat_anchor_maps(coeff_maps),
               torch.from_numpy(protos.transpose(0, 3, 1, 2).copy()))
    batch_t = {k: torch.from_numpy(v) for k, v in ref.items()}
    batch_t["masks"] = torch.from_numpy(flat_masks)
    total_t, items_t = crit_t(preds_t, batch_t)

    crit_j = SegmentationLoss(nc=NC, strides=STRIDES, max_fg=64)
    preds_j = ([jnp.asarray(f) for f in feats],
               [jnp.asarray(c) for c in coeff_maps], jnp.asarray(protos))
    batch_j = {**{k: jnp.asarray(v) for k, v in ours.items()},
               "masks": jnp.asarray(masks)}
    total_j, items_j = crit_j(preds_j, batch_j)

    np.testing.assert_allclose(np.asarray(items_j), items_t.numpy(),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(float(total_j), float(total_t), rtol=1e-3)


def test_pose_loss_matches_reference():
    import torch

    _install()
    from ultralytics.utils.loss import v8PoseLoss

    import jax.numpy as jnp

    from yolo_sod_tpu.utils.loss_tasks import PoseLoss

    K, D = 17, 3
    feats = _det_feats(2)
    kpt_maps = _level_maps(K * D, seed=20, scale=0.5)
    ours, ref, counts = _targets(3)
    M = max(counts)
    rng = np.random.default_rng(21)
    kpts = np.zeros((B, M, K, D), np.float32)
    flat_kpts = []
    for b, n in enumerate(counts):
        for j in range(n):
            xy = rng.uniform(0.1, 0.9, (K, 2)).astype(np.float32)
            vis = rng.integers(0, 3, (K, 1)).astype(np.float32)
            kp = np.concatenate([xy, vis], -1)
            kpts[b, j] = kp
            flat_kpts.append(kp)

    detect = SimpleNamespace(stride=torch.tensor(STRIDES, dtype=torch.float32),
                             nc=NC, reg_max=REG_MAX, kpt_shape=[K, D])
    model = SimpleNamespace(
        model=[detect],
        args=SimpleNamespace(box=7.5, cls=0.5, dfl=1.5, pose=12.0, kobj=1.0),
        parameters=lambda: iter([torch.zeros(1)]))
    crit_t = v8PoseLoss(model)
    preds_t = (_to_torch_feats(feats), _flat_anchor_maps(kpt_maps))
    batch_t = {k: torch.from_numpy(v) for k, v in ref.items()}
    batch_t["keypoints"] = torch.from_numpy(np.stack(flat_kpts))
    total_t, items_t = crit_t(preds_t, batch_t)

    crit_j = PoseLoss(nc=NC, strides=STRIDES, kpt_shape=(K, D), max_fg=64)
    preds_j = ([jnp.asarray(f) for f in feats], [jnp.asarray(k) for k in kpt_maps])
    batch_j = {**{k: jnp.asarray(v) for k, v in ours.items()},
               "keypoints": jnp.asarray(kpts)}
    total_j, items_j = crit_j(preds_j, batch_j)

    np.testing.assert_allclose(np.asarray(items_j), items_t.numpy(),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(float(total_j), float(total_t), rtol=1e-3)


def test_obb_loss_matches_reference():
    import torch

    _install()
    from ultralytics.utils.loss import v8OBBLoss

    import jax.numpy as jnp

    from yolo_sod_tpu.utils.loss_tasks import OBBLoss

    import math

    feats = _det_feats(4)
    rng = np.random.default_rng(31)
    # Angle maps already decoded to radians, like the OBB head emits.
    angle_maps = [((1 / (1 + np.exp(-rng.normal(0, 1.0, (B, IMGSZ // s, IMGSZ // s, 1))))
                    - 0.25) * math.pi).astype(np.float32) for s in STRIDES]
    ours, ref, counts = _targets(5)
    M = max(counts)
    angles = np.zeros((B, M), np.float32)
    flat_ang = []
    for b, n in enumerate(counts):
        for j in range(n):
            a = float(rng.uniform(-0.6, 0.9))
            angles[b, j] = a
            flat_ang.append(a)

    detect = SimpleNamespace(stride=torch.tensor(STRIDES, dtype=torch.float32),
                             nc=NC, reg_max=REG_MAX)
    model = SimpleNamespace(
        model=[detect],
        args=SimpleNamespace(box=7.5, cls=0.5, dfl=1.5),
        parameters=lambda: iter([torch.zeros(1)]))
    crit_t = v8OBBLoss(model)
    preds_t = (_to_torch_feats(feats), _flat_anchor_maps(angle_maps))
    rboxes = np.concatenate([ref["bboxes"],
                             np.array(flat_ang, np.float32)[:, None]], -1)
    batch_t = {"batch_idx": torch.from_numpy(ref["batch_idx"]),
               "cls": torch.from_numpy(ref["cls"]),
               "bboxes": torch.from_numpy(rboxes)}
    total_t, items_t = crit_t(preds_t, batch_t)

    crit_j = OBBLoss(nc=NC, strides=STRIDES, max_fg=64)
    preds_j = ([jnp.asarray(f) for f in feats],
               [jnp.asarray(a) for a in angle_maps])
    batch_j = {**{k: jnp.asarray(v) for k, v in ours.items()},
               "angles": jnp.asarray(angles)}
    total_j, items_j = crit_j(preds_j, batch_j)

    np.testing.assert_allclose(np.asarray(items_j), items_t.numpy(),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(float(total_j), float(total_t), rtol=1e-3)
