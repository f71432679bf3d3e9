"""DETR/RT-DETR loss + CDN parity vs the torch reference.

Feeds identical predictions/GT through the reference DETRLoss /
RTDETRDetectionLoss / get_cdn_group (models/utils/loss.py:13,291,
models/utils/ops.py:150, imported via the shim) and ours; asserts the loss
dicts match term for term and the noise-free CDN group is bit-identical in
layout (slots, logit boxes, attention mask, meta)."""

from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.is_dir(), reason="reference unavailable")


@pytest.fixture(scope="module")
def torch_ref():
    import sys
    sys.path.insert(0, str(Path(__file__).parent))
    import reference_shim
    if not reference_shim.install():
        pytest.skip("reference shim unavailable")
    import torch
    from ultralytics.models.utils.loss import DETRLoss as TorchDETRLoss
    from ultralytics.models.utils.loss import \
        RTDETRDetectionLoss as TorchRTDETRLoss
    from ultralytics.models.utils.ops import get_cdn_group as torch_cdn
    return torch, TorchDETRLoss, TorchRTDETRLoss, torch_cdn


def _unambiguous_preds(L=3, B=2, Q=6, nc=3, seed=0):
    """Predictions whose optimal assignment is unique: two queries per image
    sit exactly on their GT with confident logits, the rest far away."""
    rng = np.random.default_rng(seed)
    gt_boxes = np.array([[0.30, 0.30, 0.20, 0.20], [0.70, 0.60, 0.10, 0.14],
                         [0.50, 0.52, 0.24, 0.30]], np.float32)
    gt_cls = np.array([1, 0, 2])
    gt_groups = [2, 1]
    pb = np.tile(np.array([0.06, 0.06, 0.02, 0.02], np.float32), (L, B, Q, 1))
    pb += rng.uniform(-0.005, 0.005, pb.shape).astype(np.float32)
    ps = rng.uniform(-6.0, -4.0, (L, B, Q, nc)).astype(np.float32)
    # image 0: queries 1, 4 -> gts 0, 1 ; image 1: query 2 -> gt 2
    for li in range(L):
        pb[li, 0, 1], pb[li, 0, 4] = gt_boxes[0], gt_boxes[1]
        ps[li, 0, 1, gt_cls[0]] = 5.0
        ps[li, 0, 4, gt_cls[1]] = 5.0
        pb[li, 1, 2] = gt_boxes[2]
        ps[li, 1, 2, gt_cls[2]] = 5.0
    return pb, ps, gt_boxes, gt_cls, gt_groups


@pytest.mark.parametrize("use_vfl", [False, True])
def test_detr_loss_matches_reference(torch_ref, use_vfl):
    torch, TorchDETRLoss, _, _ = torch_ref
    from yolo_sod_tpu.models.utils.loss import DETRLoss

    nc = 3
    pb, ps, gt_boxes, gt_cls, gt_groups = _unambiguous_preds(nc=nc)
    ref = TorchDETRLoss(nc=nc, aux_loss=True, use_fl=True, use_vfl=use_vfl)
    batch_t = {"cls": torch.tensor(gt_cls), "bboxes": torch.tensor(gt_boxes),
               "gt_groups": gt_groups}
    out_ref = ref.forward(torch.tensor(pb), torch.tensor(ps), batch_t)

    ours = DETRLoss(nc=nc, aux_loss=True, use_fl=True, use_vfl=use_vfl)
    out = ours(pb, ps, {"cls": gt_cls, "bboxes": gt_boxes,
                        "gt_groups": gt_groups})

    for k in ("loss_class", "loss_bbox", "loss_giou",
              "loss_class_aux", "loss_bbox_aux", "loss_giou_aux"):
        a, b = float(out[k]), float(out_ref[k])
        assert abs(a - b) < 1e-3 * max(1.0, abs(b)), (k, a, b)


def test_cdn_group_noise_free_matches_reference(torch_ref):
    """cls_noise_ratio=0 / box_noise_scale=0 removes all randomness: slot
    layout, embeddings, boxes, attention mask, and meta must match exactly."""
    torch, _, _, torch_cdn = torch_ref
    from yolo_sod_tpu.models.utils.loss import get_cdn_group

    nc, nq, num_dn = 4, 10, 8
    gt_cls = np.array([0, 1, 2])
    gt_boxes = np.array([[0.3, 0.3, 0.2, 0.2], [0.6, 0.6, 0.1, 0.1],
                         [0.5, 0.5, 0.3, 0.3]], np.float32)
    gt_groups = [2, 1]
    W = np.random.default_rng(0).standard_normal((nc, 16)).astype(np.float32)

    batch_t = {"cls": torch.tensor(gt_cls), "bboxes": torch.tensor(gt_boxes),
               "gt_groups": gt_groups,
               "batch_idx": torch.tensor([0, 0, 1])}
    ref_cls, ref_box, ref_attn, ref_meta = torch_cdn(
        batch_t, nc, nq, torch.tensor(W), num_dn=num_dn,
        cls_noise_ratio=0.0, box_noise_scale=0.0, training=True)

    cls_q, box_q, attn, meta = get_cdn_group(
        {"cls": gt_cls, "bboxes": gt_boxes, "gt_groups": gt_groups},
        nc, nq, None, num_dn=num_dn, cls_noise_ratio=0.0,
        box_noise_scale=0.0, training=True)

    live = meta["dn_num_split"][0]
    assert ref_meta["dn_num_group"] == meta["dn_num_group"]
    assert ref_meta["dn_num_split"] == meta["dn_num_split"]
    assert ref_cls.shape[1] == live == cls_q.shape[1]  # capacity defaults to live

    # Slot classes -> embeddings: reference stores W[cls]; empty slots zeros.
    ours_embed = np.where((cls_q >= 0)[..., None], W[np.clip(cls_q, 0, nc - 1)], 0.0)
    np.testing.assert_allclose(ours_embed, ref_cls.numpy(), atol=1e-6)
    np.testing.assert_allclose(box_q, ref_box.numpy(), atol=1e-6)
    np.testing.assert_array_equal(attn, ref_attn.numpy())

    # Positive-slot reconstruction targets == reference dn_pos_idx layout.
    for b, pos in enumerate(ref_meta["dn_pos_idx"]):
        got = np.nonzero(meta["tgt_mask"][b])[0]
        np.testing.assert_array_equal(np.sort(pos.numpy()), np.sort(got))


def test_rtdetr_dn_loss_matches_reference(torch_ref):
    """Full RTDETRDetectionLoss with denoising: identical preds + noise-free
    CDN meta through both implementations."""
    torch, _, TorchRTDETRLoss, torch_cdn = torch_ref
    from yolo_sod_tpu.models.utils.loss import (RTDETRDetectionLoss,
                                                get_cdn_group)

    nc, nq, num_dn, L = 3, 6, 4, 3     # layer 0 = enc, 1..L-1 = decoder
    pb, ps, gt_boxes, gt_cls, gt_groups = _unambiguous_preds(L=L, Q=nq, nc=nc)

    ours_cdn = get_cdn_group(
        {"cls": gt_cls, "bboxes": gt_boxes, "gt_groups": gt_groups},
        nc, nq, None, num_dn=num_dn, cls_noise_ratio=0.0, box_noise_scale=0.0,
        training=True)
    _, _, _, meta = ours_cdn
    D = meta["capacity"]

    rng = np.random.default_rng(7)
    dn_b = (rng.uniform(0.2, 0.8, (L - 1, 2, D, 4))).astype(np.float32)
    dn_s = rng.uniform(-5, -3, (L - 1, 2, D, nc)).astype(np.float32)
    enc_b, enc_s = pb[0], ps[0]
    dec_b, dec_s = pb[1:], ps[1:]

    # --- reference ---
    batch_t = {"cls": torch.tensor(gt_cls), "bboxes": torch.tensor(gt_boxes),
               "gt_groups": gt_groups, "batch_idx": torch.tensor([0, 0, 1])}
    _, _, _, ref_meta = torch_cdn(batch_t, nc, nq, torch.eye(nc, 8),
                                  num_dn=num_dn, cls_noise_ratio=0.0,
                                  box_noise_scale=0.0, training=True)
    ref = TorchRTDETRLoss(nc=nc, aux_loss=True, use_fl=True, use_vfl=True)
    ref_pred_b = torch.tensor(np.concatenate([enc_b[None], dec_b], 0))
    ref_pred_s = torch.tensor(np.concatenate([enc_s[None], dec_s], 0))
    out_ref = ref.forward((ref_pred_b, ref_pred_s), batch_t,
                          dn_bboxes=torch.tensor(dn_b),
                          dn_scores=torch.tensor(dn_s), dn_meta=ref_meta)

    # --- ours: decoder emits dn prefix + match queries per layer ---
    preds = {"dec_bboxes": np.concatenate([dn_b, dec_b], 2),
             "dec_scores": np.concatenate([dn_s, dec_s], 2),
             "enc_bboxes": enc_b, "enc_scores": enc_s}
    ours = RTDETRDetectionLoss(nc=nc, aux_loss=True, use_fl=True, use_vfl=True)
    out = ours(preds, {"cls": gt_cls, "bboxes": gt_boxes,
                       "gt_groups": gt_groups}, dn_meta=meta)

    for k in ("loss_class", "loss_bbox", "loss_giou",
              "loss_class_aux", "loss_bbox_aux", "loss_giou_aux",
              "loss_class_dn", "loss_bbox_dn", "loss_giou_dn",
              "loss_class_aux_dn", "loss_bbox_aux_dn", "loss_giou_aux_dn"):
        a, b = float(out[k]), float(out_ref[k])
        assert abs(a - b) < 2e-3 * max(1.0, abs(b)), (k, a, b)
