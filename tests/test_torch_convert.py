"""Torch→JAX weight-conversion fidelity: the converted model must reproduce
the reference torch model's forward outputs within fp tolerance.

Builds the REFERENCE torch model (random init) via tests/reference_shim,
converts its state_dict, and compares per-level raw head maps. This validates
both the key mapping and our module numerics (Conv+BN+SiLU, C2f, SPPF,
Detect towers) against torch ground truth.
"""

from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.is_dir(), reason="reference unavailable")


@pytest.mark.parametrize("cfg", ["E1.yaml", "E2.yaml",
                                 "yolov12-sod-fusion-v5-simple.yaml"])
def test_convert_reproduces_torch_forward(cfg):
    import torch

    from tests.reference_shim import build_torch_model
    from yolo_sod_tpu.nn.tasks import DetectionModel
    from yolo_sod_tpu.utils.torch_convert import convert_torch_checkpoint

    tm = build_torch_model(str(REF / "ultralytics/cfg/models/new" / cfg))
    tm.eval()
    x = np.random.default_rng(0).random((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        tm(torch.zeros(1, 3, 64, 64))     # materialize lazy SE convs
        decoded, raw = tm(torch.from_numpy(x))

    ours = DetectionModel(cfg)
    ours.init(imgsz=64)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables, report = convert_torch_checkpoint(sd, ours)
    # Every torch tensor must land somewhere; every target leaf must be filled.
    assert not report["unused"], f"unmatched torch keys: {report['unused'][:5]}"
    assert not report["missing"], f"unfilled target leaves: {report['missing'][:5]}"

    import jax.numpy as jnp

    feats = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    assert len(feats) == len(raw)
    for f_jax, f_torch in zip(feats, raw):
        got = np.asarray(f_jax).transpose(0, 3, 1, 2)   # NHWC -> NCHW
        want = f_torch.detach().numpy()
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("task", ["segment", "pose", "obb"])
def test_convert_reproduces_torch_task_forward(task):
    """Shared-weight forward parity for the seg/pose/obb task heads: the
    reference torch task model (tasks.py:425-463; head.py Segment :175,
    OBB :200, Pose :230) built from OUR task YAML, weights converted, raw
    detect maps + task tensors (mask coeffs + protos / kpt logits / decoded
    angles) compared per level."""
    import torch

    from tests.reference_shim import build_torch_task_model
    from yolo_sod_tpu.nn import tasks as our_tasks
    from yolo_sod_tpu.utils.torch_convert import convert_torch_checkpoint

    cfg = f"yolov12-{task if task != 'segment' else 'seg'}.yaml"
    cfg_path = Path(__file__).parents[1] / "yolo_sod_tpu/cfg/models" / cfg
    tm = build_torch_task_model(str(cfg_path), task)
    tm.eval()
    x = np.random.default_rng(1).random((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        tm(torch.zeros(1, 3, 64, 64))
        _, aux = tm(torch.from_numpy(x))
    if task == "segment":
        raw, mc, proto = aux          # mc (1, nm, A); proto (1, nm, 2H0, 2W0)
    else:
        raw, extra = aux              # kpt (1, nk, A) / angle (1, ne, A)

    cls = {"segment": our_tasks.SegmentationModel,
           "pose": our_tasks.PoseModel, "obb": our_tasks.OBBModel}[task]
    ours = cls(cfg)
    ours.init(imgsz=64)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables, report = convert_torch_checkpoint(sd, ours)
    assert not report["unused"], f"unmatched torch keys: {report['unused'][:5]}"
    assert not report["missing"], f"unfilled target leaves: {report['missing'][:5]}"

    import jax.numpy as jnp

    out = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     train=False)
    det_maps = out[0]
    assert len(det_maps) == len(raw)
    for f_jax, f_torch in zip(det_maps, raw):
        got = np.asarray(f_jax).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, f_torch.detach().numpy(),
                                   rtol=5e-3, atol=5e-3)

    def cat_levels(maps):  # per-level (B, H, W, C) -> (B, C, sum HW)
        return np.concatenate(
            [np.asarray(m).reshape(m.shape[0], -1, m.shape[-1]) for m in maps],
            axis=1).transpose(0, 2, 1)

    if task == "segment":
        np.testing.assert_allclose(cat_levels(out[1]), mc.detach().numpy(),
                                   rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(out[2]).transpose(0, 3, 1, 2), proto.detach().numpy(),
            rtol=5e-3, atol=5e-3)
    else:
        np.testing.assert_allclose(cat_levels(out[1]), extra.detach().numpy(),
                                   rtol=5e-3, atol=5e-3)


def test_convert_report_flags_shape_mismatch():
    from yolo_sod_tpu.nn.tasks import DetectionModel
    from yolo_sod_tpu.utils.torch_convert import convert_torch_checkpoint

    m = DetectionModel("E1.yaml")
    m.init(imgsz=64)
    bogus = {"model.0.conv.weight": np.zeros((7, 7, 7, 7), np.float32)}
    _, report = convert_torch_checkpoint(bogus, m)
    assert report["unused"] == ["model.0.conv.weight"]
