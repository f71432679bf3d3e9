"""RT-DETR decoder shared-weight forward parity vs the torch reference.

Builds the REFERENCE RTDETRDecoder (random init) via the shim, converts its
state_dict with convert_rtdetr_decoder, and compares the eval forward
(B, nq, 4+nc) on identical feature maps. Proves our deformable-attention
sampling, packed-MHA split, anchor generation, and query-selection numerics
against torch ground truth (reference nn/modules/head.py:361-565,
transformer.py:218-427)."""

from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.is_dir(), reason="reference unavailable")


def test_rtdetr_decoder_forward_matches_torch():
    import sys
    sys.path.insert(0, str(Path(__file__).parent))
    import reference_shim
    if not reference_shim.install():
        pytest.skip("reference shim unavailable")
    import torch
    from ultralytics.nn.modules.head import RTDETRDecoder as TorchDecoder

    import jax
    import jax.numpy as jnp
    from yolo_sod_tpu.nn.modules.rtdetr_head import RTDETRDecoder
    from yolo_sod_tpu.utils.torch_convert import convert_rtdetr_decoder

    nc, ch, hd, nq, ndl, nh = 3, (32, 64), 32, 16, 2, 8
    torch.manual_seed(0)
    td = TorchDecoder(nc=nc, ch=ch, hd=hd, nq=nq, ndl=ndl, nh=nh)
    td.eval()

    rng = np.random.default_rng(0)
    f1 = rng.standard_normal((2, 32, 16, 16)).astype(np.float32)
    f2 = rng.standard_normal((2, 64, 8, 8)).astype(np.float32)
    with torch.no_grad():
        y_ref, _ = td([torch.tensor(f1), torch.tensor(f2)])
    y_ref = y_ref.numpy()                              # (B, nq, 4+nc)

    sd = {k: v.numpy() for k, v in td.state_dict().items()}
    P, S = convert_rtdetr_decoder(sd, nh=nh)

    ours = RTDETRDecoder(nc=nc, ch=ch, hd=hd, nq=nq, ndl=ndl, nh=nh)
    xs = [jnp.asarray(f1.transpose(0, 2, 3, 1)),
          jnp.asarray(f2.transpose(0, 2, 3, 1))]
    init_vars = ours.init(jax.random.PRNGKey(0), xs, train=False)
    # Converted trees must cover every initialized leaf exactly.
    ref_paths = {p for p, _ in jax.tree_util.tree_leaves_with_path(
        init_vars["params"])}
    got_paths = {p for p, _ in jax.tree_util.tree_leaves_with_path(P)}
    assert ref_paths == got_paths, (
        sorted(str(p) for p in ref_paths - got_paths)[:5],
        sorted(str(p) for p in got_paths - ref_paths)[:5])

    y = ours.apply({"params": P, "batch_stats": S}, xs, train=False)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-3, atol=2e-3)
