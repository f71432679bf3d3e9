"""ResNetLayer / ResNetBlock / AGLU vocabulary (reference block.py:381-417,
activation.py:8-22) and the RT-DETR variant configs that use them."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_sod_tpu.nn.modules import MODULE_REGISTRY
from yolo_sod_tpu.nn.tasks import parse_model, yaml_model_load


def _n_params(tree):
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))


def test_resnet_layer_stem_shapes_and_params():
    """is_first: 7x7 s2 conv + 3x3 s2 maxpool -> 4x downsample, c2 channels."""
    m = MODULE_REGISTRY["ResNetLayer"](3, 64, 1, True, 1)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 16, 16, 64)
    # conv 7*7*3*64 + BN 2*64 (+ BN stats excluded from params collection)
    assert _n_params(v["params"]) == 7 * 7 * 3 * 64 + 2 * 64


def test_resnet_layer_stage_shapes_and_params():
    """n blocks with e=4 expansion; stride applies to the first block only.

    Reference ResNetBlock (block.py:381-395): cv1 1x1 c2, cv2 3x3 s, cv3 1x1
    4*c2 (no act), projection shortcut when shape changes, ReLU on the sum.
    """
    c1, c2, s, n = 32, 16, 2, 3
    m = MODULE_REGISTRY["ResNetLayer"](c1, c2, s, False, n)
    x = jnp.zeros((1, 16, 16, c1))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 8, 8, 4 * c2)

    def block_params(cin, stride):
        c3 = 4 * c2
        p = cin * c2 + 2 * c2          # cv1 1x1 + BN
        p += 9 * c2 * c2 + 2 * c2      # cv2 3x3 + BN
        p += c2 * c3 + 2 * c3          # cv3 1x1 + BN
        if stride != 1 or cin != c3:
            p += cin * c3 + 2 * c3     # projection shortcut + BN
        return p

    want = block_params(c1, s) + (n - 1) * block_params(4 * c2, 1)
    assert _n_params(v["params"]) == want


def test_aglu_matches_reference_formula():
    """AGLU(x) = exp(softplus_{beta=-1}(kappa*x - log lam) / lam), lam >= 1e-4
    (reference activation.py:20-22). Checked against the closed form in f64."""
    m = MODULE_REGISTRY["AGLU"]()
    x = jnp.asarray(np.random.RandomState(3).randn(2, 5, 5, 4).astype(np.float32))
    v = m.init(jax.random.PRNGKey(1), x)
    lam = max(float(v["params"]["lambd"][0]), 1e-4)
    kap = float(v["params"]["kappa"][0])
    y = np.asarray(m.apply(v, x))
    xn = np.asarray(x, dtype=np.float64)
    ref = np.exp(-np.log1p(np.exp(-(kap * xn - np.log(lam)))) / lam)
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("cfg,backbone_out", [
    ("rtdetr-resnet50.yaml", 2048),
    ("rtdetr-resnet101.yaml", 2048),
    ("rtdetr-x.yaml", 2048),
])
def test_rtdetr_variant_graphs_parse(cfg, backbone_out):
    """Channel inference (reference tasks.py:1094) and stride tracking for the
    RT-DETR variant configs; full builds are covered by the torch param-count
    comparison recorded in the module docstrings (42,771,007 / 61,763,135 /
    67,313,727 reference totals)."""
    g = parse_model(yaml_model_load(cfg))
    by_idx = {s.i: s for s in g.specs}
    bb_last = max(i for i, s in by_idx.items() if s.name in ("ResNetLayer", "HGBlock"))
    assert by_idx[bb_last].c2 == backbone_out
    assert g.specs[-1].name == "RTDETRDecoder"
    if cfg.startswith("rtdetr-resnet"):
        # stem P2/4, then three s2 stages -> P5/32 at the last backbone row
        assert by_idx[0].stride == 4 and by_idx[bb_last].stride == 32
