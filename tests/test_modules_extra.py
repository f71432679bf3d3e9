"""Unit tests for the MambaFusion/MGDFIS family, aux heads, stable variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _run(module, *inputs, train=False):
    v = module.init(jax.random.PRNGKey(0), *inputs, train=train)
    return module.apply(v, *inputs, train=train)


def test_simam_parameter_free():
    from yolo_sod_tpu.nn.modules.extra import SimAM

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 8, 16)), jnp.float32)
    m = SimAM()
    v = m.init(jax.random.PRNGKey(0), x)
    assert not jax.tree_util.tree_leaves(v.get("params", {}))  # no params
    assert m.apply(v, x).shape == x.shape


@pytest.mark.parametrize("cls,kw,cin,cout", [
    ("VimBlock", dict(c1=16, c2=16), 16, 16),
    ("CompactInvertedBlock", dict(c1=16, c2=24), 16, 24),
    ("FusionLockTSS", dict(channels=16), 16, 16),
    ("GlobalDetail", dict(channels=16), 16, 16),
    ("DynamicPixelAttn", dict(channels=16), 16, 16),
    ("MFBlock", dict(ch_in=16, ch_hidden=32), 16, 16),
    ("BiFormerLiteBlock", dict(c=16, win=4, topk=8, num_heads=4), 16, 16),
    ("LayerNorm2d", dict(num_channels=16), 16, 16),
])
def test_single_input_modules(cls, kw, cin, cout):
    import yolo_sod_tpu.nn.modules.extra as E

    m = getattr(E, cls)(**kw)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 8, 8, cin)), jnp.float32)
    y = _run(m, x)
    assert y.shape == (2, 8, 8, cout)
    assert np.isfinite(np.asarray(y)).all()


def test_ca_fpn_and_hyperace_stable_fuse_two_levels():
    from yolo_sod_tpu.nn.modules.extra import CA_FPN_Block, HyperACEBlockStable

    high = jnp.ones((1, 4, 4, 32))
    low = jnp.ones((1, 8, 8, 16))
    y = _run(CA_FPN_Block(in_low=16, in_high=32, out=24), [high, low])
    assert y.shape == (1, 8, 8, 24)
    y = _run(HyperACEBlockStable(c_in_high=32, c_in_low=16, c_out=24), [high, low])
    assert y.shape == (1, 8, 8, 24)


def test_decoupled_heads():
    from yolo_sod_tpu.nn.modules.extra import (DecoupledHead, DecoupledHeadLite,
                                               MFDecHead)

    x = jnp.ones((1, 8, 8, 32))
    cls, obj, ctr, iou, box = _run(DecoupledHeadLite(32, 16, 10), x)
    assert cls.shape == (1, 8, 8, 10) and box.shape == (1, 8, 8, 4)
    cls, reg, obj = _run(DecoupledHead(32, 10, reg_max=16), x)
    assert reg.shape == (1, 8, 8, 4)   # DFL expectation applied
    cls, reg, obj = _run(MFDecHead(nc=10, ch_in=32), x)
    assert cls.shape == (1, 8, 8, 10)


def test_sra_head_upsamples():
    from yolo_sod_tpu.nn.modules.extra import SRAHead

    x = jnp.ones((1, 4, 4, 64))
    m = SRAHead(64, out_channels=3, up_factor=8)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 32, 32, 3)
    assert float(y.min()) >= 0 and float(y.max()) <= 1


def test_detr_aux_head():
    from yolo_sod_tpu.nn.modules.extra import DETRAuxHead

    x = jnp.ones((2, 8, 8, 32))
    m = DETRAuxHead(input_channels=32, num_queries=20, num_classes=10,
                    hidden_dim=64, num_heads=4, num_encoder_layers=2)
    v = m.init(jax.random.PRNGKey(0), x)
    logits, boxes = m.apply(v, x)
    assert logits.shape == (2, 20, 10)
    assert boxes.shape == (2, 20, 4)
    assert float(boxes.min()) >= 0 and float(boxes.max()) <= 1
