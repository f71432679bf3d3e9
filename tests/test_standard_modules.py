"""Unit tests for stock block/transformer vocabulary."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _run(module, *inputs, train=False, **kw):
    v = module.init(jax.random.PRNGKey(0), *inputs, train=train, **kw)
    return module.apply(v, *inputs, train=train, **kw)


@pytest.mark.parametrize("cls,kw,cin,cout", [
    ("Attention", dict(dim=64, num_heads=2), 64, 64),
    ("PSABlock", dict(c=64, num_heads=2), 64, 64),
    ("PSA", dict(c1=64, c2=64), 64, 64),
    ("C2PSA", dict(c1=64, c2=64, n=2), 64, 64),
    ("C1", dict(c1=16, c2=24, n=2), 16, 24),
    ("C2", dict(c1=16, c2=24, n=2), 16, 24),
    ("C3x", dict(c1=16, c2=24, n=2), 16, 24),
    ("RepC3", dict(c1=16, c2=24, n=2), 16, 24),
    ("BottleneckCSP", dict(c1=16, c2=24, n=2), 16, 24),
    ("RepConv", dict(c1=16, c2=16), 16, 16),
    ("LightConv", dict(c1=16, c2=24), 16, 24),
    ("CBAM", dict(c1=16), 16, 16),
    ("SPP", dict(c1=16, c2=24), 16, 24),
    ("HGBlock", dict(c1=16, cm=8, c2=16, n=3, shortcut=True), 16, 16),
])
def test_standard_blocks(cls, kw, cin, cout):
    import yolo_sod_tpu.nn.modules.standard as S

    m = getattr(S, cls)(**kw)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, cin)),
                    jnp.float32)
    y = _run(m, x)
    assert y.shape == (2, 8, 8, cout)
    assert np.isfinite(np.asarray(y)).all()


def test_hgstem_downsamples_4x():
    from yolo_sod_tpu.nn.modules.standard import HGStem

    x = jnp.ones((1, 32, 32, 3))
    y = _run(HGStem(3, 16, 32), x)
    assert y.shape == (1, 8, 8, 32)


def test_aifi_preserves_shape():
    from yolo_sod_tpu.nn.modules.transformer import AIFI

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 8, 64)),
                    jnp.float32)
    y = _run(AIFI(64, cm=128, num_heads=4), x)
    assert y.shape == x.shape


def test_msdeform_attn_uniform_weights_average():
    from yolo_sod_tpu.nn.modules.transformer import MSDeformAttn

    B, Lq, C = 1, 4, 32
    shapes = [(8, 8), (4, 4)]
    Lv = sum(h * w for h, w in shapes)
    query = jnp.ones((B, Lq, C))
    value = jnp.asarray(np.random.default_rng(0).standard_normal((B, Lv, C)),
                        jnp.float32)
    refer = jnp.full((B, Lq, 2, 2), 0.5)
    m = MSDeformAttn(d_model=C, n_levels=2, n_heads=4, n_points=2)
    v = m.init(jax.random.PRNGKey(0), query, refer, value, shapes)
    out = m.apply(v, query, refer, value, shapes)
    assert out.shape == (B, Lq, C)
    assert np.isfinite(np.asarray(out)).all()


def test_mlp():
    from yolo_sod_tpu.nn.modules.transformer import MLP

    m = MLP(hidden_dim=32, output_dim=4, num_layers=3)
    v = m.init(jax.random.PRNGKey(0), jnp.ones((2, 16)))
    assert m.apply(v, jnp.ones((2, 16))).shape == (2, 4)
