"""Unit tests for MAFN modules: SSM scan, BRA routing, RAFB, model builds.

The reference has NO tests for its custom modules (SURVEY.md §4) — this file
closes that gap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_selective_scan_matches_sequential():
    """Associative-scan SSM == step-by-step recurrence."""
    from yolo_sod_tpu.nn.modules.ssm import selective_scan

    rng = np.random.default_rng(0)
    b, L, d, n = 2, 9, 4, 3
    u = jnp.asarray(rng.standard_normal((b, L, d)), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.01, 0.3, (b, L, d)), jnp.float32)
    A = -jnp.asarray(rng.uniform(0.5, 2.0, (d, n)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((b, L, n)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((b, L, n)), jnp.float32)
    D = jnp.asarray(rng.standard_normal(d), jnp.float32)

    y = selective_scan(u, dt, A, B, C, D)

    # Sequential reference.
    h = np.zeros((b, d, n))
    ys = []
    for t in range(L):
        g = np.exp(np.asarray(dt[:, t, :, None]) * np.asarray(A)[None])
        f = np.asarray((dt[:, t] * u[:, t]))[:, :, None] * np.asarray(B[:, t])[:, None, :]
        h = g * h + f
        ys.append((h * np.asarray(C[:, t])[:, None, :]).sum(-1)
                  + np.asarray(u[:, t]) * np.asarray(D))
    y_ref = np.stack(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-4)


def test_mamba_block_shapes_and_residual():
    from yolo_sod_tpu.nn.modules.ssm import MambaBlock

    m = MambaBlock(32, c_hidden=64, seq_reduction=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 12, 32)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_bra_matches_dense_when_topk_covers_all_regions():
    """With topk >= #regions, BRA must equal full window-to-all attention."""
    from yolo_sod_tpu.nn.modules.fusion import BiLevelRoutingAttention

    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 8, 8, 16)), jnp.float32)
    m = BiLevelRoutingAttention(16, num_heads=2, window_size=4, topk=16)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_bra_pads_non_multiple_shapes():
    from yolo_sod_tpu.nn.modules.fusion import BiLevelRoutingAttention

    x = jnp.zeros((1, 10, 14, 16))
    m = BiLevelRoutingAttention(16, num_heads=2, window_size=8, topk=2)
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == x.shape


def test_rafb_forward():
    from yolo_sod_tpu.nn.modules.fusion import RecurrentAttentionFusionBlock

    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 8, 8, 24)), jnp.float32)
    m = RecurrentAttentionFusionBlock(24, 32, gru_hidden_dim=16, n_heads=4)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 8, 8, 32)
    assert np.isfinite(np.asarray(y)).all()


def test_sageattention2():
    from yolo_sod_tpu.nn.modules.fusion import SageAttention2

    x = jnp.ones((1, 6, 6, 16))
    m = SageAttention2(16)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape


@pytest.mark.parametrize("cfg,n_scales", [
    ("yolov12-sod-fusion-v5.yaml", 4),
    ("yolov12-sod-fusion-v5-stable.yaml", 4),
    ("E1.yaml", 3),
    ("E2.yaml", 4),
    ("E3.yaml", 4),
    ("E4.yaml", 4),
    ("E5.yaml", 4),
    ("E6.yaml", 4),
])
def test_all_model_yamls_build_and_run(cfg, n_scales):
    from yolo_sod_tpu.nn.tasks import DetectionModel

    m = DetectionModel(cfg)
    m.init(imgsz=64)
    x = jnp.zeros((1, 64, 64, 3))
    feats = m.apply(m.variables, x, train=False)
    assert len(feats) == n_scales
    assert len(m.stride) == n_scales
    if n_scales == 4:
        assert list(m.stride) == [4, 8, 16, 32]
    else:
        assert list(m.stride) == [8, 16, 32]


def test_pallas_scan_matches_associative_interpret():
    """Pallas kernel (interpret mode on CPU) == associative scan."""
    from yolo_sod_tpu.nn.modules.ssm import selective_scan
    from yolo_sod_tpu.ops.pallas_scan import selective_scan_pallas

    rng = np.random.default_rng(3)
    b, L, d, n = 2, 70, 256, 16
    u = jnp.asarray(rng.standard_normal((b, L, d)), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.01, 0.3, (b, L, d)), jnp.float32)
    A = -jnp.asarray(rng.uniform(0.5, 2.0, (d, n)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((b, L, n)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((b, L, n)), jnp.float32)
    D = jnp.asarray(rng.standard_normal(d), jnp.float32)
    ref = selective_scan(u, dt, A, B, C, D)
    got = selective_scan_pallas(u, dt, A, B, C, D, chunk=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_selective_scan_fast_grad():
    """custom_vjp backward works and matches direct differentiation."""
    from yolo_sod_tpu.nn.modules.ssm import selective_scan, selective_scan_fast

    rng = np.random.default_rng(4)
    b, L, d, n = 1, 9, 8, 4
    args = (
        jnp.asarray(rng.standard_normal((b, L, d)), jnp.float32),
        jnp.asarray(rng.uniform(0.01, 0.3, (b, L, d)), jnp.float32),
        -jnp.asarray(rng.uniform(0.5, 2.0, (d, n)), jnp.float32),
        jnp.asarray(rng.standard_normal((b, L, n)), jnp.float32),
        jnp.asarray(rng.standard_normal((b, L, n)), jnp.float32),
        jnp.asarray(rng.standard_normal(d), jnp.float32),
    )
    g_fast = jax.grad(lambda *a: selective_scan_fast(*a).sum(), argnums=(0, 2))(*args)
    g_ref = jax.grad(lambda *a: selective_scan(*a).sum(), argnums=(0, 2))(*args)
    for a, b_ in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


def test_flash_attention_matches_einsum_interpret():
    from yolo_sod_tpu.ops.pallas_attention import flash_attention

    rng = np.random.default_rng(5)
    BH, Lq, Lk, D = 2, 100, 150, 32
    q = jnp.asarray(rng.standard_normal((BH, Lq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((BH, Lk, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((BH, Lk, D)), jnp.float32)
    ref = jnp.einsum("bqk,bkd->bqd",
                     jax.nn.softmax(jnp.einsum("bqd,bkd->bqk", q, k) * D ** -0.5, -1),
                     v)
    got = flash_attention(q, k, v, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_mhsa_dispatch_cpu():
    from yolo_sod_tpu.ops.pallas_attention import fused_mhsa

    q = jnp.ones((2, 16, 8))
    out = fused_mhsa(q, q, q)   # CPU -> einsum path
    assert out.shape == (2, 16, 8)


def test_sage_attention_int8_close_to_fp_interpret():
    """INT8 quantized attention stays within the SageAttention accuracy
    regime (~1e-2) of the fp reference, incl. ragged KV-padding masking."""
    from yolo_sod_tpu.ops.pallas_attention_int8 import sage_attention

    rng = np.random.default_rng(7)
    BH, Lq, Lk, D = 2, 100, 150, 32
    q = jnp.asarray(rng.standard_normal((BH, Lq, D)), jnp.float32)
    # Biased K exercises the smoothing step (mean-subtraction invariance).
    k = jnp.asarray(rng.standard_normal((BH, Lk, D)) + 3.0, jnp.float32)
    v = jnp.asarray(rng.standard_normal((BH, Lk, D)), jnp.float32)
    ref = jnp.einsum("bqk,bkd->bqd",
                     jax.nn.softmax(jnp.einsum("bqd,bkd->bqk", q, k) * D ** -0.5, -1),
                     v)
    got = sage_attention(q, k, v, block_q=64, block_k=64, interpret=True)
    err = np.abs(np.asarray(got) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).mean()
    assert err.mean() / scale < 2e-2, err.mean() / scale
    assert err.max() < 0.25, err.max()


def test_window_attention_fused_matches_einsum_interpret():
    """The small-window kernel (incl. token padding 49->56 and window-batch
    padding) matches plain attention."""
    from yolo_sod_tpu.ops.pallas_window_attn import window_attention_fused

    rng = np.random.default_rng(11)
    BW, L, D = 300, 49, 16          # non-multiple of block_b, sublane-padded L
    q = jnp.asarray(rng.standard_normal((BW, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((BW, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((BW, L, D)), jnp.float32)
    ref = jnp.einsum("bqk,bkd->bqd",
                     jax.nn.softmax(jnp.einsum("bqd,bkd->bqk", q, k) * D ** -0.5, -1),
                     v)
    got = window_attention_fused(q, k, v, block_b=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_window_mhsa_packed_fwd_bwd_interpret():
    """Lane-packed multi-head window kernel: forward AND custom-VJP gradients
    must match the reference einsum attention (interpret mode on CPU)."""
    import jax
    import jax.numpy as jnp

    from yolo_sod_tpu.ops.pallas_window_attn import window_mhsa_packed

    rng = np.random.default_rng(5)
    BW, L, C, H = 96, 49, 64, 2
    q = jnp.asarray(rng.standard_normal((BW, L, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((BW, L, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((BW, L, C)), jnp.float32)

    def ref(q, k, v):
        hd = C // H
        def split(t):
            return t.reshape(BW, L, H, hd).transpose(0, 2, 1, 3)
        qh, kh, vh = split(q), split(k), split(v)
        s = jnp.einsum("bhnd,bhmd->bhnm", qh, kh) * (hd ** -0.5)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", p, vh)
        return o.transpose(0, 2, 1, 3).reshape(BW, L, C)

    got = window_mhsa_packed(q, k, v, H, 32, True)
    want = ref(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # Gradients through the custom VJP vs AD of the reference.
    co = jnp.asarray(rng.standard_normal((BW, L, C)), jnp.float32)
    g_got = jax.grad(lambda a, b, c:
                     (window_mhsa_packed(a, b, c, H, 32, True) * co).sum(),
                     argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda a, b, c: (ref(a, b, c) * co).sum(),
                     argnums=(0, 1, 2))(q, k, v)
    for gg, gr, name in zip(g_got, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"d{name}")


def test_exact_topk_lastdim_matches_lax():
    """Two-stage top-k is exact, incl. tie-breaking (stable lowest-index),
    ragged chunk padding, and the small-input passthrough."""
    from yolo_sod_tpu.ops.numerics import exact_topk_lastdim

    rng = np.random.default_rng(3)
    for shape, k, chunk in (((4, 7, 1000), 10, 256), ((2, 513), 10, 128),
                            ((3, 100), 5, 256), ((2, 300), 7, 64)):
        x = rng.standard_normal(shape).astype(np.float32)
        # Inject ties (zeros), the TAL zero-align regime.
        x[x < 0.5] = 0.0
        xv = jnp.asarray(x)
        v_ref, i_ref = jax.lax.top_k(xv, k)
        v, i = exact_topk_lastdim(xv, k, chunk=chunk)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_topk_mask_lastdim_matches_lax():
    """The selection MASK of lax.top_k — heavy ties (the TAL zero-align
    regime), duplicates straddling the k-th value, ragged padding, and the
    small-input passthrough."""
    import jax
    import jax.numpy as jnp

    from yolo_sod_tpu.ops.numerics import topk_mask_lastdim

    rng = np.random.default_rng(7)
    for shape, k, chunk in (((4, 7, 1000), 10, 256), ((2, 513), 10, 128),
                            ((3, 100), 5, 256), ((2, 34000), 10, 256)):
        x = rng.standard_normal(shape).astype(np.float32)
        x[x < 0.5] = 0.0                       # many exact zero ties
        x[..., ::17] = 0.25                    # duplicate band at the margin
        xv = jnp.asarray(x)
        _, i_ref = jax.lax.top_k(xv, k)
        ref = np.zeros(shape, bool).reshape(-1, shape[-1])
        for r, row in enumerate(np.asarray(i_ref).reshape(-1, k)):
            ref[r, row] = True
        got = np.asarray(topk_mask_lastdim(xv, k, chunk=chunk))
        np.testing.assert_array_equal(got.reshape(-1, shape[-1]), ref)
        assert got.sum(-1).max() <= k


def test_sage_attention_env_gate(monkeypatch):
    from yolo_sod_tpu.ops.pallas_attention_int8 import sage_enabled

    monkeypatch.delenv("YOLO_SOD_SAGE", raising=False)
    assert not sage_enabled()
    monkeypatch.setenv("YOLO_SOD_SAGE", "1")
    assert sage_enabled()


def test_pallas_scan_analytic_bwd_matches_ad():
    """Analytic Pallas backward (interpret) == AD of the associative scan."""
    from yolo_sod_tpu.nn.modules.ssm import selective_scan
    from yolo_sod_tpu.ops.pallas_scan import (selective_scan_pallas_bwd,
                                              selective_scan_pallas_fwd)

    rng = np.random.default_rng(7)
    b, L, d, n = 2, 37, 8, 4    # non-multiple of chunk exercises padding
    u = jnp.asarray(rng.standard_normal((b, L, d)), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.01, 0.3, (b, L, d)), jnp.float32)
    A = -jnp.asarray(rng.uniform(0.5, 2.0, (d, n)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((b, L, n)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((b, L, n)), jnp.float32)
    D = jnp.asarray(rng.standard_normal(d), jnp.float32)
    gy = jnp.asarray(rng.standard_normal((b, L, d)), jnp.float32)

    y, h = selective_scan_pallas_fwd(u, dt, A, B, C, D, chunk=16, interpret=True)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(selective_scan(u, dt, A, B, C, D)),
                               rtol=1e-4, atol=1e-4)
    grads = selective_scan_pallas_bwd(u, dt, A, B, C, D, h, gy, chunk=16,
                                      interpret=True)
    ref = jax.grad(lambda *a: (selective_scan(*a) * gy).sum(),
                   argnums=tuple(range(6)))(u, dt, A, B, C, D)
    for g, r in zip(grads, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)
