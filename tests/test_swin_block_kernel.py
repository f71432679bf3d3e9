"""Parity of the fused Swin window-block Pallas kernel.

The kernel (ops/pallas_swin_block.py) must match the plain-JAX module path
bit-for-bit in structure: same LN epsilon, same tanh-gelu, same packed-qkv
head split — in forward AND in every gradient (input + all 12 parameter
tensors), since training runs through the custom VJP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_sod_tpu.ops.pallas_swin_block import (swin_block_spatial,
                                                swin_window_block,
                                                swin_window_block_ref)

BW, L, C, HEADS, HID = 12, 49, 64, 4, 128


def _params(key, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    p = dict(
        g1=jnp.ones((C,), dtype), be1=jnp.zeros((C,), dtype),
        wqkv=jax.random.normal(ks[0], (C, 3 * C), dtype) * 0.1,
        bqkv=jax.random.normal(ks[1], (3 * C,), dtype) * 0.05,
        wo=jax.random.normal(ks[2], (C, C), dtype) * 0.1,
        bo=jax.random.normal(ks[3], (C,), dtype) * 0.05,
        g2=1.0 + 0.1 * jax.random.normal(ks[4], (C,), dtype),
        be2=0.05 * jax.random.normal(ks[5], (C,), dtype),
        w1m=jax.random.normal(ks[6], (C, HID), dtype) * 0.1,
        b1m=jnp.zeros((HID,), dtype),
        w2m=jax.random.normal(ks[7], (HID, C), dtype) * 0.1,
        b2m=jnp.zeros((C,), dtype),
    )
    return p


ORDER = ("g1", "be1", "wqkv", "bqkv", "wo", "bo", "g2", "be2",
         "w1m", "b1m", "w2m", "b2m")


def _run_kernel(w, p, block_b=None):
    return swin_window_block(w, *[p[k] for k in ORDER], HEADS, block_b, True)


def _run_ref(w, p):
    return swin_window_block_ref(w, *[p[k] for k in ORDER], HEADS)


def test_forward_matches_reference():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(jax.random.PRNGKey(1), (BW, L, C), jnp.float32)
    p = _params(key)
    got = _run_kernel(w, p)
    want = _run_ref(w, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_block_padding():
    """BW not a multiple of the block size exercises the zero-window pad."""
    key = jax.random.PRNGKey(2)
    w = jax.random.normal(jax.random.PRNGKey(3), (BW, L, C), jnp.float32)
    p = _params(key)
    got = _run_kernel(w, p, block_b=8)     # 12 windows -> pad 4
    want = _run_ref(w, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    assert not np.isnan(np.asarray(got)).any()


def test_all_gradients_match_reference():
    key = jax.random.PRNGKey(4)
    w = jax.random.normal(jax.random.PRNGKey(5), (BW, L, C), jnp.float32)
    p = _params(key)

    def loss_k(w, p):
        y = _run_kernel(w, p, block_b=8)
        return jnp.sum(jnp.sin(y))         # non-trivial upstream cotangent

    def loss_r(w, p):
        return jnp.sum(jnp.sin(_run_ref(w, p)))

    gk_w, gk_p = jax.grad(loss_k, argnums=(0, 1))(w, p)
    gr_w, gr_p = jax.grad(loss_r, argnums=(0, 1))(w, p)
    np.testing.assert_allclose(np.asarray(gk_w), np.asarray(gr_w),
                               rtol=1e-4, atol=1e-4)
    for k in ORDER:
        np.testing.assert_allclose(
            np.asarray(gk_p[k]), np.asarray(gr_p[k]), rtol=1e-4, atol=1e-4,
            err_msg=f"param grad mismatch: {k}")


def test_bf16_inputs():
    key = jax.random.PRNGKey(6)
    w = jax.random.normal(jax.random.PRNGKey(7), (BW, L, C),
                          jnp.float32).astype(jnp.bfloat16)
    p = _params(key, jnp.bfloat16)
    got = _run_kernel(w, p)
    want = _run_ref(w, p)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_module_paths_share_params_and_match():
    """WindowAttention fused vs plain paths: identical param trees, matching
    outputs and input gradients with the SAME params."""
    from yolo_sod_tpu.nn.modules.attention import WindowAttention

    x = jax.random.normal(jax.random.PRNGKey(8), (2, 13, 13, C), jnp.float32)
    plain = WindowAttention(C, HEADS, 7, fused=False)
    fused = WindowAttention(C, HEADS, 7, fused=True)
    vars_p = plain.init(jax.random.PRNGKey(9), x)
    vars_f = fused.init(jax.random.PRNGKey(9), x)
    tp = jax.tree_util.tree_structure(vars_p)
    tf = jax.tree_util.tree_structure(vars_f)
    assert tp == tf, f"param trees differ:\n{tp}\nvs\n{tf}"
    def _by_path(tree):
        return sorted(((str(path), leaf) for path, leaf in
                       jax.tree_util.tree_leaves_with_path(tree)))

    for (kp, sp), (kf, sf) in zip(_by_path(vars_p), _by_path(vars_f)):
        assert sp.shape == sf.shape, f"{kp}: {sp.shape} vs {sf.shape}"

    y_p = plain.apply(vars_p, x)
    y_f = fused.apply(vars_p, x)          # plain-init params through fused
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_p),
                               rtol=2e-4, atol=2e-4)

    g_p = jax.grad(lambda v: jnp.sum(jnp.sin(plain.apply(v, x))))(vars_p)
    g_f = jax.grad(lambda v: jnp.sum(jnp.sin(fused.apply(v, x))))(vars_p)
    for (kp, lp), (kf, lf) in zip(_by_path(g_p), _by_path(g_f)):
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lp),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f"grad mismatch at {kp}")


def _ref_spatial(x, p, heads, win=7):
    """Oracle: XLA partition -> reference block -> reverse (the exact
    composition the spatial kernel replaces)."""
    from yolo_sod_tpu.nn.modules.attention import (window_partition,
                                                   window_reverse)
    wins, padded, wsz = window_partition(x, win)
    y = swin_window_block_ref(wins, *[p[k] for k in ORDER], heads)
    return window_reverse(y, padded, wsz, (x.shape[1], x.shape[2]))


@pytest.mark.parametrize("hw", [(14, 14), (13, 13), (16, 9)])
def test_spatial_forward_matches_partitioned(hw):
    """The spatial kernel ≡ partition->block->reverse, including the
    zero-pad-tokens-as-keys semantics of non-multiple H/W (boundary
    windows masked in-kernel)."""
    H, W = hw
    x = jax.random.normal(jax.random.PRNGKey(12), (2, H, W, C), jnp.float32)
    p = _params(jax.random.PRNGKey(13))
    got = swin_block_spatial(x, *[p[k] for k in ORDER], HEADS, 7, None, True)
    want = _ref_spatial(x, p, HEADS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("gw", [None, 1])
def test_spatial_gradients_match_partitioned(gw):
    """Input + all 12 parameter gradients through the spatial custom VJP,
    on a non-multiple map so masked boundary windows are in the grad path.
    gw=1 exercises the window-chunked backward (multiple col blocks)."""
    H, W = 13, 13
    x = jax.random.normal(jax.random.PRNGKey(14), (2, H, W, C), jnp.float32)
    p = _params(jax.random.PRNGKey(15))

    def loss_k(x, p):
        y = swin_block_spatial(x, *[p[k] for k in ORDER], HEADS, 7, gw, True)
        return jnp.sum(jnp.sin(y))

    def loss_r(x, p):
        return jnp.sum(jnp.sin(_ref_spatial(x, p, HEADS)))

    gk_x, gk_p = jax.grad(loss_k, argnums=(0, 1))(x, p)
    gr_x, gr_p = jax.grad(loss_r, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gk_x), np.asarray(gr_x),
                               rtol=1e-4, atol=1e-4)
    for k in ORDER:
        np.testing.assert_allclose(
            np.asarray(gk_p[k]), np.asarray(gr_p[k]), rtol=1e-4, atol=1e-4,
            err_msg=f"param grad mismatch: {k}")


@pytest.mark.parametrize("heads", [1, 2, 8])
def test_head_counts(heads):
    key = jax.random.PRNGKey(10)
    w = jax.random.normal(jax.random.PRNGKey(11), (8, L, C), jnp.float32)
    p = _params(key)
    got = swin_window_block(w, *[p[k] for k in ORDER], heads, 8, True)
    want = swin_window_block_ref(w, *[p[k] for k in ORDER], heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bf16_gradients_close_to_f32_reference():
    """The backward kernel runs its weight-grad matmuls at bf16 MXU rate when
    inputs are bf16 (ops/pallas_swin_block.py); pin the bf16 gradient path
    against the f32 reference gradients with a bf16-grade tolerance
    (ADVICE r3: the bf16 grad path was untested)."""
    key = jax.random.PRNGKey(10)
    w32 = jax.random.normal(jax.random.PRNGKey(11), (BW, L, C), jnp.float32)
    p32 = _params(key)
    w16 = w32.astype(jnp.bfloat16)
    p16 = {k: v.astype(jnp.bfloat16) for k, v in p32.items()}

    def loss_k16(w, p):
        return jnp.sum(jnp.sin(_run_kernel(w, p, block_b=8).astype(jnp.float32)))

    def loss_r32(w, p):
        return jnp.sum(jnp.sin(_run_ref(w, p)))

    gk_w, gk_p = jax.grad(loss_k16, argnums=(0, 1))(w16, p16)
    gr_w, gr_p = jax.grad(loss_r32, argnums=(0, 1))(w32, p32)
    assert gk_w.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(gk_w, np.float32),
                               np.asarray(gr_w), rtol=0.1, atol=0.15)
    for k in ORDER:
        g, r = np.asarray(gk_p[k], np.float32), np.asarray(gr_p[k])
        scale = max(float(np.abs(r).max()), 1.0)
        np.testing.assert_allclose(g / scale, r / scale, rtol=0.1, atol=0.05,
                                   err_msg=f"bf16 param grad mismatch: {k}")
