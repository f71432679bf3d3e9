"""MAFN heterogeneous attention blocks (NHWC, flax.linen).

TPU-native re-expression of the reference SOD attention zoo:
- SE / SE_Block           (reference smallobj_modules.py:57-92, alias :263)
- MixedAttention          (reference smallobj_modules.py:95-112)
- CBAM_Block              (reference cbam_block.py:8-55)
- CA_Block                (reference ca_block.py:16-58)
- A2_Attn                 (reference a2_attn.py:9-69)
- SwinBlock/WindowAttention (reference blocks_transformer.py:81-171)
- OmniKernelFusion        (reference smallobj_modules.py:126-187)
- HyperACEBlock           (reference smallobj_modules.py:190-215)
- GLUBlock / MambaBlock   (reference blocks_mamba.py:84-236)

Design notes: everything is static-shape and trace-time composed so XLA fuses
the gate chains into the surrounding convs; window partitioning is pure
reshape/transpose (free at the XLA layout level); the reference's lazy-built /
capability-probe machinery disappears — shapes are known at init.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_sod_tpu.nn.modules.conv import BN_EPS, BN_MOMENTUM, ConvBNAct


class SE(nn.Module):
    """SE channel attention: GAP → 1x1 → ReLU → 1x1 → sigmoid gate.

    Note the reference's YAML rows pass the *channel count* into the
    ``reduction`` slot (SE_Block [64] → SE(reduction=64)); hidden width is
    max(c // reduction, 4). We reproduce that exact behavior.
    """

    reduction: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        hidden = max(c // self.reduction, 4)
        # GAP at x's dtype: jnp.mean(x.astype(f32)) — and even
        # sum(dtype=f32) — materializes a full-resolution f32 copy of the
        # stem activation (209 MB at 320^2; the convert does NOT fuse into
        # the reduce on TPU — measured, /tmp A/B 0.045 vs 0.025 ms). XLA's
        # bf16 reduce accumulates wide internally, and the SE gate is
        # sigmoid-bounded, so low-precision stats are safe here.
        m = jnp.mean(x, axis=(1, 2), keepdims=True)
        a = nn.Conv(hidden, (1, 1), use_bias=True, name="fc1")(m)
        a = jax.nn.relu(a)
        a = nn.Conv(c, (1, 1), use_bias=True, name="fc2")(a)
        a = jax.nn.sigmoid(a).astype(x.dtype)
        return x * a


SE_Block = SE


class MixedAttention(nn.Module):
    """Channel gate + 7x7 spatial gate (CBAM-like). Reference smallobj_modules.py:95."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = max(self.channels // self.reduction, 4)
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        w = nn.Conv(hidden, (1, 1), name="ca_conv1")(g)
        w = nn.Conv(self.channels, (1, 1), name="ca_conv2")(jax.nn.relu(w))
        x = x * jax.nn.sigmoid(w)
        avg_map = jnp.mean(x, axis=-1, keepdims=True)
        max_map = jnp.max(x, axis=-1, keepdims=True)
        s = nn.Conv(1, (7, 7), padding=3, name="sa_conv")(
            jnp.concatenate([avg_map, max_map], axis=-1)
        )
        return x * jax.nn.sigmoid(s)


class CBAM_Block(nn.Module):
    """Canonical CBAM: shared-MLP channel attention (avg+max) then 7x7 spatial.

    Reference cbam_block.py:39-55. The YAML's second arg lands in c2 and is
    ignored (reduction stays 16) — reproduced faithfully.
    """

    c1: int
    c2: Any = None
    reduction: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c1
        hid = c // self.reduction
        fc1 = nn.Conv(hid, (1, 1), use_bias=False, name="fc1")
        fc2 = nn.Conv(c, (1, 1), use_bias=False, name="fc2")
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        ca = jax.nn.sigmoid(fc2(jax.nn.relu(fc1(avg))) + fc2(jax.nn.relu(fc1(mx))))
        x = ca * x
        avg_map = jnp.mean(x, axis=-1, keepdims=True)
        max_map = jnp.max(x, axis=-1, keepdims=True)
        sa = nn.Conv(1, (7, 7), padding=3, use_bias=False, name="spatial")(
            jnp.concatenate([avg_map, max_map], axis=-1)
        )
        return jax.nn.sigmoid(sa) * x


class CA_Block(nn.Module):
    """Coordinate attention: pooled-H and pooled-W paths through a shared bottleneck.

    Reference ca_block.py:16-58 (reduction effectively stays 32 — the YAML arg
    lands in the unused c2 slot).
    """

    c1: int
    c2: Any = None
    reduction: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        mip = max(8, self.c1 // self.reduction)
        x_h = jnp.mean(x, axis=2, keepdims=True)          # (B, H, 1, C)
        x_w = jnp.mean(x, axis=1, keepdims=True)          # (B, 1, W, C)
        x_w = x_w.transpose(0, 2, 1, 3)                   # (B, W, 1, C)
        y = jnp.concatenate([x_h, x_w], axis=1)           # (B, H+W, 1, C)
        y = nn.Conv(mip, (1, 1), name="conv1")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn1")(y)
        y = jax.nn.relu6(y + 3.0) / 6.0                   # h_sigmoid
        y_h, y_w = y[:, :h], y[:, h:]
        y_w = y_w.transpose(0, 2, 1, 3)                   # (B, 1, W, mip)
        a_h = jax.nn.sigmoid(nn.Conv(self.c1, (1, 1), name="conv_h")(y_h))
        a_w = jax.nn.sigmoid(nn.Conv(self.c1, (1, 1), name="conv_w")(y_w))
        return x * a_w * a_h


class MHSA(nn.Module):
    """Multi-head self-attention over (B, L, C) tokens, param-compatible with
    torch nn.MultiheadAttention (packed qkv in-proj + out-proj)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        B, L, C = x.shape
        hd = C // self.num_heads
        qkv = nn.Dense(3 * C, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # Window regime (thousands of tiny sequences, e.g. the P2 Swin site:
        # 8464 windows x 49 tokens): the lane-packed Pallas kernel keeps the
        # (H, L, L) score block in VMEM in BOTH directions (custom VJP) and
        # reads/writes only head-packed (B, L, C) tiles. See
        # ops/pallas_window_attn.py for why heads stay packed in lanes.
        from yolo_sod_tpu.ops.pallas_attention import _tpu_backend
        from yolo_sod_tpu.ops.pallas_window_attn import window_mhsa_packed
        if (_tpu_backend() and B >= 256 and L <= 64 and C <= 256
                and C % self.num_heads == 0):
            o = window_mhsa_packed(q, k, v, self.num_heads)
            return nn.Dense(C, name="out_proj")(o)

        def heads(t):
            return t.reshape(B, L, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        # The (bh, L, L) score matrices dominate HBM traffic at P2 scale
        # (8464 windows x 49^2 — measured 162 MB/tensor in f32,
        # tools/hlo_bytes.py), so they stay at x's dtype with a
        # max-subtracted softmax (f32 denominator). Measured on-chip: this
        # fused-einsum form beats the dedicated window kernel
        # (ops/pallas_window_attn.py), whose head_dim=16 lane padding
        # inflates q/k/v/o HBM tensors 8x — see PERF.md.
        from yolo_sod_tpu.ops.numerics import stable_softmax_lowp
        # f32 MXU accumulation with an immediate cast to x's dtype; the
        # rest of the softmax chain stays low-precision. (A/B'd on-chip:
        # asking the einsum for bf16 output directly regressed the forward
        # 24.35 -> 25.19 ms/batch — XLA's batched-matmul lowering prefers
        # the f32-accum + separate cast form.)
        logits = (jnp.einsum("bhnd,bhmd->bhnm", q, k,
                             preferred_element_type=jnp.float32)
                  * (hd ** -0.5)).astype(x.dtype)
        attn = stable_softmax_lowp(logits)
        o = jnp.einsum("bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32)
        o = o.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, L, C)
        return nn.Dense(C, name="out_proj")(o)


class A2_Attn(nn.Module):
    """Area attention: pool H into num_areas strips, MHA over (areas*W) tokens,
    bilinear-upsample back, residual. Reference a2_attn.py:9-69."""

    c1: int
    c2: Any = None
    num_areas: int = 4
    num_heads: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        c2 = self.c2 or self.c1
        xp = ConvBNAct(self.c1, self.c1, 1, name="proj")(x, train)

        # Adaptive average pool H → num_areas (torch adaptive bins: start
        # floor(i*H/o), end ceil((i+1)*H/o)) expressed as a static pooling
        # matrix so it lowers to one matmul.
        import numpy as np
        o = self.num_areas
        P = np.zeros((o, h), dtype=np.float32)
        for i in range(o):
            s, e = (i * h) // o, -(-((i + 1) * h) // o)
            P[i, s:e] = 1.0 / (e - s)
        P = jnp.asarray(P, dtype=xp.dtype)
        pooled = jnp.einsum("ah,bhwc->bawc", P, xp)       # (B, areas, W, C)

        seq = pooled.reshape(b, o * w, c)
        seq_norm = nn.LayerNorm(name="layer_norm")(seq)
        attn_out = MHSA(c, self.num_heads, name="attention")(seq_norm)
        attn_out = attn_out.reshape(b, o, w, c)
        up = jax.image.resize(attn_out, (b, h, w, c), method="linear")
        out = ConvBNAct(self.c1, c2, 1, name="out_proj")(up, train)
        if out.shape[-1] == x.shape[-1]:
            out = out + x
        return out


def window_partition(x, window: int):
    """(B, H, W, C) → (B*nW, win_h*win_w, C) with zero-pad to window multiples.

    Reference blocks_transformer.py:8-47; static shapes make this pure
    reshape/transpose for XLA.
    """
    B, H, W, C = x.shape
    if H <= window and W <= window:
        return x.reshape(B, H * W, C), (H, W), (H, W)
    wh, ww = min(window, H), min(window, W)
    pad_h = (wh - H % wh) % wh
    pad_w = (ww - W % ww) % ww
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // wh, wh, Wp // ww, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wh * ww, C)
    return x, (Hp, Wp), (wh, ww)


def window_reverse(windows, padded_size, win_size, orig_size):
    """Inverse of window_partition, cropping padding back off."""
    Hp, Wp = padded_size
    wh, ww = win_size
    H, W = orig_size
    if H <= wh and W <= ww and Hp == H and Wp == W:
        B = windows.shape[0]
        return windows.reshape(B, H, W, -1)
    nH, nW = Hp // wh, Wp // ww
    B = windows.shape[0] // (nH * nW)
    x = windows.reshape(B, nH, nW, wh, ww, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class _DenseParams(nn.Module):
    """Parameter container with nn.Dense's exact tree ({kernel, bias}) and
    initializers, so the fused Pallas path and the plain module path share
    identical checkpoints / torch-converter mappings."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _LayerNormParams(nn.Module):
    """Parameter container matching nn.LayerNorm's tree ({scale, bias})."""

    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class _MHSAParams(nn.Module):
    """torch-MultiheadAttention-shaped params (packed in_proj + out_proj),
    tree-identical to the MHSA module's Dense submodules."""

    dim: int

    @nn.compact
    def __call__(self):
        wqkv, bqkv = _DenseParams(self.dim, 3 * self.dim, name="in_proj")()
        wo, bo = _DenseParams(self.dim, self.dim, name="out_proj")()
        return wqkv, bqkv, wo, bo


class WindowAttention(nn.Module):
    """Non-shifted windowed MSA: LN→MHA→residual, LN→MLP→residual per window.

    Reference blocks_transformer.py:81-131. On TPU in the many-tiny-windows
    regime the ENTIRE block runs as one fused Pallas kernel
    (ops/pallas_swin_block.py) — the qkv tensor, score matrices, MLP hidden
    and every LN intermediate stay in VMEM; HBM sees one (BW, L, C) read and
    one write (fwd), plus the custom-VJP equivalents in the backward.
    `fused=True/False` overrides the dispatch (tests force fused+interpret
    on CPU); both paths create identical parameter trees.
    """

    dim: int
    num_heads: int = 4
    window_size: int = 7
    mlp_ratio: float = 2.0
    fused: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        win = self.window_size
        nwin = -(-H // win) * (-(-W // win))
        hdim = int(self.dim * self.mlp_ratio)

        from yolo_sod_tpu.ops.pallas_attention import _tpu_backend
        on_tpu = _tpu_backend()
        use_fused = (B * nwin >= 256 and win * win <= 64 and C <= 256
                     and C % self.num_heads == 0 and H > win and W > win
                     and on_tpu
                     if self.fused is None else self.fused)
        import os
        spatial_ok = os.environ.get("YOLO_SOD_SWIN_SPATIAL", "0") == "1"
        if use_fused and spatial_ok and H > win and W > win:
            # Spatial fused kernel: partition/reverse live in VMEM too — the
            # raw NHWC map is the only HBM tensor (ops/pallas_swin_block.py).
            # OPT-IN, measured slower at the flagship shapes (PERF.md
            # round-3 negative result: saves 1.4 GB/batch of partition
            # copies but the in-kernel strip<->window relayout costs more
            # VPU time than the copies did — fwd 21.5 -> 24.9 ms/batch).
            from yolo_sod_tpu.ops.pallas_swin_block import swin_block_spatial
            g1, be1 = _LayerNormParams(C, name="norm1")()
            wqkv, bqkv, wo, bo = _MHSAParams(C, name="attn")()
            g2, be2 = _LayerNormParams(C, name="norm2")()
            w1m, b1m = _DenseParams(C, hdim, name="mlp_0")()
            w2m, b2m = _DenseParams(hdim, C, name="mlp_1")()
            return swin_block_spatial(
                x, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1m, b1m,
                w2m, b2m, self.num_heads, win, None, not on_tpu)
        windows, padded, wsz = window_partition(x, win)
        if use_fused:
            from yolo_sod_tpu.ops.pallas_swin_block import swin_window_block
            g1, be1 = _LayerNormParams(C, name="norm1")()
            wqkv, bqkv, wo, bo = _MHSAParams(C, name="attn")()
            g2, be2 = _LayerNormParams(C, name="norm2")()
            w1m, b1m = _DenseParams(C, hdim, name="mlp_0")()
            w2m, b2m = _DenseParams(hdim, C, name="mlp_1")()
            windows = swin_window_block(
                windows, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1m, b1m,
                w2m, b2m, self.num_heads, None, not on_tpu)
        else:
            normed = nn.LayerNorm(name="norm1")(windows)
            attn = MHSA(self.dim, self.num_heads, name="attn")(normed)
            windows = windows + attn
            y = nn.LayerNorm(name="norm2")(windows)
            y = nn.Dense(hdim, name="mlp_0")(y)
            y = jax.nn.gelu(y)
            y = nn.Dense(self.dim, name="mlp_1")(y)
            windows = windows + y
        return window_reverse(windows, padded, wsz, (H, W))


class SwinBlock(nn.Module):
    """DWconv → window attention → PWconv+BN+SiLU, residual.

    Reference blocks_transformer.py:133-171. YAML args (c, num_heads, window).
    """

    c: int
    num_heads: int = 4
    window_size: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.c, (3, 3), padding=1, feature_group_count=self.c,
                    use_bias=False, name="dw")(x)
        y = WindowAttention(self.c, self.num_heads, self.window_size,
                            name="window_attn")(y, train)
        y = nn.Conv(self.c, (1, 1), use_bias=False, name="pw")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn")(y)
        y = jax.nn.silu(y)
        return x + y


class OmniKernelFusion(nn.Module):
    """3-branch fusion: global(GAP+1x1 broadcast) + 5x5 DW + 3x3 DW, 3x3 out conv.

    Reference smallobj_modules.py:126-187 (the CUDA-only SageAttention branch
    is off by default in the reference and omitted here).
    """

    in_ch: int
    out_ch: int
    attn_heads: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.out_ch, (1, 1), name="gp_conv")(g)
        g = jnp.broadcast_to(g, (x.shape[0], x.shape[1], x.shape[2], self.out_ch))
        l5 = nn.Conv(self.in_ch, (5, 5), padding=2, feature_group_count=self.in_ch,
                     name="dw5")(x)
        l5 = nn.Conv(self.out_ch, (1, 1), name="pw5")(jax.nn.relu(l5))
        l3 = nn.Conv(self.in_ch, (3, 3), padding=1, feature_group_count=self.in_ch,
                     name="dw3")(x)
        l3 = nn.Conv(self.out_ch, (1, 1), name="pw3")(jax.nn.relu(l3))
        y = g + l5 + l3
        return jax.nn.relu(nn.Conv(self.out_ch, (3, 3), padding=1, name="out_conv")(y))


class HyperACEBlock(nn.Module):
    """High/low-level 2-input fusion: project both, concat 'hyper-edge' 1x1, 3x3 fuse.

    Reference smallobj_modules.py:190-215. Takes [x_high, x_low].
    """

    ch_high: int
    ch_low: int
    ch_out: int

    @nn.compact
    def __call__(self, xs, train: bool = False):
        x_high, x_low = xs
        if x_high.shape[1:3] != x_low.shape[1:3]:
            b, h, w, c = x_low.shape
            x_high = jax.image.resize(
                x_high, (x_high.shape[0], h, w, x_high.shape[-1]), method="nearest"
            )
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=BN_MOMENTUM, epsilon=BN_EPS, name=name)
        hgt = jax.nn.relu(bn("bn_h")(nn.Conv(self.ch_out, (1, 1), use_bias=False, name="ph")(x_high)))
        low = jax.nn.relu(bn("bn_l")(nn.Conv(self.ch_out, (1, 1), use_bias=False, name="pl")(x_low)))
        z = jnp.concatenate([hgt, low], axis=-1)
        z = jax.nn.relu(nn.Conv(self.ch_out, (1, 1), use_bias=False, name="hyper")(z))
        z = nn.Conv(self.ch_out, (3, 3), padding=1, use_bias=False, name="fuse")(z)
        return jax.nn.relu(bn("bn_f")(z))


class GLUBlock(nn.Module):
    """Gated conv fallback for MambaBlock: two parallel 3x3 convs, sigmoid gate.

    Reference blocks_mamba.py:84-103.
    """

    c: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = nn.Conv(self.c, (3, 3), padding=1, name="a")(x)
        b = nn.Conv(self.c, (3, 3), padding=1, name="b")(x)
        return a * jax.nn.sigmoid(b)
