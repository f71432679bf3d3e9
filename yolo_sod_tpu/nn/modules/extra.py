"""MambaFusion / MGDFIS module family + auxiliary heads + stable variants.

TPU-native re-expression (NHWC, flax.linen) of the reference fork's remaining
custom modules:
- VimBlock, CA_FPN_Block, CompactInvertedBlock, SimAM, FusionLockTSS,
  GlobalDetail, DynamicPixelAttn, MFBlock   (nn/modules/block.py:1475-1817)
- DecoupledHeadLite                          (nn/modules/smallobj_modules.py:233-259)
- DecoupledHead, SRAHead, MFDecHead          (nn/modules/head.py:628-833)
- PositionalEncoding2D, DETRAuxHead          (nn/modules/heads_detr_aux.py:9-163)
- LayerNorm2d, HyperACEBlockStable, BiFormerLiteBlock
                                             (nn/modules/smallobj_modules_stable.py:85-289)

Shape-dynamic torch machinery (VimBlock's lazily-built adaptive conv for
channel mismatches, block.py:1527-1537) disappears: channel counts are static
at graph-compile time here, so mismatches are build errors, not runtime
patches.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_sod_tpu.nn.modules.conv import ChannelNorm, ConvBNAct, DWConv, ScaleAdd


class SimAM(nn.Module):
    """Parameter-free spatial attention: x * ((x-μ)²/(4σ²+ε) + 0.5)."""

    eps: float = 1e-4

    @nn.compact
    def __call__(self, x, train: bool = False):
        mu = x.mean(axis=(1, 2), keepdims=True)
        var = ((x - mu) ** 2).mean(axis=(1, 2), keepdims=True)
        attn = (x - mu) ** 2 / (4 * var + self.eps) + 0.5
        return x * attn


class VimBlock(nn.Module):
    """Large-kernel conv approximation of an SSM + SE gate (block.py:1475-1552)."""

    c1: int
    c2: int = 0
    kernel_size: int = 11

    @nn.compact
    def __call__(self, x, train: bool = False):
        c2 = self.c2 or self.c1
        k = self.kernel_size
        y = nn.Conv(self.c1, (k, k), padding=k // 2, use_bias=False, name="dw_conv")(x)
        y = nn.Conv(c2, (1, 1), use_bias=False, name="pw_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn")(y)
        # SE gate
        g = jnp.mean(y, axis=(1, 2), keepdims=True)
        g = nn.Conv(max(c2 // 4, 1), (1, 1), name="se_fc1")(g)
        g = nn.Conv(c2, (1, 1), name="se_fc2")(jax.nn.silu(g))
        y = y * jax.nn.sigmoid(g)
        if self.c1 == c2:
            y = y + x
        return jax.nn.silu(y)


class CA_FPN_Block(nn.Module):
    """Context-aware FPN fusion of [high, low] features (block.py:1555-1618)."""

    in_low: int
    in_high: int
    out: int

    @nn.compact
    def __call__(self, xs, train: bool = False):
        high, low = xs
        if high.shape[1:3] != low.shape[1:3]:
            high = jax.image.resize(high, (high.shape[0], *low.shape[1:3], high.shape[-1]),
                                    method="nearest")
        x = jnp.concatenate([high, low], axis=-1)
        c = x.shape[-1]
        s = nn.Conv(c, (5, 5), padding=2, feature_group_count=c, use_bias=False,
                    name="spatial_att")(x)
        x = x * jax.nn.sigmoid(s)
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(c // 4, (1, 1), name="ca_fc1")(g)
        g = nn.Conv(c, (1, 1), name="ca_fc2")(jax.nn.silu(g))
        x = x * jax.nn.sigmoid(g)
        x = nn.Conv(self.out, (1, 1), use_bias=False, name="conv_out")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn_out")(x)
        return jax.nn.silu(x)


class CompactInvertedBlock(nn.Module):
    """MobileNet-style inverted residual (block.py:1621-1665)."""

    c1: int
    c2: int
    expansion: float = 2.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = int(self.c1 * self.expansion)
        y = ConvBNAct(self.c1, mid, 1, name="expand")(x, train)
        y = ConvBNAct(mid, mid, 3, g=mid, name="depthwise")(y, train)
        y = nn.Conv(self.c2, (1, 1), use_bias=False, name="linear_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, name="linear_bn")(y)
        if self.c1 == self.c2:
            y = y + x
        return jax.nn.silu(y)


class FusionLockTSS(nn.Module):
    """Texture/structure lock: 1-head self-attention, tanh-gated multiply
    (block.py:1691-1715)."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        from yolo_sod_tpu.ops.pallas_attention import fused_mhsa

        B, H, W, C = x.shape
        seq = x.reshape(B, H * W, C)
        # Single-head full-map attention; long maps route through the Pallas
        # flash kernel.
        qkv = nn.Dense(3 * C, name="attn_qkv")(seq)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = fused_mhsa(q, k, v)
        attn = nn.Dense(C, name="attn_out")(attn)
        return jnp.tanh(attn.reshape(B, H, W, C)) * x


class GlobalDetail(nn.Module):
    """Depthwise 3x3 + SE-style channel gate (block.py:1718-1740)."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        y = nn.Conv(c, (3, 3), padding=1, feature_group_count=c, name="conv")(x)
        g = jnp.mean(y, axis=(1, 2), keepdims=True)
        g = nn.Conv(c // 4, (1, 1), name="ca_fc1")(g)
        g = nn.Conv(c, (1, 1), name="ca_fc2")(jax.nn.relu(g))
        return y * jax.nn.sigmoid(g)


class DynamicPixelAttn(nn.Module):
    """Per-pixel sigmoid mask gate (block.py:1743-1758)."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        m = nn.Conv(1, (1, 1), name="mask")(x)
        return x * jax.nn.sigmoid(m)


class MFBlock(nn.Module):
    """MambaFusion composite: 1x1 up → DW-Swin-like conv (residual) →
    FusionLockTSS → GlobalDetail → DynamicPixelAttn → 1x1 down →
    SimAM(residual sum) (block.py:1761-1817)."""

    ch_in: int
    ch_hidden: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.ch_hidden
        y = ConvBNAct(self.ch_in, h, 1, name="conv1")(x, train)
        s = nn.Conv(h, (7, 7), padding=3, feature_group_count=h, use_bias=True,
                    name="swin_dw")(y)
        s = nn.BatchNorm(use_running_average=not train, name="swin_bn1")(s)
        s = nn.Conv(h, (1, 1), name="swin_pw")(jax.nn.silu(s))
        s = nn.BatchNorm(use_running_average=not train, name="swin_bn2")(s)
        y = s + y
        y = FusionLockTSS(h, name="fusion_lock")(y, train)
        y = GlobalDetail(h, name="global_detail")(y, train)
        y = DynamicPixelAttn(h, name="dynamic_pixel")(y, train)
        y = ConvBNAct(h, self.ch_in, 1, name="conv2")(y, train)
        return SimAM(name="simam")(x + y, train)


# -- auxiliary / alternative heads -------------------------------------------


class DecoupledHeadLite(nn.Module):
    """DW-conv decoupled head, 5-way outputs (smallobj_modules.py:233-259)."""

    in_ch: int
    mid_ch: int
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = DWConv(self.in_ch, self.mid_ch, name="cls1")(x, train)
        c = DWConv(self.mid_ch, self.mid_ch, name="cls2")(c, train)
        r = DWConv(self.in_ch, self.mid_ch, name="reg1")(x, train)
        r = DWConv(self.mid_ch, self.mid_ch, name="reg2")(r, train)
        cls = nn.Conv(self.num_classes, (1, 1), name="cls_out")(c)
        obj = nn.Conv(1, (1, 1), name="obj_out")(c)
        ctr = nn.Conv(1, (1, 1), name="ctr_out")(c)
        iou = nn.Conv(1, (1, 1), name="iou_out")(c)
        box = nn.Conv(4, (1, 1), name="box_out")(r)
        return cls, obj, ctr, iou, box


class DecoupledHead(nn.Module):
    """Decoupled cls/reg/obj head with DFL expectation (head.py:628-682)."""

    in_channels: int
    num_classes: int
    reg_max: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = ConvBNAct(self.in_channels, self.in_channels, 3, name="cls_conv0")(x, train)
        c = ConvBNAct(self.in_channels, self.in_channels, 3, name="cls_conv1")(c, train)
        r = ConvBNAct(self.in_channels, self.in_channels, 3, name="reg_conv0")(x, train)
        r = ConvBNAct(self.in_channels, self.in_channels, 3, name="reg_conv1")(r, train)
        cls_out = nn.Conv(self.num_classes, (1, 1), name="cls_pred")(c)
        reg = nn.Conv(4 * self.reg_max, (1, 1), name="reg_pred")(r)
        obj_out = nn.Conv(1, (1, 1), name="obj_pred")(r)
        if self.reg_max > 1:
            # DFL expectation over the reg_max softmax bins.
            shape = reg.shape[:-1]
            dist = jax.nn.softmax(reg.reshape(*shape, 4, self.reg_max), axis=-1)
            proj = jnp.arange(self.reg_max, dtype=dist.dtype)
            reg = jnp.einsum("...fr,r->...f", dist, proj)
        return cls_out, reg, obj_out


class SRAHead(nn.Module):
    """Super-resolution auxiliary head: progressive x2 ConvTranspose upsampler
    to an RGB reconstruction in [0,1] (head.py:685-738). Train-time only."""

    in_channels: int
    out_channels: int = 3
    up_factor: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.in_channels
        for i in range(int(math.log2(self.up_factor))):
            nxt = max(c // 2, 16)
            x = ConvBNAct(c, nxt, 3, name=f"conv_{i}")(x, train)
            # k=4/s=2/pad=1 transposed conv == exact 2x upsample (SAME in flax)
            x = nn.ConvTranspose(nxt, (4, 4), strides=(2, 2), padding="SAME",
                                 name=f"up_{i}")(x)
            x = jax.nn.silu(x)
            c = nxt
        x = nn.Conv(self.out_channels, (3, 3), padding=1, name="out")(x)
        return jax.nn.sigmoid(x)


class MFDecHead(nn.Module):
    """SimAM + decoupled cls/reg/obj head with prior-prob cls bias init
    (head.py:741-833)."""

    nc: int = 80
    ch_in: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SimAM(name="simam")(x, train)

        def tower(name):
            def f(t):
                t = nn.Conv(self.ch_in, (3, 3), padding=1, name=f"{name}_conv0")(t)
                t = nn.BatchNorm(use_running_average=not train, name=f"{name}_bn0")(t)
                t = jax.nn.silu(t)
                t = nn.Conv(self.ch_in, (3, 3), padding=1, name=f"{name}_conv1")(t)
                t = nn.BatchNorm(use_running_average=not train, name=f"{name}_bn1")(t)
                return jax.nn.silu(t)
            return f

        c = tower("cls")(x)
        r = tower("reg")(x)
        cls = nn.Conv(self.nc, (1, 1), name="cls_pred",
                      bias_init=nn.initializers.constant(-4.6))(c)
        reg = nn.Conv(4, (1, 1), name="reg_pred")(r)
        obj = nn.Conv(1, (1, 1), name="obj_pred")(x)
        return cls, reg, obj


class PositionalEncoding2D(nn.Module):
    """Learned row/col embeddings → (1, H, W, C) (heads_detr_aux.py:9-49)."""

    channels: int
    max_len: int = 256

    @nn.compact
    def __call__(self, height: int, width: int):
        half = self.channels // 2
        init = nn.initializers.uniform(scale=2.0)  # ~U(-1,1) after shift below
        row = self.param("row_embed", init, (self.max_len, half)) - 1.0
        col = self.param("col_embed", init, (self.max_len, half)) - 1.0
        x_emb = jnp.broadcast_to(col[None, :width], (height, width, half))
        y_emb = jnp.broadcast_to(row[:height, None], (height, width, half))
        return jnp.concatenate([x_emb, y_emb], axis=-1)[None]


class DETRAuxHead(nn.Module):
    """Query-based auxiliary head: input proj + 2D pos enc + transformer
    encoder over [queries; HW tokens] + cls/box MLPs (heads_detr_aux.py:51-163).
    Registered for aux supervision/distillation; not in the trained YAML heads.
    """

    input_channels: int
    num_queries: int = 100
    num_classes: int = 80
    hidden_dim: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (list, tuple)):
            x = x[0]
        B, H, W, _ = x.shape
        d = self.hidden_dim
        feat = nn.Conv(d, (1, 1), name="input_proj")(x)
        pos = PositionalEncoding2D(d, name="pos_encoder")(H, W)
        tokens = (feat + pos).reshape(B, H * W, d)
        queries = self.param("query_embed", nn.initializers.xavier_uniform(),
                             (self.num_queries, d))
        seq = jnp.concatenate([jnp.broadcast_to(queries[None], (B, self.num_queries, d)),
                               tokens], axis=1)
        for i in range(self.num_encoder_layers):
            a = nn.MultiHeadDotProductAttention(num_heads=self.num_heads,
                                                qkv_features=d, name=f"enc{i}_attn")(
                nn.LayerNorm(name=f"enc{i}_ln1")(seq), nn.LayerNorm(name=f"enc{i}_ln1b")(seq))
            seq = seq + a
            f = nn.Dense(d * 4, name=f"enc{i}_ffn1")(nn.LayerNorm(name=f"enc{i}_ln2")(seq))
            f = nn.Dense(d, name=f"enc{i}_ffn2")(jax.nn.relu(f))
            seq = seq + f
        q_out = seq[:, : self.num_queries]
        logits = nn.Dense(self.num_classes, name="class_embed")(q_out)
        boxes = jax.nn.sigmoid(nn.Dense(4, name="bbox_embed",
                                        bias_init=nn.initializers.constant(0.5))(q_out))
        return logits, boxes


# -- stable variants ----------------------------------------------------------


class LayerNorm2d(nn.Module):
    """Across-channel LayerNorm for NHWC maps (smallobj_modules_stable.py:169)."""

    num_channels: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        u = x.mean(-1, keepdims=True)
        s = ((x - u) ** 2).mean(-1, keepdims=True)
        x = (x - u) * jax.lax.rsqrt(s + self.eps)
        w = self.param("weight", nn.initializers.ones, (self.num_channels,))
        b = self.param("bias", nn.initializers.zeros, (self.num_channels,))
        return x * w + b


class HyperACEBlockStable(nn.Module):
    """Stable 2-input fusion: proj+ChannelNorm → 3x3 fuse → FusionLockTSS →
    ScaleAdd residual (smallobj_modules_stable.py:85-120)."""

    c_in_high: int
    c_in_low: int
    c_out: int

    @nn.compact
    def __call__(self, xs, train: bool = False):
        high, low = xs
        if high.shape[1:3] != low.shape[1:3]:
            high = jax.image.resize(high, (high.shape[0], *low.shape[1:3], high.shape[-1]),
                                    method="nearest")
        h = ChannelNorm(self.c_out, name="norm_h")(
            ConvBNAct(self.c_in_high, self.c_out, 1, name="ph")(high, train))
        l = ChannelNorm(self.c_out, name="norm_l")(
            ConvBNAct(self.c_in_low, self.c_out, 1, name="pl")(low, train))
        fused = ConvBNAct(self.c_out, self.c_out, 3, name="fuse_conv")(h + l, train)
        a = FusionLockTSS(self.c_out, name="attn")(fused, train)
        return ScaleAdd(init_alpha=0.2, name="scale_add")([fused, a], train)


class BiFormerLiteBlock(nn.Module):
    """Window MHA + global top-k routed tokens + FFN, LayerNorm2d-prenormed
    (smallobj_modules_stable.py:187-289)."""

    c: int
    win: int = 8
    topk: int = 64
    num_heads: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        win = self.win
        nh = self.num_heads
        hd = C // nh

        # 1) local window attention
        x1 = LayerNorm2d(C, name="norm1")(x)
        qkv = nn.Conv(C * 3, (1, 1), name="qkv_local")(x1)
        ph, pw = (win - H % win) % win, (win - W % win) % win
        qkv_p = jnp.pad(qkv, ((0, 0), (0, ph), (0, pw), (0, 0)))
        Hp, Wp = H + ph, W + pw
        gh, gw = Hp // win, Wp // win

        def to_windows(t):
            t = t.reshape(B, gh, win, gw, win, nh, hd)
            return t.transpose(0, 1, 3, 5, 2, 4, 6).reshape(B * gh * gw * nh,
                                                            win * win, hd)

        q, k, v = (to_windows(t) for t in jnp.split(qkv_p, 3, axis=-1))
        attn = jax.nn.softmax((q @ k.transpose(0, 2, 1)) * hd ** -0.5, axis=-1)
        out = (attn @ v).reshape(B, gh, gw, nh, win, win, hd)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(B, Hp, Wp, C)[:, :H, :W]
        x = x + nn.Conv(C, (1, 1), name="proj_local")(out)

        # 2) global routing: every pixel attends to the top-k strongest tokens
        x2 = LayerNorm2d(C, name="norm2")(x)
        qg = nn.Conv(C, (1, 1), name="q_proj_g")(x2).reshape(B, H * W, C)
        kv = nn.Conv(C * 2, (1, 1), name="kv_proj_g")(x2)
        kg, vg = jnp.split(kv.reshape(B, H * W, 2 * C), 2, axis=-1)
        k_sel_n = min(self.topk, H * W)
        sal = jnp.linalg.norm(kg, axis=-1)                       # (B, HW)
        _, idx = jax.lax.top_k(sal, k_sel_n)
        k_sel = jnp.take_along_axis(kg, idx[..., None], axis=1)   # (B, K, C)
        v_sel = jnp.take_along_axis(vg, idx[..., None], axis=1)

        def heads(t):
            return t.reshape(B, -1, nh, hd).transpose(0, 2, 1, 3)
        qh, kh, vh = heads(qg), heads(k_sel), heads(v_sel)
        attn_g = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * hd ** -0.5, -1)
        og = jnp.einsum("bhqk,bhkd->bhqd", attn_g, vh).transpose(0, 2, 1, 3)
        og = og.reshape(B, H, W, C)
        x = x + nn.Conv(C, (1, 1), name="proj_global")(og)

        # 3) FFN
        x3 = LayerNorm2d(C, name="norm3")(x)
        f = nn.Conv(C * 2, (1, 1), name="ffn1")(x3)
        f = nn.Conv(C, (1, 1), name="ffn2")(jax.nn.gelu(f))
        return x + f
