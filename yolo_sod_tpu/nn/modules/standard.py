"""Remaining stock ultralytics module vocabulary (NHWC, flax.linen).

TPU-native re-expression of the reference's standard blocks not already in
conv.py/block.py:
- Attention / PSABlock / PSA / C2PSA    (reference nn/modules/block.py:876-1050;
  the fork's SageAttention one-shot probe paths :908-976 collapse into the
  plain stabilized-softmax branch — module choice is static under jit)
- C1, C2, C3x, RepC3, BottleneckCSP, SPP (reference block.py)
- RepConv (train-time 3x3+1x1+identity branches), LightConv, ChannelAttention,
  SpatialAttention, CBAM                 (reference conv.py:174-321)
- HGStem / HGBlock                       (PPHGNetV2, reference block.py)
"""

from __future__ import annotations

import contextlib
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_sod_tpu.nn.modules.block import Bottleneck, C3
from yolo_sod_tpu.nn.modules.conv import (BN_EPS, BN_MOMENTUM, ConvBNAct,
                                          DWConv, autopad)


class Attention(nn.Module):
    """PSA multi-head attention: qkv 1x1 + DW 3x3 positional conv on v
    (reference block.py:876-976)."""

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        nh = self.num_heads
        head_dim = C // nh
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim ** -0.5
        nh_kd = key_dim * nh
        h = C + nh_kd * 2
        qkv = ConvBNAct(C, h, 1, act=False, name="qkv")(x, train)
        qkv = qkv.reshape(B, H * W, nh, key_dim * 2 + head_dim).transpose(0, 2, 1, 3)
        q, k, v = jnp.split(qkv, [key_dim, key_dim * 2], axis=-1)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, H, W, C)
        pe = ConvBNAct(C, C, 3, g=C, act=False, name="pe")(
            v.transpose(0, 2, 1, 3).reshape(B, H, W, C), train)
        return ConvBNAct(C, C, 1, act=False, name="proj")(o + pe, train)


class PSABlock(nn.Module):
    """Attention + FFN residual pair (reference block.py:1053)."""

    c: int
    attn_ratio: float = 0.5
    num_heads: int = 4
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = Attention(self.c, self.num_heads, self.attn_ratio, name="attn")(x, train)
        x = x + a if self.shortcut else a
        f = ConvBNAct(self.c, self.c * 2, 1, name="ffn0")(x, train)
        f = ConvBNAct(self.c * 2, self.c, 1, act=False, name="ffn1")(f, train)
        return x + f if self.shortcut else f


class PSA(nn.Module):
    """Position-sensitive attention block (reference block.py:1093)."""

    c1: int
    c2: int
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c1 * self.e)
        y = ConvBNAct(self.c1, 2 * c, 1, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        b = PSABlock(c, attn_ratio=0.5, num_heads=c // 64 or 1, name="m")(b, train)
        return ConvBNAct(2 * c, self.c1, 1, name="cv2")(
            jnp.concatenate([a, b], -1), train)


class C2PSA(nn.Module):
    """CSP wrapper around n PSABlocks (reference block.py:1129)."""

    c1: int
    c2: int
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c1 * self.e)
        y = ConvBNAct(self.c1, 2 * c, 1, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            b = PSABlock(c, attn_ratio=0.5, num_heads=c // 64 or 1,
                         name=f"m_{i}")(b, train)
        return ConvBNAct(2 * c, self.c1, 1, name="cv2")(
            jnp.concatenate([a, b], -1), train)


class C1(nn.Module):
    """CSP bottleneck with 1 conv (reference block.py)."""

    c1: int
    c2: int
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNAct(self.c1, self.c2, 1, name="cv1")(x, train)
        z = y
        for i in range(self.n):
            z = ConvBNAct(self.c2, self.c2, 3, name=f"m_{i}")(z, train)
        return z + y


class C2(nn.Module):
    """CSP bottleneck with 2 convs (reference block.py)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBNAct(self.c1, 2 * c, 1, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            a = Bottleneck(c, c, self.shortcut, self.g, k=(3, 3), e=1.0,
                           name=f"m_{i}")(a, train)
        return ConvBNAct(2 * c, self.c2, 1, name="cv2")(
            jnp.concatenate([a, b], -1), train)


class C3x(C3):
    """C3 with cross-conv (1,3)/(3,1) bottleneck kernels — reference block.py C3x."""

    k: Tuple = ((1, 3), (3, 1))
    shortcut: bool = True


_REP_DEPLOY = False


@contextlib.contextmanager
def rep_deploy(enabled: bool = True):
    """Trace-time switch: RepConv instantiates its single fused 3x3 instead
    of the train branches. Used together with the checkpoint transform
    `utils/reparam.fuse_rep_variables` (reference RepConv.fuse_convs
    conv.py:228-286). Only affects tracing — wrap the apply/jit call."""
    global _REP_DEPLOY
    prev = _REP_DEPLOY
    _REP_DEPLOY = bool(enabled)
    try:
        yield
    finally:
        _REP_DEPLOY = prev


class RepConv(nn.Module):
    """RepVGG-style conv: 3x3 + 1x1 (+BN identity) branches at train time
    (reference conv.py:174). Branches stay separate here; XLA fuses the
    elementwise sum. Deploy-time fusion is the checkpoint transform
    `utils/reparam.fuse_rep_variables` applied under `rep_deploy()`, which
    swaps the trace to a single biased 3x3 (kills two reads of the input
    activation map — an HBM-traffic win, not just an op-count one)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 1
    act: bool = True
    bn: bool = False   # identity-BN third branch (reference conv.py:193, off by default)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if _REP_DEPLOY:
            p = autopad(self.k)
            y = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                        padding=[(p, p), (p, p)], use_bias=True,
                        name="fused")(x)
            return jax.nn.silu(y) if self.act else y
        y1 = ConvBNAct(self.c1, self.c2, self.k, self.s, act=False, name="conv1")(x, train)
        y2 = ConvBNAct(self.c1, self.c2, 1, self.s, act=False, name="conv2")(x, train)
        y = y1 + y2
        if self.bn and self.c1 == self.c2 and self.s == 1:
            idn = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                               epsilon=BN_EPS, name="bn")(x)
            y = y + idn
        return jax.nn.silu(y) if self.act else y


class LightConv(nn.Module):
    """1x1 conv + DW conv (reference conv.py)."""

    c1: int
    c2: int
    k: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(self.c1, self.c2, 1, act=False, name="conv1")(x, train)
        return DWConv(self.c2, self.c2, self.k, name="conv2")(x, train)


class ChannelAttention(nn.Module):
    """Stock channel gate: GAP -> 1x1 -> sigmoid (reference conv.py:262)."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.channels, (1, 1), use_bias=True, name="fc")(g)
        return x * jax.nn.sigmoid(g)


class SpatialAttention(nn.Module):
    """Stock spatial gate: [mean, max] -> kxk conv -> sigmoid (conv.py:283)."""

    kernel_size: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        s = jnp.concatenate([x.mean(-1, keepdims=True), x.max(-1, keepdims=True)], -1)
        s = nn.Conv(1, (k, k), padding=k // 2, use_bias=False, name="cv1")(s)
        return x * jax.nn.sigmoid(s)


class CBAM(nn.Module):
    """Stock CBAM = ChannelAttention ∘ SpatialAttention (conv.py:309)."""

    c1: int
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ChannelAttention(self.c1, name="channel_attention")(x, train)
        return SpatialAttention(self.kernel_size, name="spatial_attention")(x, train)


class SPP(nn.Module):
    """Spatial pyramid pooling, parallel k-sizes (reference block.py:164)."""

    c1: int
    c2: int
    k: Tuple[int, ...] = (5, 9, 13)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c1 // 2
        x = ConvBNAct(self.c1, c_, 1, name="cv1")(x, train)
        pools = [x] + [
            nn.max_pool(x, (k, k), strides=(1, 1), padding=((k // 2, k // 2),) * 2)
            for k in self.k]
        return ConvBNAct(c_ * (len(self.k) + 1), self.c2, 1, name="cv2")(
            jnp.concatenate(pools, -1), train)


class RepC3(nn.Module):
    """C3 with RepConv bottlenecks (reference block.py RepC3, RT-DETR neck)."""

    c1: int
    c2: int
    n: int = 3
    e: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBNAct(self.c1, c_, 1, name="cv1")(x, train)
        b = ConvBNAct(self.c1, c_, 1, name="cv2")(x, train)
        for i in range(self.n):
            a = RepConv(c_, c_, name=f"m_{i}")(a, train)
        out = a + b
        if c_ != self.c2:
            out = ConvBNAct(c_, self.c2, 1, act=False, name="cv3")(out, train)
        return out


class BottleneckCSP(nn.Module):
    """Original CSP bottleneck (reference block.py:318)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBNAct(self.c1, c_, 1, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, c_, self.shortcut, self.g, e=1.0,
                            name=f"m_{i}")(y1, train)
        y1 = nn.Conv(c_, (1, 1), use_bias=False, name="cv3")(y1)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, name="cv2")(x)
        y = jnp.concatenate([y1, y2], -1)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn")(y)
        return ConvBNAct(2 * c_, self.c2, 1, name="cv4")(jax.nn.silu(y), train)


class HGStem(nn.Module):
    """PPHGNetV2 stem: 5 convs + maxpool (reference block.py:96)."""

    c1: int
    cm: int
    c2: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(self.c1, self.cm, 3, 2, act=jax.nn.relu, name="stem1")(x, train)
        x2 = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = ConvBNAct(self.cm, self.cm // 2, 2, 1, p=0, act=jax.nn.relu,
                       name="stem2a")(x2, train)
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = ConvBNAct(self.cm // 2, self.cm, 2, 1, p=0, act=jax.nn.relu,
                       name="stem2b")(x2, train)
        x1 = nn.max_pool(x, (2, 2), strides=(1, 1), padding=((1, 0), (1, 0)))
        x = jnp.concatenate([x1, x2], -1)
        x = ConvBNAct(self.cm * 2, self.cm, 3, 2, act=jax.nn.relu, name="stem3")(x, train)
        return ConvBNAct(self.cm, self.c2, 1, 1, act=jax.nn.relu, name="stem4")(x, train)


class HGBlock(nn.Module):
    """PPHGNetV2 block: n LightConvs + squeeze/excite convs (block.py:125)."""

    c1: int
    cm: int
    c2: int
    k: int = 3
    n: int = 6
    lightconv: bool = False
    shortcut: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = LightConv if self.lightconv else ConvBNAct
        ys = [x]
        c = self.c1
        for i in range(self.n):
            ys.append(block(c, self.cm, self.k, name=f"m_{i}")(ys[-1], train))
            c = self.cm
        y = jnp.concatenate(ys, -1)
        y = ConvBNAct(self.c1 + self.n * self.cm, self.c2 // 2, 1,
                      act=jax.nn.relu, name="sc")(y, train)
        y = ConvBNAct(self.c2 // 2, self.c2, 1, act=jax.nn.relu, name="ec")(y, train)
        return y + x if self.shortcut and self.c1 == self.c2 else y


class ResNetBlock(nn.Module):
    """Bottleneck ResNet block, e-expansion (reference block.py:381-395)."""

    c1: int
    c2: int
    s: int = 1
    e: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        c3 = self.e * self.c2
        y = ConvBNAct(self.c1, self.c2, 1, 1, name="cv1")(x, train)
        y = ConvBNAct(self.c2, self.c2, 3, self.s, p=1, name="cv2")(y, train)
        y = ConvBNAct(self.c2, c3, 1, act=False, name="cv3")(y, train)
        if self.s != 1 or self.c1 != c3:
            x = ConvBNAct(self.c1, c3, 1, self.s, act=False, name="shortcut")(x, train)
        return jax.nn.relu(y + x)


class ResNetLayer(nn.Module):
    """Stack of ResNet blocks, or the 7x7 stem when is_first
    (reference block.py:398-417; RT-DETR ResNet backbones)."""

    c1: int
    c2: int
    s: int = 1
    is_first: bool = False
    n: int = 1
    e: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.is_first:
            x = ConvBNAct(self.c1, self.c2, 7, 2, p=3, name="stem")(x, train)
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = ResNetBlock(self.c1, self.c2, self.s, e=self.e, name="m_0")(x, train)
        for i in range(1, self.n):
            x = ResNetBlock(self.e * self.c2, self.c2, 1, e=self.e,
                            name=f"m_{i}")(x, train)
        return x


class AGLU(nn.Module):
    """Unified (adaptive generalized linear unit) activation
    (reference nn/modules/activation.py:8-22): exp((1/lam) * softplus_{beta=-1}(kappa*x - log lam))
    with learnable scalar lam (clamped >= 1e-4) and kappa, both init U(0, 1)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        lambd = self.param("lambd", nn.initializers.uniform(scale=1.0), (1,), jnp.float32)
        kappa = self.param("kappa", nn.initializers.uniform(scale=1.0), (1,), jnp.float32)
        lam = jnp.clip(lambd, 1e-4, None).astype(x.dtype)
        y = kappa.astype(x.dtype) * x - jnp.log(lam)
        return jnp.exp(-jax.nn.softplus(-y) / lam)
