"""CSP/ELAN block family + YOLOv12 area-attention blocks (NHWC, flax.linen).

TPU-native re-expression of reference ultralytics/nn/modules/block.py:
Bottleneck :343, C2f :233, C3 :258, C3k :744, C3k2 :733, SPPF :178,
AAttn :1252, ABlock :1367, A2C2f :1418. Attention math runs in f32 on the
MXU via einsum; XLA fuses the softmax chain.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_sod_tpu.nn.modules.conv import ConvBNAct


class Bottleneck(nn.Module):
    """Standard bottleneck: 1x1/3x3 (or kxk) convs with optional residual."""

    c1: int
    c2: int
    shortcut: bool = True
    g: int = 1
    k: Any = (3, 3)
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBNAct(self.c1, c_, self.k[0], 1, name="cv1")(x, train)
        y = ConvBNAct(c_, self.c2, self.k[1], 1, g=self.g, name="cv2")(y, train)
        if self.shortcut and self.c1 == self.c2:
            y = x + y
        return y


class C2f(nn.Module):
    """Fast CSP bottleneck: split, n bottlenecks on the running tail, concat, fuse."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBNAct(self.c1, 2 * c, 1, 1, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                Bottleneck(c, c, self.shortcut, self.g, k=(3, 3), e=1.0, name=f"m_{i}")(
                    ys[-1], train
                )
            )
        return ConvBNAct((2 + self.n) * c, self.c2, 1, name="cv2")(
            jnp.concatenate(ys, axis=-1), train
        )


class C3(nn.Module):
    """CSP bottleneck with 3 convolutions.

    Plain C3 bottlenecks use kernels (1, 3); C3k uses (k, k) — reference
    block.py:258 vs :744.
    """

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: Any = None  # None → (1, 3) plain-C3; int → (k, k) C3k; tuple pair → as-is (C3x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        if self.k is None:
            kernels = (1, 3)
        elif isinstance(self.k, int):
            kernels = (self.k, self.k)
        else:
            kernels = self.k
        y1 = ConvBNAct(self.c1, c_, 1, 1, name="cv1")(x, train)
        y2 = ConvBNAct(self.c1, c_, 1, 1, name="cv2")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, c_, self.shortcut, self.g, k=kernels, e=1.0,
                            name=f"m_{i}")(y1, train)
        return ConvBNAct(2 * c_, self.c2, 1, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train
        )


class C3k(C3):
    """C3 with square bottleneck kernels (default 3). Reference block.py:744."""

    k: int | None = 3


class C3k2(nn.Module):
    """C2f whose inner blocks are C3k (when c3k) or plain Bottleneck.

    YAML args after channel injection: (c1, c2, n, c3k, e, g, shortcut).
    """

    c1: int
    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBNAct(self.c1, 2 * c, 1, 1, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.c3k:
                blk = C3k(c, c, 2, self.shortcut, self.g, name=f"m_{i}")
            else:
                blk = Bottleneck(c, c, self.shortcut, self.g, k=(3, 3), e=0.5, name=f"m_{i}")
            ys.append(blk(ys[-1], train))
        return ConvBNAct((2 + self.n) * c, self.c2, 1, name="cv2")(
            jnp.concatenate(ys, axis=-1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 maxpools, concat, fuse."""

    c1: int
    c2: int
    k: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c1 // 2
        y = ConvBNAct(self.c1, c_, 1, 1, name="cv1")(x, train)
        k = self.k
        pools = [y]
        for _ in range(3):
            pools.append(
                nn.max_pool(pools[-1], (k, k), strides=(1, 1), padding=((k // 2,) * 2,) * 2)
            )
        return ConvBNAct(c_ * 4, self.c2, 1, 1, name="cv2")(
            jnp.concatenate(pools, axis=-1), train
        )


def _sdpa(q, k, v, head_dim: int):
    """Scaled dot-product attention over (B, H, N, D); f32 MXU accumulation
    with boundary tensors at the compute dtype (stable low-precision softmax).

    This is the TPU analog of the reference's 3-tier attention dispatch
    (block.py:1312-1357 — Sage/flash/manual): one einsum-softmax-einsum chain
    that XLA fuses; a Pallas flash kernel replaces it for long sequences.
    """
    from yolo_sod_tpu.ops.numerics import stable_softmax_lowp

    dtype = q.dtype
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32).astype(dtype)
    attn = stable_softmax_lowp(logits * (head_dim ** -0.5))
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32).astype(dtype)


class AAttn(nn.Module):
    """YOLOv12 area attention: tokens split into `area` row-strips, attention per strip.

    Reference block.py:1252-1364 (minus the CUDA-only Sage/flash dispatch —
    on TPU the single fused XLA path is the fast path).
    """

    dim: int
    num_heads: int
    area: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        N = H * W
        hd = self.dim // self.num_heads
        qk = ConvBNAct(self.dim, self.dim * 2, 1, act=False, name="qk")(x, train)
        v = ConvBNAct(self.dim, self.dim, 1, act=False, name="v")(x, train)
        pp = ConvBNAct(self.dim, self.dim, 5, 1, 2, g=self.dim, act=False, name="pe")(v, train)

        qk = qk.reshape(B, N, 2 * C)
        vt = v.reshape(B, N, C)
        a = self.area
        if a > 1:
            qk = qk.reshape(B * a, N // a, 2 * C)
            vt = vt.reshape(B * a, N // a, C)
        Bn, Nn, _ = qk.shape
        q, k = qk[..., :C], qk[..., C:]
        q = q.reshape(Bn, Nn, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(Bn, Nn, self.num_heads, hd).transpose(0, 2, 1, 3)
        vh = vt.reshape(Bn, Nn, self.num_heads, hd).transpose(0, 2, 1, 3)
        o = _sdpa(q, k, vh, hd)
        o = o.transpose(0, 2, 1, 3).reshape(Bn, Nn, C)
        if a > 1:
            o = o.reshape(B, N, C)
        o = o.reshape(B, H, W, C)
        return ConvBNAct(self.dim, self.dim, 1, act=False, name="proj")(o + pp, train)


class ABlock(nn.Module):
    """Area-attention + conv-MLP residual pair. Reference block.py:1367-1415."""

    dim: int
    num_heads: int
    mlp_ratio: float = 1.2
    area: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + AAttn(self.dim, self.num_heads, self.area, name="attn")(x, train)
        h = int(self.dim * self.mlp_ratio)
        y = ConvBNAct(self.dim, h, 1, name="mlp_0")(x, train)
        y = ConvBNAct(h, self.dim, 1, act=False, name="mlp_1")(y, train)
        return x + y


class A2C2f(nn.Module):
    """R-ELAN: C2f-style trunk of ABlock pairs (or C3k), optional layer-scale residual.

    Reference block.py:1418-1472. YAML args: (c1, c2, n, a2, area, residual,
    mlp_ratio, e, g, shortcut).
    """

    c1: int
    c2: int
    n: int = 1
    a2: bool = True
    area: int = 1
    residual: bool = False
    mlp_ratio: float = 2.0
    e: float = 0.5
    g: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        num_heads = c_ // 32
        y = ConvBNAct(self.c1, c_, 1, 1, name="cv1")(x, train)
        ys = [y]
        for i in range(self.n):
            t = ys[-1]
            if self.a2:
                t = ABlock(c_, num_heads, self.mlp_ratio, self.area, name=f"m_{i}_0")(t, train)
                t = ABlock(c_, num_heads, self.mlp_ratio, self.area, name=f"m_{i}_1")(t, train)
            else:
                t = C3k(c_, c_, 2, self.shortcut, self.g, name=f"m_{i}")(t, train)
            ys.append(t)
        out = ConvBNAct((1 + self.n) * c_, self.c2, 1, name="cv2")(
            jnp.concatenate(ys, axis=-1), train
        )
        if self.a2 and self.residual:
            gamma = self.param("gamma", nn.initializers.constant(0.01), (self.c2,))
            return x + gamma * out
        return out


class DFL(nn.Module):
    """Distribution Focal Loss integral: expectation over reg_max softmax bins.

    Reference block.py:64-84 — a frozen 1x1 conv with weights arange(reg_max);
    here simply the closed-form expectation (no parameters).
    """

    c1: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, A, 4*c1) → (B, A, 4)
        b, a, _ = x.shape
        x = x.reshape(b, a, 4, self.c1)
        probs = jax.nn.softmax(x.astype(jnp.float32), axis=-1)
        bins = jnp.arange(self.c1, dtype=jnp.float32)
        return jnp.einsum("bafc,c->baf", probs, bins)
