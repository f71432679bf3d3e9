"""TinyViT image encoder for MobileSAM (NHWC, flax.linen).

TPU-native re-expression of reference models/sam/modules/tiny_encoder.py:
PatchEmbed (:62), MBConv (:104), PatchMerging (:165), ConvLayer (:222),
Attention w/ trained spatial biases (:363), TinyViTBlock (:492),
BasicLayer (:650), TinyViT (:765).

Design: feature maps stay (B, H, W, C) end-to-end (the reference flip-flops
between token and map layouts; NHWC keeps channels on the TPU lane dim and
makes the window partition a pure static reshape). The attention-bias index
table is built with numpy at trace time — a compile-time constant gather.
"""

from __future__ import annotations

import itertools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolo_sod_tpu.models.sam.modules import LayerNorm2d


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm, inference uses running stats
    (reference tiny_encoder.py:24 Conv2d_BN)."""

    c2: int
    k: int = 1
    s: int = 1
    p: int = 0
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding=[(self.p, self.p)] * 2,
                    feature_group_count=self.groups, use_bias=False,
                    name="c")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


class MBConv(nn.Module):
    """Mobile inverted bottleneck (reference :104)."""

    dim: int
    expand: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = int(self.dim * self.expand)
        shortcut = x
        x = jax.nn.gelu(ConvBN(h, 1, name="conv1")(x, train), approximate=False)
        x = jax.nn.gelu(ConvBN(h, 3, p=1, groups=h, name="conv2")(x, train),
                        approximate=False)
        x = ConvBN(self.dim, 1, name="conv3")(x, train)
        return jax.nn.gelu(x + shortcut, approximate=False)


class PatchMerging(nn.Module):
    """1x1 → dw 3x3 (stride 2 unless out_dim ∈ {320,448,576}) → 1x1
    (reference :165)."""

    out_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = 1 if self.out_dim in (320, 448, 576) else 2
        x = jax.nn.gelu(ConvBN(self.out_dim, 1, name="conv1")(x, train),
                        approximate=False)
        x = jax.nn.gelu(ConvBN(self.out_dim, 3, s=s, p=1,
                               groups=self.out_dim, name="conv2")(x, train),
                        approximate=False)
        return ConvBN(self.out_dim, 1, name="conv3")(x, train)


def _bias_idxs(ws: int) -> np.ndarray:
    """Static (ws², ws²) index table into the unique-offset bias rows
    (reference :441-452)."""
    points = list(itertools.product(range(ws), range(ws)))
    offsets, idxs = {}, []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    return np.array(idxs, np.int32).reshape(len(points), len(points))


class BiasedAttention(nn.Module):
    """Pre-norm MHA with trained per-offset spatial biases (reference :363,
    attn_ratio=1 as TinyViTBlock uses)."""

    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self, x):
        B, N, _ = x.shape
        kd = self.dim // self.num_heads           # key_dim = head_dim
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        qkv = nn.Dense(3 * self.num_heads * kd, name="qkv")(x)
        qkv = qkv.reshape(B, N, self.num_heads, 3 * kd)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in
                   (qkv[..., :kd], qkv[..., kd:2 * kd], qkv[..., 2 * kd:]))
        idxs = _bias_idxs(self.window_size)
        biases = self.param("attention_biases", nn.initializers.zeros,
                            (self.num_heads, int(idxs.max()) + 1))
        attn = jnp.einsum("bnqc,bnkc->bnqk", q, k) * (kd ** -0.5)
        attn = attn + biases[:, idxs][None]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnqk,bnkc->bnqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, self.num_heads * kd)
        return nn.Dense(self.dim, name="proj")(out)


class TinyViTBlock(nn.Module):
    """Windowed biased attention + depthwise local conv + pre-norm MLP
    (reference :492)."""

    dim: int
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        ws = self.window_size
        res = x
        ph, pw = (-H) % ws, (-W) % ws
        Hp, Wp = H + ph, W + pw
        y = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        y = y.reshape(B, Hp // ws, ws, Wp // ws, ws, C) \
             .transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)
        y = BiasedAttention(self.dim, self.num_heads, ws, name="attn")(y)
        y = y.reshape(B, Hp // ws, Wp // ws, ws, ws, C) \
             .transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
        x = res + y[:, :H, :W]
        x = ConvBN(self.dim, 3, p=1, groups=self.dim,
                   name="local_conv")(x, train)
        # pre-norm MLP (reference Mlp :315 norms inside)
        y = nn.LayerNorm(epsilon=1e-5, name="mlp_norm")(x)
        y = jax.nn.gelu(nn.Dense(int(self.dim * self.mlp_ratio),
                                 name="fc1")(y), approximate=False)
        return x + nn.Dense(self.dim, name="fc2")(y)


class TinyViT(nn.Module):
    """MobileSAM's image encoder (reference :765). (B, S, S, 3) →
    (B, S/16, S/16, 256)."""

    img_size: int = 1024
    embed_dims: Tuple[int, ...] = (64, 128, 160, 320)
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (2, 4, 5, 10)
    window_sizes: Tuple[int, ...] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    mbconv_expand_ratio: float = 4.0
    out_chans: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        d0 = self.embed_dims[0]
        x = jax.nn.gelu(ConvBN(d0 // 2, 3, s=2, p=1,
                               name="patch_embed_0")(x, train),
                        approximate=False)
        x = ConvBN(d0, 3, s=2, p=1, name="patch_embed_1")(x, train)
        # stage 0: MBConv stack + merge
        for i in range(self.depths[0]):
            x = MBConv(d0, self.mbconv_expand_ratio,
                       name=f"layer0_block{i}")(x, train)
        x = PatchMerging(self.embed_dims[1], name="layer0_down")(x, train)
        # stages 1..3: windowed attention blocks (+ merge except last)
        for li in range(1, len(self.depths)):
            for i in range(self.depths[li]):
                x = TinyViTBlock(self.embed_dims[li], self.num_heads[li],
                                 self.window_sizes[li], self.mlp_ratio,
                                 name=f"layer{li}_block{i}")(x, train)
            if li < len(self.depths) - 1:
                x = PatchMerging(self.embed_dims[li + 1],
                                 name=f"layer{li}_down")(x, train)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck_0")(x)
        x = LayerNorm2d(name="neck_1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False,
                    name="neck_2")(x)
        return LayerNorm2d(name="neck_3")(x)
