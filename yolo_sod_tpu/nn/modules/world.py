"""YOLO-World open-vocabulary modules (NHWC, flax.linen).

TPU-native re-expression of the reference's vision-language vocabulary
(reference ultralytics/nn/modules/block.py — MaxSigmoidAttnBlock :419,
C2fAttn :455, ImagePoolingAttn :482, ContrastiveHead :528,
BNContrastiveHead :546; head.py — WorldDetect :307).

Design notes (TPU-first):
- Everything is einsum over the channel (lane) axis in NHWC; the text guide
  rides along as a (B, N, D) tensor so the whole image+text forward is one
  XLA graph — no host round-trip between the text encoder and the detector.
- Region-text similarity (ContrastiveHead) is a single (B,H,W,C)x(B,K,C)
  contraction: MXU-shaped, batched over levels by the head loop.
- AdaptiveMaxPool with static shapes unrolls into k*k slice-max reduces at
  trace time (k=3 -> 9 fused VPU reduces), not a dynamic pooling loop.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_sod_tpu.nn.modules.block import Bottleneck
from yolo_sod_tpu.nn.modules.conv import ConvBNAct, DWConv


def _adaptive_max_pool(x: jax.Array, k: int) -> jax.Array:
    """torch AdaptiveMaxPool2d((k, k)) on an NHWC map with static H, W.

    Output cell (i, j) takes the max over rows [floor(i*H/k), ceil((i+1)*H/k))
    — the exact torch window rule — via a trace-time unrolled slice-max.
    """
    B, H, W, C = x.shape
    rows = []
    for i in range(k):
        r0, r1 = (i * H) // k, -(-((i + 1) * H) // k)
        cols = []
        for j in range(k):
            c0, c1 = (j * W) // k, -(-((j + 1) * W) // k)
            cols.append(jnp.max(x[:, r0:r1, c0:c1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)       # (B, k, k, C)


class MaxSigmoidAttnBlock(nn.Module):
    """Text-guided max-sigmoid spatial attention (reference block.py:419).

    Each head's spatial map is reweighted by its best-matching text token:
    aw[b, h, w, m] = sigmoid(max_n <embed[b,h,w,m,:], guide[b,n,m,:]> / sqrt(hc)).
    """

    c1: int
    c2: int
    nh: int = 1
    ec: int = 128
    gc: int = 512
    scale: bool = False

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        B, H, W, _ = x.shape
        hc = self.c2 // self.nh
        g = nn.Dense(self.ec, name="gl")(guide)                   # (B, N, ec)
        g = g.reshape(B, -1, self.nh, hc)
        embed = ConvBNAct(self.c1, self.ec, 1, act=False, name="ec")(x, train) \
            if self.c1 != self.ec else x
        embed = embed.reshape(B, H, W, self.nh, hc)
        aw = jnp.einsum("bhwmc,bnmc->bhwmn", embed, g)
        aw = jnp.max(aw, axis=-1) / (hc ** 0.5)
        aw = aw + self.param("bias", nn.initializers.zeros, (self.nh,))
        aw = jax.nn.sigmoid(aw)
        if self.scale:
            aw = aw * self.param("scale", nn.initializers.ones, (1, 1, 1, self.nh))
        out = ConvBNAct(self.c1, self.c2, 3, act=False, name="proj_conv")(x, train)
        out = out.reshape(B, H, W, self.nh, hc) * aw[..., None]
        return out.reshape(B, H, W, self.c2)


class C2fAttn(nn.Module):
    """C2f with a text-guided attention branch appended (reference block.py:455)."""

    c1: int
    c2: int
    n: int = 1
    ec: int = 128
    nh: int = 1
    gc: int = 512
    shortcut: bool = False
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBNAct(self.c1, 2 * c, 1, 1, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(Bottleneck(c, c, self.shortcut, self.g, k=(3, 3), e=1.0,
                                 name=f"m_{i}")(ys[-1], train))
        ys.append(MaxSigmoidAttnBlock(c, c, nh=self.nh, ec=self.ec,
                                      gc=self.gc, name="attn")(ys[-1], guide, train))
        return ConvBNAct((3 + self.n) * c, self.c2, 1, name="cv2")(
            jnp.concatenate(ys, axis=-1), train)


class ImagePoolingAttn(nn.Module):
    """Image-aware text-embedding refinement (reference block.py:482).

    Pools each pyramid level to k x k patches, cross-attends text queries over
    the pooled patches, and residually updates the text features. Returns the
    refined guide, not a feature map.
    """

    ec: int = 256
    ch: Tuple[int, ...] = ()
    ct: int = 512
    nh: int = 8
    k: int = 3
    scale: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], text, train: bool = False):
        B = xs[0].shape[0]
        hc = self.ec // self.nh
        patches = []
        for i, (x, c1) in enumerate(zip(xs, self.ch)):
            p = nn.Conv(self.ec, (1, 1), use_bias=True,
                        name=f"projections_{i}")(x)
            patches.append(_adaptive_max_pool(p, self.k).reshape(B, -1, self.ec))
        feats = jnp.concatenate(patches, axis=1)          # (B, nf*k*k, ec)

        q = nn.Dense(self.ec, name="query")(nn.LayerNorm(name="query_ln")(text))
        k = nn.Dense(self.ec, name="key")(nn.LayerNorm(name="key_ln")(feats))
        v = nn.Dense(self.ec, name="value")(nn.LayerNorm(name="value_ln")(feats))
        q = q.reshape(B, -1, self.nh, hc)
        k = k.reshape(B, -1, self.nh, hc)
        v = v.reshape(B, -1, self.nh, hc)
        aw = jnp.einsum("bnmc,bkmc->bmnk", q, k) / (hc ** 0.5)
        aw = jax.nn.softmax(aw, axis=-1)
        out = jnp.einsum("bmnk,bkmc->bnmc", aw, v).reshape(B, -1, self.ec)
        out = nn.Dense(self.ct, name="proj")(out)
        s = self.param("scale", nn.initializers.zeros, (1,)) if self.scale else 1.0
        return out * s + text


class ContrastiveHead(nn.Module):
    """Region-text similarity logits (reference block.py:528): l2-normalized
    dot product with a learned temperature and a -10 bias (keeps the initial
    cls loss consistent with the BCE heads)."""

    @nn.compact
    def __call__(self, x, w):
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        w = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-12)
        logit_scale = self.param("logit_scale",
                                 nn.initializers.constant(jnp.log(1 / 0.07)), ())
        bias = self.param("bias", nn.initializers.constant(-10.0), (1,))
        return jnp.einsum("bhwc,bkc->bhwk", x, w) * jnp.exp(logit_scale) + bias


class BNContrastiveHead(nn.Module):
    """BatchNorm variant of ContrastiveHead (reference block.py:546)."""

    embed_dims: int

    @nn.compact
    def __call__(self, x, w, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, name="norm")(x)
        w = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-12)
        logit_scale = self.param("logit_scale",
                                 nn.initializers.constant(-1.0), ())
        bias = self.param("bias", nn.initializers.constant(-10.0), (1,))
        return jnp.einsum("bhwc,bkc->bhwk", x, w) * jnp.exp(logit_scale) + bias


class WorldDetect(nn.Module):
    """Detect head whose cls logits are region-text similarities
    (reference head.py:307). Box tower is standard DFL; the cls tower embeds
    regions to `embed` dims and scores them against the text guide through a
    (BN)ContrastiveHead. nc is the *decode-time* text count; no parameter
    shape depends on it, so the same weights serve any vocabulary.
    """

    nc: int = 80
    embed: int = 512
    with_bn: bool = False
    ch: Tuple[int, ...] = ()
    legacy: bool = True
    strides: Tuple[int, ...] = ()
    reg_max: int = 16

    @property
    def nl(self):
        return len(self.ch)

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], guide, train: bool = False,
                 active_mask: jax.Array | None = None):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outs = []
        for i, (x, c1) in enumerate(zip(xs, self.ch)):
            b = ConvBNAct(c1, c2, 3, name=f"cv2_{i}_0")(x, train)
            b = ConvBNAct(c2, c2, 3, name=f"cv2_{i}_1")(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True,
                        bias_init=nn.initializers.constant(1.0),
                        name=f"cv2_{i}_2")(b)
            e = ConvBNAct(c1, c3, 3, name=f"cv3_{i}_0")(x, train)
            e = ConvBNAct(c3, c3, 3, name=f"cv3_{i}_1")(e, train)
            e = nn.Conv(self.embed, (1, 1), use_bias=True, name=f"cv3_{i}_2")(e)
            if self.with_bn:
                c = BNContrastiveHead(self.embed, name=f"cv4_{i}")(e, guide, train)
            else:
                c = ContrastiveHead(name=f"cv4_{i}")(e, guide)
            y = jnp.concatenate([b, c], axis=-1)
            if active_mask is not None:
                y = y * active_mask[i].astype(y.dtype)
            outs.append(y)
        return outs
