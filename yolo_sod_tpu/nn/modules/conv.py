"""Core convolution vocabulary (NHWC, flax.linen).

TPU-native re-expression of the reference conv primitives (reference:
ultralytics/nn/modules/conv.py — Conv :37, DWConv :102, ConvTranspose :118,
Focus :139, GhostConv :158, Concat :323; smallobj_modules.py — SpaceToDepth
:115, Add :42). Layout is NHWC so XLA tiles channels onto the 128-wide lane
dimension; BN is folded by XLA at inference via constant propagation.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# BatchNorm defaults matching the reference (BatchNorm2d(eps=1e-3, momentum=0.03);
# flax momentum = 1 - torch momentum).
BN_MOMENTUM = 0.97
BN_EPS = 1e-3


def autopad(k: int, p: int | None = None, d: int = 1):
    """Compute 'same'-style padding for kernel k, dilation d."""
    if d > 1:
        k = d * (k - 1) + 1
    if p is None:
        p = k // 2
    return p


class ConvBNAct(nn.Module):
    """Conv2d (no bias) + BatchNorm + SiLU — the universal 'Conv' block.

    Registered under the YAML name ``Conv``. Arg order mirrors the reference
    Conv(c1, c2, k, s, p, g, d, act) so YAML rows map positionally.
    """

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    d: int = 1
    act: Any = True  # True → SiLU, False/None → identity

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.k if isinstance(self.k, (tuple, list)) else (self.k, self.k)
        p0 = autopad(k[0], self.p, self.d)
        p1 = autopad(k[1], self.p, self.d)
        x = nn.Conv(
            features=self.c2,
            kernel_size=tuple(k),
            strides=(self.s, self.s),
            padding=[(p0, p0), (p1, p1)],
            kernel_dilation=(self.d, self.d),
            feature_group_count=self.g,
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn")(x)
        if self.act is True:
            x = jax.nn.silu(x)
        elif callable(self.act):
            x = self.act(x)
        return x


# YAML-facing alias: rows like [-1, 1, Conv, [64, 3, 2]] resolve to this class.
Conv = ConvBNAct


class DWConv(ConvBNAct):
    """Depthwise Conv+BN+SiLU (groups == gcd(c1, c2)). Reference conv.py:102.

    Note: reference signature is DWConv(c1, c2, k, s, d, act); callers in this
    codebase only use (c1, c2, k), so inheriting ConvBNAct's field order is safe.
    """

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math
        g = math.gcd(self.c1, self.c2)
        k = self.k if isinstance(self.k, (tuple, list)) else (self.k, self.k)
        p = autopad(k[0], self.p, self.d)
        x = nn.Conv(self.c2, tuple(k), strides=(self.s, self.s),
                    padding=[(p, p), (p, p)], kernel_dilation=(self.d, self.d),
                    feature_group_count=g, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn")(x)
        if self.act is True:
            x = jax.nn.silu(x)
        elif callable(self.act):
            x = self.act(x)
        return x


class ConvTranspose(nn.Module):
    """ConvTranspose2d + optional BN + SiLU. Reference conv.py:118."""

    c1: int
    c2: int
    k: int = 2
    s: int = 2
    p: int = 0
    bn: bool = True
    act: Any = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(self.c2, (self.k, self.k), strides=(self.s, self.s),
                             padding=[(self.p, self.p), (self.p, self.p)],
                             use_bias=not self.bn, name="conv_transpose")(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             epsilon=BN_EPS, name="bn")(x)
        if self.act is True:
            x = jax.nn.silu(x)
        return x


class Focus(nn.Module):
    """Space-to-depth (2x) then Conv. Reference conv.py:139."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: Any = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # NHWC pixel-unshuffle by 2: gather the 4 phases and concat on channels.
        x = jnp.concatenate(
            [x[:, ::2, ::2, :], x[:, 1::2, ::2, :], x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]],
            axis=-1,
        )
        return ConvBNAct(self.c1 * 4, self.c2, self.k, self.s, g=self.g, act=self.act,
                         name="conv")(x, train)


class GhostConv(nn.Module):
    """Ghost convolution: half primary conv + cheap 5x5 depthwise. Reference conv.py:158."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: Any = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = ConvBNAct(self.c1, c_, self.k, self.s, g=self.g, act=self.act, name="cv1")(x, train)
        y2 = ConvBNAct(c_, c_, 5, 1, g=c_, act=self.act, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class Concat(nn.Module):
    """Concatenate a list of feature maps on channels. Reference conv.py:323.

    The YAML dim arg (1 = channels in NCHW) maps to the NHWC channel axis.
    """

    dim: int = 1

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        axis = -1 if self.dim in (1, -1, 3) else self.dim
        return jnp.concatenate(list(xs), axis=axis)


class Add(nn.Module):
    """Elementwise sum of a list of feature maps. Reference smallobj_modules.py:42."""

    @nn.compact
    def __call__(self, xs, train: bool = False):
        if isinstance(xs, (list, tuple)):
            out = xs[0]
            for t in xs[1:]:
                out = out + t
            return out
        return xs


class Upsample(nn.Module):
    """Nearest/bilinear upsample. YAML rows use nn.Upsample [None, 2, 'nearest']."""

    size: Any = None
    scale_factor: int = 2
    mode: str = "nearest"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        if self.size is not None:
            nh, nw = self.size if isinstance(self.size, (tuple, list)) else (self.size, self.size)
        else:
            nh, nw = h * self.scale_factor, w * self.scale_factor
        if self.mode == "nearest" and self.size is None:
            # Exact integer nearest via repeat — cheaper than general resize.
            x = jnp.repeat(jnp.repeat(x, self.scale_factor, axis=1), self.scale_factor, axis=2)
            return x
        method = {"nearest": "nearest", "bilinear": "linear"}.get(self.mode, self.mode)
        return jax.image.resize(x, (b, nh, nw, c), method=method)


class SpaceToDepth(nn.Module):
    """Fold HxW into channels by factor r (pixel-unshuffle). Reference smallobj_modules.py:115."""

    r: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        r = self.r
        x = x.reshape(b, h // r, r, w // r, r, c)
        # Match torch pixel_unshuffle channel order: out channel = c * r * r with
        # (c, rh, rw) ordering in NCHW → NHWC equivalent is (rh, rw, c) varying fastest on c.
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r, r * r * c)
        return x


class ChannelNorm(nn.Module):
    """Per-pixel normalization across channels with learnable scale/offset.

    Reference stable_fuse.py:6-20.
    """

    c: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps)
        gamma = self.param("gamma", nn.initializers.ones, (self.c,))
        beta = self.param("beta", nn.initializers.zeros, (self.c,))
        return x * gamma + beta


class ScaleAdd(nn.Module):
    """x + alpha * y with learnable scalar alpha. Reference stable_fuse.py:23-39."""

    init_alpha: float = 1.0

    @nn.compact
    def __call__(self, xs, train: bool = False):
        x, y = xs
        alpha = self.param("alpha", nn.initializers.constant(self.init_alpha), ())
        return x + alpha * y
