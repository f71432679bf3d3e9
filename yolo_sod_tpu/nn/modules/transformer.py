"""Transformer module library (NHWC, flax.linen).

TPU-native re-expression of reference nn/modules/transformer.py (427 LoC):
- TransformerEncoderLayer (:28), AIFI intra-scale interaction (:86)
- MLP (:174)
- MSDeformAttn multi-scale deformable attention (:218) with the pure-gather
  sampling of nn/modules/utils.py:42 (multi_scale_deformable_attn_pytorch)
  re-expressed as vectorized bilinear gathers — no grid_sample dependency
- DeformableTransformerDecoderLayer (:312) / DeformableTransformerDecoder (:374)

These power RTDETRDecoder-style heads and DETRAuxHead distillation.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from flax import linen as nn


def inverse_sigmoid(x, eps: float = 1e-5):
    """log(x / (1-x)) with clamping (reference nn/modules/utils.py:34)."""
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def bias_init_with_prob(prior_prob: float = 0.01) -> float:
    """Bias init so sigmoid(bias) == prior_prob (reference utils.py:21)."""
    return float(-math.log((1 - prior_prob) / prior_prob))


class MLP(nn.Module):
    """Simple FFN stack (reference transformer.py:174)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = jax.nn.relu(nn.Dense(self.hidden_dim, name=f"layer{i}")(x))
        return nn.Dense(self.output_dim, name=f"layer{self.num_layers - 1}")(x)


class TransformerEncoderLayer(nn.Module):
    """Post-norm MHA + FFN encoder layer (reference transformer.py:28)."""

    c1: int
    cm: int = 2048
    num_heads: int = 8
    normalize_before: bool = False

    @nn.compact
    def __call__(self, src, pos=None, train: bool = False):
        q = k = src if pos is None else src + pos
        if self.normalize_before:
            s = nn.LayerNorm(name="norm1")(src)
            q = k = s if pos is None else s + pos
            a = nn.MultiHeadDotProductAttention(self.num_heads, qkv_features=self.c1,
                                                name="ma")(q, k, s)
            src = src + a
            s = nn.LayerNorm(name="norm2")(src)
            f = nn.Dense(self.cm, name="fc1")(s)
            f = nn.Dense(self.c1, name="fc2")(jax.nn.gelu(f))
            return src + f
        a = nn.MultiHeadDotProductAttention(self.num_heads, qkv_features=self.c1,
                                            name="ma")(q, k, src)
        src = nn.LayerNorm(name="norm1")(src + a)
        f = nn.Dense(self.cm, name="fc1")(src)
        f = nn.Dense(self.c1, name="fc2")(jax.nn.gelu(f))
        return nn.LayerNorm(name="norm2")(src + f)


class AIFI(nn.Module):
    """Intra-scale feature interaction on the top pyramid level with 2D
    sin-cos positional encoding (reference transformer.py:86)."""

    c1: int
    cm: int = 2048
    num_heads: int = 8

    @staticmethod
    def build_2d_sincos_pos_embed(w: int, h: int, embed_dim: int,
                                  temperature: float = 10000.0):
        grid_w = jnp.arange(w, dtype=jnp.float32)
        grid_h = jnp.arange(h, dtype=jnp.float32)
        gw, gh = jnp.meshgrid(grid_w, grid_h, indexing="ij")
        pos_dim = embed_dim // 4
        omega = jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim
        omega = 1.0 / (temperature ** omega)
        out_w = gw.flatten()[..., None] @ omega[None]
        out_h = gh.flatten()[..., None] @ omega[None]
        return jnp.concatenate([jnp.sin(out_w), jnp.cos(out_w),
                                jnp.sin(out_h), jnp.cos(out_h)], axis=1)[None]

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        pos = self.build_2d_sincos_pos_embed(W, H, C)
        seq = x.reshape(B, H * W, C)
        seq = TransformerEncoderLayer(C, self.cm, self.num_heads, name="enc")(
            seq, pos=pos.astype(seq.dtype), train=train)
        return seq.reshape(B, H, W, C)


def multi_scale_deformable_attn(value, value_spatial_shapes, sampling_locations,
                                attention_weights):
    """Pure-gather MSDA (reference nn/modules/utils.py:42).

    Args:
        value: (B, Lv, nh, hd) flattened multi-level features.
        value_spatial_shapes: list of (H, W) per level.
        sampling_locations: (B, Lq, nh, nl, np, 2) normalized [0,1] xy.
        attention_weights: (B, Lq, nh, nl, np).

    Returns:
        (B, Lq, nh*hd).
    """
    B, _, nh, hd = value.shape
    _, Lq, _, nl, npts, _ = sampling_locations.shape
    splits = [h * w for h, w in value_spatial_shapes]
    offsets_cum = [sum(splits[:i]) for i in range(1, len(splits))]
    values = jnp.split(value, offsets_cum, axis=1)
    out = []
    for lvl, (H, W) in enumerate(value_spatial_shapes):
        v = values[lvl].reshape(B, H, W, nh, hd)
        loc = sampling_locations[:, :, :, lvl]          # (B, Lq, nh, np, 2) in [0,1]
        xy = loc * jnp.array([W, H], loc.dtype) - 0.5
        x0 = jnp.floor(xy[..., 0])
        y0 = jnp.floor(xy[..., 1])
        wx = xy[..., 0] - x0
        wy = xy[..., 1] - y0

        def gather(yi, xi):
            # grid_sample(padding_mode="zeros") semantics: out-of-range
            # corners contribute ZERO (reference utils.py:69-71), not the
            # clamped border pixel.
            yi = yi.astype(jnp.int32)
            xi = xi.astype(jnp.int32)
            inb = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
            yc = jnp.clip(yi, 0, H - 1)
            xc = jnp.clip(xi, 0, W - 1)
            # v: (B, H, W, nh, hd); index per (B, Lq, nh, np)
            b_idx = jnp.arange(B)[:, None, None, None]
            h_idx = jnp.arange(nh)[None, None, :, None]
            g = v[b_idx, yc, xc, h_idx]                  # (B, Lq, nh, np, hd)
            return g * inb[..., None].astype(g.dtype)

        s = (gather(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
             + gather(y0, x0 + 1) * (wx * (1 - wy))[..., None]
             + gather(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
             + gather(y0 + 1, x0 + 1) * (wx * wy)[..., None])
        out.append(s)                                    # (B, Lq, nh, np, hd)
    sampled = jnp.stack(out, axis=3)                     # (B, Lq, nh, nl, np, hd)
    out = (sampled * attention_weights[..., None]).sum(axis=(3, 4))
    return out.reshape(B, Lq, nh * hd)


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention (reference transformer.py:218)."""

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(self, query, refer_bbox, value, value_shapes, value_mask=None):
        """query (B, Lq, C); refer_bbox (B, Lq, n_levels, 2|4) normalized;
        value (B, Lv, C); value_shapes list[(H, W)]."""
        B, Lq = query.shape[:2]
        nh, nl, npts = self.n_heads, self.n_levels, self.n_points
        hd = self.d_model // nh

        v = nn.Dense(self.d_model, name="value_proj")(value)
        if value_mask is not None:
            v = jnp.where(value_mask[..., None], v, 0.0)
        v = v.reshape(B, -1, nh, hd)

        # Grid-prior init for sampling offsets (reference _reset_parameters).
        def offset_init(key, shape, dtype=jnp.float32):
            thetas = jnp.arange(nh, dtype=jnp.float32) * (2.0 * math.pi / nh)
            grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)
            grid = grid / jnp.abs(grid).max(-1, keepdims=True)
            grid = jnp.tile(grid.reshape(nh, 1, 1, 2), (1, nl, npts, 1))
            scale = jnp.arange(1, npts + 1, dtype=jnp.float32).reshape(1, 1, npts, 1)
            return (grid * scale).reshape(-1).astype(dtype)

        offsets = nn.Dense(nh * nl * npts * 2, name="sampling_offsets",
                           kernel_init=nn.initializers.zeros,
                           bias_init=offset_init)(query)
        offsets = offsets.reshape(B, Lq, nh, nl, npts, 2)
        weights = nn.Dense(nh * nl * npts, name="attention_weights",
                           kernel_init=nn.initializers.zeros)(query)
        weights = jax.nn.softmax(weights.reshape(B, Lq, nh, nl * npts), -1)
        weights = weights.reshape(B, Lq, nh, nl, npts)

        if refer_bbox.shape[-1] == 2:
            norm = jnp.array([[w, h] for h, w in value_shapes], offsets.dtype)
            loc = refer_bbox[:, :, None, :, None, :] + \
                offsets / norm[None, None, None, :, None, :]
        else:
            loc = refer_bbox[:, :, None, :, None, :2] + \
                offsets / npts * refer_bbox[:, :, None, :, None, 2:] * 0.5
        out = multi_scale_deformable_attn(v, value_shapes, loc, weights)
        return nn.Dense(self.d_model, name="output_proj")(out)


class DeformableTransformerDecoderLayer(nn.Module):
    """Self-attn + cross deformable attn + FFN (reference transformer.py:312)."""

    d_model: int = 256
    n_heads: int = 8
    d_ffn: int = 1024
    n_levels: int = 4
    n_points: int = 4

    @nn.compact
    def __call__(self, embed, refer_bbox, feats, shapes, query_pos=None,
                 train: bool = False, attn_mask=None):
        q = k = embed if query_pos is None else embed + query_pos
        # attn_mask: (Q, Q) bool, True = ATTEND (flax convention; the torch
        # reference passes the inverse, True = blocked — CDN group isolation).
        mask = None if attn_mask is None else attn_mask[None, None, :, :]
        a = nn.MultiHeadDotProductAttention(self.n_heads, qkv_features=self.d_model,
                                            name="self_attn")(q, k, embed, mask=mask)
        embed = nn.LayerNorm(name="norm1")(embed + a)
        c = MSDeformAttn(self.d_model, self.n_levels, self.n_heads, self.n_points,
                         name="cross_attn")(
            embed if query_pos is None else embed + query_pos,
            refer_bbox[:, :, None, :].repeat(self.n_levels, 2)
            if refer_bbox.ndim == 3 else refer_bbox,
            feats, shapes)
        embed = nn.LayerNorm(name="norm2")(embed + c)
        f = nn.Dense(self.d_ffn, name="linear1")(embed)
        f = nn.Dense(self.d_model, name="linear2")(jax.nn.relu(f))
        return nn.LayerNorm(name="norm3")(embed + f)


class DeformableTransformerDecoder(nn.Module):
    """Stack of deformable decoder layers with iterative box refinement
    (reference transformer.py:374)."""

    hidden_dim: int
    num_layers: int = 6
    n_heads: int = 8
    n_levels: int = 4
    n_points: int = 4

    @nn.compact
    def __call__(self, embed, refer_bbox, feats, shapes, bbox_head, score_head,
                 pos_mlp, train: bool = False):
        output = embed
        dec_bboxes, dec_cls = [], []
        last_refined = None
        for i in range(self.num_layers):
            refer_sig = jax.nn.sigmoid(refer_bbox) if i == 0 else refer_bbox
            output = DeformableTransformerDecoderLayer(
                self.hidden_dim, self.n_heads, n_levels=self.n_levels,
                n_points=self.n_points, name=f"layer{i}")(
                output, refer_sig, feats, shapes,
                query_pos=pos_mlp(refer_sig), train=train)
            bbox_delta = bbox_head[i](output)
            refined = jax.nn.sigmoid(bbox_delta + inverse_sigmoid(refer_sig))
            dec_cls.append(score_head[i](output))
            dec_bboxes.append(refined)
            refer_bbox = jax.lax.stop_gradient(refined) if train else refined
            last_refined = refined
        return jnp.stack(dec_bboxes), jnp.stack(dec_cls)
