"""SAM2 image-segmentation stack (NHWC, flax.linen).

TPU-native re-expression of the reference SAM2 image path:
- Hiera trunk (reference modules/encoders.py:645, blocks.py:503-697
  MultiScaleAttention/MultiScaleBlock): hierarchical ViT with window
  attention and query-pooling at stage boundaries.
- FpnNeck (encoders.py:501): lateral 1x1s + nearest top-down fusion on the
  two coarsest levels, scalp=1 drops stride-32.
- SAM2MaskDecoder (decoders.py:168): obj-score token, sigmoid IoU head,
  high-res skip connections into the upscaler, dynamic single-mask
  fallback via stability.
- SAM2Model host object exposing the same encode/decode API as
  model.SAMModel, so predict.SAMPredictor drives both families.

The video memory stack lives in memory.py (RoPE memory attention, memory
encoder, fixed-shape bank) and video.py (SAM2VideoPredictor); this module is
the per-image path — num_maskmem=0 semantics (reference sam.py:628-632 skips
memory fusion in that case; the no-memory embedding is still added,
sam.py:759-761).

Hiera's background positional embedding is resized with a numpy
re-implementation of torch's bicubic (a=-0.75, align_corners=False) so
converted checkpoints are bit-faithful — jax.image.resize uses the
Keys a=-0.5 kernel, which is NOT the same interpolation.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolo_sod_tpu.models.sam.modules import (MLP, LayerNorm2d, MLPBlock,
                                             PromptEncoder, TwoWayTransformer)


def torch_bicubic_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) row-stochastic matrix reproducing torch's 1-D bicubic
    resize (cubic convolution a=-0.75, align_corners=False, edge clamp)."""
    a = -0.75

    def k(t):
        t = abs(t)
        if t <= 1:
            return (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1
        if t < 2:
            return a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a
        return 0.0

    W = np.zeros((dst, src), np.float64)
    scale = src / dst
    for i in range(dst):
        x = (i + 0.5) * scale - 0.5
        x0 = math.floor(x)
        for j in range(x0 - 1, x0 + 3):
            W[i, min(max(j, 0), src - 1)] += k(x - j)
    return W.astype(np.float32)


def _pool2(x: jax.Array, stride: Tuple[int, int]) -> jax.Array:
    """Max-pool an NHWC map by `stride` (reference do_pool, MaxPool2d)."""
    return nn.max_pool(x, window_shape=stride, strides=stride)


class MultiScaleAttention(nn.Module):
    """Window attention with optional query pooling (reference blocks.py:503)."""

    dim: int
    dim_out: int
    num_heads: int
    q_stride: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        hd = self.dim_out // self.num_heads
        qkv = nn.Dense(self.dim_out * 3, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]   # (B, HW, nh, hd)
        if self.q_stride:
            q = _pool2(q.reshape(B, H, W, -1), self.q_stride)
            H, W = q.shape[1:3]
            q = q.reshape(B, H * W, self.num_heads, hd)
        attn = jax.nn.softmax(
            jnp.einsum("bqnc,bknc->bnqk", q * (hd ** -0.5), k), axis=-1)
        out = jnp.einsum("bnqk,bknc->bqnc", attn, v).reshape(B, H, W, -1)
        return nn.Dense(self.dim_out, name="proj")(out)


class MultiScaleBlock(nn.Module):
    """Hiera block: windowed multiscale attention + MLP, with dim growth and
    query pooling at stage boundaries (reference blocks.py:583)."""

    dim: int
    dim_out: int
    num_heads: int
    mlp_ratio: float = 4.0
    q_stride: Optional[Tuple[int, int]] = None
    window_size: int = 0

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.dim != self.dim_out:
            shortcut = nn.Dense(self.dim_out, name="proj")(x)
            if self.q_stride:
                shortcut = _pool2(shortcut, self.q_stride)
        ws = self.window_size
        if ws > 0:
            ph, pw = (-H) % ws, (-W) % ws
            Hp, Wp = H + ph, W + pw
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, self.dim) \
                 .transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, self.dim)
        x = MultiScaleAttention(self.dim, self.dim_out, self.num_heads,
                                self.q_stride, name="attn")(x)
        if self.q_stride:
            ws = ws // self.q_stride[0]
            H, W = shortcut.shape[1:3]
            Hp, Wp = H + (-H) % ws if ws else H, W + (-W) % ws if ws else W
        if self.window_size > 0:
            nW = x.shape[0] // B
            nh, nw = Hp // ws, Wp // ws
            x = x.reshape(B, nh, nw, ws, ws, self.dim_out) \
                 .transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, self.dim_out)
            x = x[:, :H, :W]
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(self.dim_out * self.mlp_ratio), name="mlp_0")(y)
        y = jax.nn.gelu(y, approximate=False)
        return x + nn.Dense(self.dim_out, name="mlp_1")(y)


class Hiera(nn.Module):
    """Hierarchical trunk (reference encoders.py:645). Returns the 4 stage
    outputs high-res → low-res as NHWC maps."""

    embed_dim: int = 96
    num_heads: int = 1
    stages: Tuple[int, ...] = (2, 3, 16, 3)
    q_stride: Tuple[int, int] = (2, 2)
    dim_mul: float = 2.0
    head_mul: float = 2.0
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (14, 14)
    window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    global_att_blocks: Tuple[int, ...] = (12, 16, 20)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.embed_dim, (7, 7), strides=(4, 4),
                    padding=[(3, 3), (3, 3)], name="patch_embed")(x)
        B, H, W, _ = x.shape
        # windowed positional embedding: bicubic-resized background + tiled
        # window embedding (reference :770-778)
        bkg = self.param("pos_embed", nn.initializers.zeros,
                         (1, *self.window_pos_embed_bkg_spatial_size,
                          self.embed_dim))
        win = self.param("pos_embed_window", nn.initializers.zeros,
                         (1, self.window_spec[0], self.window_spec[0],
                          self.embed_dim))
        Wh = jnp.asarray(torch_bicubic_matrix(bkg.shape[1], H))
        Ww = jnp.asarray(torch_bicubic_matrix(bkg.shape[2], W))
        pos = jnp.einsum("hH,bHWc,wW->bhwc", Wh, bkg, Ww)
        pos = pos + jnp.tile(win, (1, H // win.shape[1], W // win.shape[2], 1))
        x = x + pos

        depth = sum(self.stages)
        stage_ends = [sum(self.stages[:i]) - 1
                      for i in range(1, len(self.stages) + 1)]
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]]
        dim, heads, cur_stage = self.embed_dim, self.num_heads, 1
        outputs = []
        for i in range(depth):
            dim_out = dim
            window_size = self.window_spec[cur_stage - 1]
            if i in self.global_att_blocks:
                window_size = 0
            if i - 1 in stage_ends:
                dim_out = int(dim * self.dim_mul)
                heads = int(heads * self.head_mul)
                cur_stage += 1
            x = MultiScaleBlock(
                dim, dim_out, heads,
                q_stride=self.q_stride if i in q_pool_blocks else None,
                window_size=window_size, name=f"blocks_{i}")(x)
            dim = dim_out
            if i in stage_ends:
                outputs.append(x)
        return outputs


class FpnNeck(nn.Module):
    """Lateral 1x1 convs + nearest top-down fusion into the two coarsest
    levels (reference encoders.py:501, fpn_top_down_levels=[2, 3],
    fuse_type='sum'). Input high→low res; output same order, all d_model."""

    d_model: int = 256
    num_levels: int = 4
    top_down_levels: Tuple[int, ...] = (2, 3)

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array]):
        n = self.num_levels - 1
        out = [None] * self.num_levels
        prev = None
        for i in range(n, -1, -1):
            lateral = nn.Conv(self.d_model, (1, 1),
                              name=f"convs_{n - i}")(xs[i])
            if i in self.top_down_levels and prev is not None:
                B, h, w, C = prev.shape
                td = jax.image.resize(prev.astype(jnp.float32),
                                      (B, h * 2, w * 2, C), method="nearest")
                prev = lateral + td.astype(lateral.dtype)
            else:
                prev = lateral
            out[i] = prev
        return out


class SAM2MaskDecoder(nn.Module):
    """Mask decoder with obj-score token + high-res skips
    (reference decoders.py:168)."""

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    stability_delta: float = 0.05
    stability_thresh: float = 0.98

    @property
    def num_mask_tokens(self):
        return self.num_multimask_outputs + 1

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 high_res_features, multimask_output: bool = False,
                 return_token: bool = False):
        D = self.transformer_dim
        obj_token = self.param("obj_score_token",
                               nn.initializers.normal(1.0), (1, D))
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, D))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (self.num_mask_tokens, D))
        B = sparse_prompt.shape[0]
        out_tokens = jnp.broadcast_to(
            jnp.concatenate([obj_token, iou_token, mask_tokens], 0)[None],
            (B, 2 + self.num_mask_tokens, D))
        tokens = jnp.concatenate([out_tokens, sparse_prompt], axis=1)
        src = jnp.broadcast_to(image_embeddings,
                               (B, *image_embeddings.shape[1:])) + dense_prompt
        # SAM2's two-way transformer matches SAM1's except the block MLP is
        # the 2-layer reference MLP class with ReLU — numerically identical
        # to MLPBlock(act='relu') (blocks.py:264-283).
        hs, keys = TwoWayTransformer(2, D, 8, 2048, name="transformer")(
            src, image_pe, tokens)
        obj_out, iou_out = hs[:, 0], hs[:, 1]
        mask_out = hs[:, 2:2 + self.num_mask_tokens]

        _, H, W, _ = src.shape
        up = keys.reshape(B, H, W, D)
        feat_s0, feat_s1 = high_res_features        # pre-projected D/8, D/4
        up = nn.ConvTranspose(D // 4, (2, 2), strides=(2, 2),
                              name="upscale_0")(up) + feat_s1
        up = jax.nn.gelu(LayerNorm2d(name="upscale_ln")(up), approximate=False)
        up = nn.ConvTranspose(D // 8, (2, 2), strides=(2, 2),
                              name="upscale_1")(up) + feat_s0
        up = jax.nn.gelu(up, approximate=False)

        hyper = jnp.stack(
            [MLP(D // 8, D, name=f"hyper_{i}")(mask_out[:, i])
             for i in range(self.num_mask_tokens)], axis=1)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)
        iou_pred = MLP(self.num_mask_tokens, self.iou_head_hidden_dim,
                       self.iou_head_depth, sigmoid=True,
                       name="iou_head")(iou_out)
        obj_logits = MLP(1, D, name="obj_head")(obj_out)

        if multimask_output:
            if return_token:
                # token of the best-IoU mask: the video path's obj_ptr source
                # (reference sam.py:507-511 sam_output_token selection)
                bi = jnp.argmax(iou_pred[:, 1:], axis=-1) + 1
                tok = jnp.take_along_axis(mask_out, bi[:, None, None], 1)[:, 0]
                return masks[:, 1:], iou_pred[:, 1:], obj_logits, tok
            return masks[:, 1:], iou_pred[:, 1:], obj_logits
        # dynamic single-mask fallback: if the single-mask token is unstable,
        # take the best multimask candidate (reference :456-497)
        def stability(logits):
            flat = logits.reshape(*logits.shape[:-2], -1)
            ai = (flat > self.stability_delta).sum(-1).astype(jnp.float32)
            au = (flat > -self.stability_delta).sum(-1).astype(jnp.float32)
            return jnp.where(au > 0, ai / au, 1.0)

        best = jnp.argmax(iou_pred[:, 1:], axis=-1) + 1       # (B,)
        bm = jnp.take_along_axis(masks, best[:, None, None, None], 1)
        bi = jnp.take_along_axis(iou_pred, best[:, None], 1)
        stable = (stability(masks[:, 0]) >= self.stability_thresh)[:, None]
        out_m = jnp.where(stable[..., None, None], masks[:, 0:1], bm)
        out_i = jnp.where(stable, iou_pred[:, 0:1], bi)
        if return_token:
            bt = jnp.take_along_axis(mask_out, best[:, None, None], 1)[:, 0]
            tok = jnp.where(stable, mask_out[:, 0], bt)
            return out_m, out_i, obj_logits, tok
        return out_m, out_i, obj_logits


class SAM2Model:
    """Host-side SAM2 image model with the SAMModel encode/decode API
    (reference sam.py SAM2Model, image path: num_maskmem=0 semantics +
    directly-added no-memory embedding)."""

    CONFIGS = {  # reference build.py:68-118
        "sam2_t": dict(embed_dim=96, stages=(1, 2, 7, 2), num_heads=1,
                       global_att_blocks=(5, 7, 9), window_spec=(8, 4, 14, 7)),
        "sam2_s": dict(embed_dim=96, stages=(1, 2, 11, 2), num_heads=1,
                       global_att_blocks=(7, 10, 13), window_spec=(8, 4, 14, 7)),
        "sam2_b": dict(embed_dim=112, stages=(2, 3, 16, 3), num_heads=2,
                       global_att_blocks=(12, 16, 20), window_spec=(8, 4, 14, 7)),
        "sam2_l": dict(embed_dim=144, stages=(2, 6, 36, 4), num_heads=2,
                       global_att_blocks=(23, 33, 43), window_spec=(8, 4, 16, 8)),
    }

    def __init__(self, variant: str = "sam2_t", img_size: int = 1024,
                 **overrides):
        cfg = dict(self.CONFIGS[variant]) if variant in self.CONFIGS else {}
        cfg.update(overrides)
        self.img_size = img_size
        self.embed_size = img_size // 16
        self.prompt_embed_dim = 256
        self.trunk = Hiera(
            embed_dim=cfg.get("embed_dim", 96),
            num_heads=cfg.get("num_heads", 1),
            stages=tuple(cfg.get("stages", (1, 2, 7, 2))),
            global_att_blocks=tuple(cfg.get("global_att_blocks", (5, 7, 9))),
            window_spec=tuple(cfg.get("window_spec", (8, 4, 14, 7))),
            window_pos_embed_bkg_spatial_size=tuple(
                cfg.get("window_pos_embed_bkg_spatial_size", (7, 7))))
        self.neck = FpnNeck(d_model=256)
        self.prompt_encoder = PromptEncoder(
            embed_dim=256,
            image_embedding_size=(self.embed_size, self.embed_size),
            input_image_size=(img_size, img_size))
        self.mask_decoder = SAM2MaskDecoder()
        self._skips = self._Skips()
        self.variables = None
        self.task = "segment"
        self.names = {0: "object"}
        self._jit_cache: dict = {}

    # high-res skip projections (reference forward_image precomputes
    # conv_s0/conv_s1 on the fpn levels, sam.py:598-602)
    class _Skips(nn.Module):
        @nn.compact
        def __call__(self, f0, f1):
            return (nn.Conv(32, (1, 1), name="conv_s0")(f0),
                    nn.Conv(64, (1, 1), name="conv_s1")(f1))

    def init(self, rng: Optional[jax.Array] = None):
        rng = jax.random.PRNGKey(0) if rng is None else rng
        r1, r2, r3, r4, r5, r6 = jax.random.split(rng, 6)
        S = self.img_size
        dummy = jnp.zeros((1, S, S, 3), jnp.float32)
        # jit the init/apply traces: eager flax dispatch of the Hiera trunk
        # op-by-op on the host takes minutes at 1024^2 on CPU.
        trunk_vars = jax.jit(self.trunk.init)(r1, dummy)
        feats = jax.jit(self.trunk.apply)(trunk_vars, dummy)
        neck_vars = jax.jit(self.neck.init)(r2, feats)
        fpn = jax.jit(self.neck.apply)(neck_vars, feats)
        skip_vars = self._skips.init(r3, fpn[0], fpn[1])
        pts = jnp.zeros((1, 2, 2), jnp.float32)
        lbl = jnp.zeros((1, 2), jnp.int32)
        pe_vars = jax.jit(self.prompt_encoder.init)(r4, pts, lbl)
        sparse, dense = self.prompt_encoder.apply(pe_vars, pts, lbl)
        img_pe = self.prompt_encoder.apply(pe_vars, method="get_dense_pe")
        s0, s1 = self._skips.apply(skip_vars, fpn[0], fpn[1])
        no_mem = jax.random.normal(r5, (1, 1, 256)) * 0.02
        dec_vars = jax.jit(self.mask_decoder.init)(
            r6, fpn[2], img_pe, sparse, dense, (s0, s1))
        self.variables = {"trunk": trunk_vars, "neck": neck_vars,
                          "skips": skip_vars, "prompt": pe_vars,
                          "decoder": dec_vars,
                          "no_mem_embed": no_mem}
        return self.variables

    def num_params(self) -> int:
        if self.variables is None:
            self.init()
        return int(sum(np.prod(l.shape) for l in
                       jax.tree_util.tree_leaves(self.variables)))

    def preprocess_np(self, img: np.ndarray):
        """SAM2 squashes to a square (reference SAM2Predictor letterboxes
        with center=False, scaleup to the square): resize-longest + pad
        like SAM1 keeps the predictor shared and the geometry identical."""
        from yolo_sod_tpu.models.sam.model import SAMModel

        return SAMModel.preprocess_np(self, img)

    def encode_image(self, variables, im):
        """(B,S,S,3) → dict(image_embed (B,s,s,256) with no-mem embed added,
        high_res_feats pre-projected to D/8 and D/4)."""
        key = ("enc", im.shape)
        if key not in self._jit_cache:
            def fn(v, x):
                feats = self.trunk.apply(v["trunk"], x)
                fpn = self.neck.apply(v["neck"], feats)      # scalp=1 → use 0..2
                s0, s1 = self._skips.apply(v["skips"], fpn[0], fpn[1])
                embed = fpn[2] + v["no_mem_embed"].reshape(1, 1, 1, -1)
                return {"image_embed": embed, "high_res_feats": (s0, s1)}
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key](variables, im)

    def _raw_decode(self, variables, features, points, labels,
                    multimask_output: bool = False):
        """Pure prompt→(masks, iou) fn, jit-wrapped by decode() and by the
        predictor's everything-mode chunk graph."""
        sparse, dense = self.prompt_encoder.apply(variables["prompt"],
                                                  points, labels)
        img_pe = self.prompt_encoder.apply(variables["prompt"],
                                           method="get_dense_pe")
        m, iou, _obj = self.mask_decoder.apply(
            variables["decoder"], features["image_embed"], img_pe, sparse,
            dense, features["high_res_feats"],
            multimask_output=multimask_output)
        return m, iou

    def decode(self, variables, features, points, labels, masks=None,
               multimask_output: bool = False):
        key = ("dec", points.shape, multimask_output)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda v, f, p, l: self._raw_decode(
                    v, f, p, l, multimask_output=multimask_output))
        return self._jit_cache[key](variables, features, points, labels)

    def info(self):
        return 0, self.num_params()
