"""SAMModel: host-side composition of encoder / prompt encoder / mask decoder.

Reference models/sam/modules/sam.py SAMModel (:1-60) + build.py:122 _build_sam.
Pure-functional: three flax module trees under one `variables` dict; every
compute path is a jitted function of (variables, arrays) with static shapes.
The decode path takes a FIXED number of prompt slots P (pad with label -1 —
see modules.PromptEncoder); predictors pick P buckets so XLA compiles one
graph per bucket, not per prompt count.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_sod_tpu.models.sam.modules import (ImageEncoderViT, MaskDecoder,
                                             PromptEncoder)

PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


class SAMModel:
    """Composable SAM (reference sam.py SAMModel; build.py:122 wiring)."""

    def __init__(self, img_size: int = 1024, encoder: str = "vit_b",
                 embed_dim: Optional[int] = None, depth: Optional[int] = None,
                 num_heads: Optional[int] = None,
                 global_attn_indexes: Optional[Tuple[int, ...]] = None,
                 prompt_embed_dim: int = 256, window_size: int = 14,
                 image_encoder=None):
        cfgs = {  # reference build.py:23-54
            "vit_b": dict(embed_dim=768, depth=12, num_heads=12,
                          global_attn_indexes=(2, 5, 8, 11)),
            "vit_l": dict(embed_dim=1024, depth=24, num_heads=16,
                          global_attn_indexes=(5, 11, 17, 23)),
            "vit_h": dict(embed_dim=1280, depth=32, num_heads=16,
                          global_attn_indexes=(7, 15, 23, 31)),
        }
        self.img_size = img_size
        self.embed_size = img_size // 16
        self.prompt_embed_dim = prompt_embed_dim
        if image_encoder is not None:          # e.g. TinyViT for MobileSAM
            self.encoder = image_encoder
        else:
            c = cfgs[encoder]
            self.encoder = ImageEncoderViT(
                img_size=img_size,
                embed_dim=embed_dim or c["embed_dim"],
                depth=depth or c["depth"],
                num_heads=num_heads or c["num_heads"],
                global_attn_indexes=tuple(global_attn_indexes
                                          if global_attn_indexes is not None
                                          else c["global_attn_indexes"]),
                out_chans=prompt_embed_dim, window_size=window_size,
                pretrain_size=img_size)
        self.prompt_encoder = PromptEncoder(
            embed_dim=prompt_embed_dim,
            image_embedding_size=(self.embed_size, self.embed_size),
            input_image_size=(img_size, img_size))
        self.mask_decoder = MaskDecoder(transformer_dim=prompt_embed_dim)
        self.variables = None
        self.task = "segment"
        self.names = {0: "object"}
        self.stride = np.array([16])
        self._jit_cache: dict = {}

    # -- lifecycle -----------------------------------------------------------
    def init(self, rng: Optional[jax.Array] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r1, r2, r3 = jax.random.split(rng, 3)
        dummy_img = jnp.zeros((1, self.img_size, self.img_size, 3), jnp.float32)
        # jit each init trace: eager flax init dispatches every op on the
        # host one by one (minutes for the 1024^2 ViT encoder on CPU).
        enc_vars = jax.jit(self.encoder.init)(r1, dummy_img)
        pts = jnp.zeros((1, 2, 2), jnp.float32)
        lbl = jnp.zeros((1, 2), jnp.int32)
        pe_vars = jax.jit(self.prompt_encoder.init)(r2, pts, lbl)
        sparse, dense = self.prompt_encoder.apply(pe_vars, pts, lbl)
        img_pe = self.prompt_encoder.apply(pe_vars, method="get_dense_pe")
        feat = jnp.zeros((1, self.embed_size, self.embed_size,
                          self.prompt_embed_dim), jnp.float32)
        dec_vars = jax.jit(self.mask_decoder.init)(r3, feat, img_pe, sparse,
                                                   dense)
        self.variables = {"encoder": enc_vars, "prompt": pe_vars,
                          "decoder": dec_vars}
        return self.variables

    def num_params(self) -> int:
        if self.variables is None:
            self.init()
        return int(sum(np.prod(l.shape) for l in
                       jax.tree_util.tree_leaves(self.variables)))

    # -- compute -------------------------------------------------------------
    def preprocess_np(self, img: np.ndarray) -> tuple[np.ndarray, float]:
        """Resize longest side to img_size + bottom-right pad
        (reference predict.py:108-140 + sam.py preprocess). Returns the
        (1, S, S, 3) float input and the resize ratio."""
        import cv2

        h0, w0 = img.shape[:2]
        r = self.img_size / max(h0, w0)
        nh, nw = round(h0 * r), round(w0 * r)
        im = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        im = (im.astype(np.float32) - PIXEL_MEAN) / PIXEL_STD
        out = np.zeros((self.img_size, self.img_size, 3), np.float32)
        out[:nh, :nw] = im
        return out[None], r

    def encode_image(self, variables, im):
        """(B, S, S, 3) normalized → (B, S/16, S/16, 256)."""
        key = ("enc", im.shape)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda v, x: self.encoder.apply(v, x))
        return self._jit_cache[key](variables["encoder"], im)

    def _raw_decode(self, variables, features, points, labels, masks=None,
                    multimask_output: bool = False):
        """Pure prompt→(masks, iou) fn, jit-wrapped by decode() and by the
        predictor's everything-mode chunk graph."""
        sparse, dense = self.prompt_encoder.apply(
            variables["prompt"], points, labels, masks=masks)
        img_pe = self.prompt_encoder.apply(variables["prompt"],
                                           method="get_dense_pe")
        return self.mask_decoder.apply(
            variables["decoder"], features, img_pe, sparse, dense,
            multimask_output=multimask_output)

    def decode(self, variables, features, points, labels, masks=None,
               multimask_output: bool = False):
        """Prompt → masks. points (B, P, 2) model-input pixels, labels (B, P)
        in {-1 pad, 0 neg, 1 pos, 2/3 box corners}; masks optional
        (B, 4h, 4w) low-res logits. Returns (masks (B, m, S/4, S/4) logits,
        iou (B, m))."""
        key = ("dec", points.shape, masks is not None, multimask_output)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda v, f, p, l, m: self._raw_decode(
                    v, f, p, l, masks=m, multimask_output=multimask_output))
        return self._jit_cache[key](variables, features, points, labels, masks)

    def info(self):
        n = self.num_params()
        return 0, n
