"""RTDETRDecoder head (reference nn/modules/head.py:361 RTDETRDecoder).

Real-time DETR detection head over P3-P5 features: per-level input
projections → flattened token memory → encoder scoring + top-nq query
selection against grid anchor priors → deformable-attention decoder with
per-layer iterative box refinement. Inference emits (B, nq, 4+nc) decoded
normalized boxes + class scores directly — no NMS (the natural TPU head:
fixed shapes end to end).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_sod_tpu.nn.modules.transformer import (
    MLP,
    DeformableTransformerDecoderLayer,
    inverse_sigmoid,
)


class RTDETRDecoder(nn.Module):
    nc: int = 80
    ch: Tuple[int, ...] = (512, 1024, 2048)
    hd: int = 256           # hidden dim
    nq: int = 300           # queries
    ndl: int = 6            # decoder layers
    nh: int = 8
    ndp: int = 4            # decoder points
    strides: Tuple[int, ...] = ()   # accepted for head-parity; unused

    def _anchors(self, shapes, grid_size: float = 0.05, eps: float = 1e-2):
        """Normalized grid anchors (cx, cy, w, h) per level + validity."""
        anchors = []
        for lvl, (h, w) in enumerate(shapes):
            sy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            sx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
            xy = jnp.stack([gx, gy], -1).reshape(h * w, 2)
            wh = jnp.full((h * w, 2), grid_size * (2.0 ** lvl), jnp.float32)
            anchors.append(jnp.concatenate([xy, wh], -1))
        anchors = jnp.concatenate(anchors, 0)[None]          # (1, A, 4)
        valid = ((anchors > eps) & (anchors < 1 - eps)).all(-1, keepdims=True)
        anchors = jnp.where(valid, inverse_sigmoid(anchors), jnp.inf)
        return anchors, valid.astype(jnp.float32)

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False,
                 active_mask=None, dn_cls=None, dn_bbox=None, attn_mask=None):
        """dn_cls (B, D) int32 noised GT class per CDN slot (-1 = empty pad),
        dn_bbox (B, D, 4) logit-space noised boxes, attn_mask (D+nq, D+nq)
        bool with True = ATTEND (contrastive-denoising groups, reference
        head.py RTDETRDecoder.forward + models/utils/ops.py get_cdn_group).
        All three must be passed together; shapes are static (fixed CDN
        capacity D), so the train step compiles once."""
        hd, nq, nc = self.hd, self.nq, self.nc
        # CDN class embedding (reference: nn.Embedding(nc, hd)); created
        # unconditionally so the param tree (and converted checkpoints) match
        # the reference whether or not denoising is active.
        dn_class_embed = self.param("denoising_class_embed",
                                    nn.initializers.normal(1.0), (nc, self.hd))
        # 1) Project + flatten multi-level features into one token memory.
        feats, shapes = [], []
        for i, x in enumerate(xs):
            f = nn.Conv(hd, (1, 1), use_bias=False, name=f"input_proj_{i}_conv")(x)
            f = nn.BatchNorm(use_running_average=not train,
                             name=f"input_proj_{i}_bn")(f)
            B, H, W, _ = f.shape
            feats.append(f.reshape(B, H * W, hd))
            shapes.append((H, W))
        memory = jnp.concatenate(feats, 1)                   # (B, A, hd)
        B, A, _ = memory.shape

        # 2) Encoder scoring + top-nq query selection.
        anchors, valid = self._anchors(shapes)
        out_mem = nn.LayerNorm(name="enc_output_norm")(
            nn.Dense(hd, name="enc_output")(memory * valid))
        enc_scores = nn.Dense(nc, name="enc_score_head",
                              bias_init=nn.initializers.constant(
                                  -math.log((1 - 0.01) / 0.01)))(out_mem)
        enc_deltas = MLP(hd, 4, 3, name="enc_bbox_head")(out_mem)
        enc_unact = enc_deltas + anchors                      # logit-space boxes

        nq = min(nq, A)   # tiny eval shapes can have fewer tokens than queries
        topv, topi = jax.lax.top_k(enc_scores.max(-1), nq)    # (B, nq)
        refer_unact = jnp.take_along_axis(enc_unact, topi[..., None], 1)
        enc_boxes = jax.nn.sigmoid(refer_unact)
        enc_cls = jnp.take_along_axis(enc_scores, topi[..., None], 1)
        embed = jax.lax.stop_gradient(
            jnp.take_along_axis(out_mem, topi[..., None], 1)) if train else \
            jnp.take_along_axis(out_mem, topi[..., None], 1)

        # 2b) Prepend denoising queries (reference _get_decoder_input:
        # torch.cat([dn_embed, embed], 1)). Empty slots embed to zeros, the
        # same value the reference's padding_cls carries.
        if dn_cls is not None:
            dn_embed = jnp.where(
                (dn_cls >= 0)[..., None],
                dn_class_embed[jnp.clip(dn_cls, 0, nc - 1)], 0.0).astype(embed.dtype)
            embed = jnp.concatenate([dn_embed, embed], 1)
            refer_unact = jnp.concatenate(
                [dn_bbox.astype(refer_unact.dtype), refer_unact], 1)

        # 3) Deformable decoder with per-layer refinement heads.
        pos_mlp = MLP(2 * hd, hd, 2, name="query_pos_head")
        refer = jax.nn.sigmoid(refer_unact)
        dec_boxes, dec_cls = [], []
        out = embed
        last_refined = None
        for li in range(self.ndl):
            rb = refer[:, :, None, :].repeat(len(shapes), 2)  # per-level refs
            out = DeformableTransformerDecoderLayer(
                hd, self.nh, d_ffn=1024, n_levels=len(shapes), n_points=self.ndp,
                name=f"decoder_layer{li}")(out, rb, memory, shapes,
                                           query_pos=pos_mlp(refer), train=train,
                                           attn_mask=attn_mask)
            delta = MLP(hd, 4, 3, name=f"dec_bbox_head{li}")(out)
            refined = jax.nn.sigmoid(delta + inverse_sigmoid(refer))
            dec_cls.append(nn.Dense(nc, name=f"dec_score_head{li}",
                                    bias_init=nn.initializers.constant(
                                        -math.log((1 - 0.01) / 0.01)))(out))
            if train and li > 0:
                # Aux-loss boxes chain through the UNDETACHED previous
                # refinement (reference transformer.py:413-418): same values
                # as `refined` but the gradient also reaches layer li-1's
                # bbox head.
                dec_boxes.append(jax.nn.sigmoid(
                    delta + inverse_sigmoid(last_refined)))
            else:
                dec_boxes.append(refined)
            last_refined = refined
            refer = jax.lax.stop_gradient(refined) if train else refined

        if train:
            return {"dec_bboxes": jnp.stack(dec_boxes),
                    "dec_scores": jnp.stack(dec_cls),
                    "enc_bboxes": enc_boxes, "enc_scores": enc_cls}
        # Inference: (B, nq, 4 + nc) — normalized xywh + sigmoid scores.
        return jnp.concatenate([dec_boxes[-1],
                                jax.nn.sigmoid(dec_cls[-1])], -1)
