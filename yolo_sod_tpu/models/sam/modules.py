"""SAM core modules (NHWC, flax.linen).

TPU-native re-expression of reference models/sam/modules/:
- ImageEncoderViT (encoders.py:23): ViT with decomposed relative-position
  attention and windowed blocks; all window math is static-shape reshapes.
- PromptEncoder (encoders.py:165): random-Fourier positional encoding +
  per-label point embeddings. Here the sparse prompt set is a SINGLE
  (B, P, 2)+(B, P) labels tensor — boxes are their two corner points with
  labels 2/3, padding uses label -1 — which is exactly the reference's own
  embedding algebra (encoders.py:283-300) collapsed into one static-shape
  gather: TPU-friendly (no per-prompt-type branches) and bit-equal.
- TwoWayTransformer / MaskDecoder (transformer.py:12, decoders.py:6).

Everything is jit-compiled with static shapes; the (HW)x(HW) global
attention at 1024² input is 4096 tokens — MXU-shaped batched matmuls.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class MLPBlock(nn.Module):
    """Linear → act → Linear (reference nn/modules MLPBlock). The ViT encoder
    uses GELU; the two-way transformer uses ReLU (reference transformer.py
    activation default)."""

    dim: int
    mlp_dim: int
    act: str = "gelu"

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.mlp_dim, name="lin1")(x)
        x = jax.nn.relu(x) if self.act == "relu" \
            else jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, name="lin2")(x)


class MLP(nn.Module):
    """n-layer ReLU MLP (reference nn/modules MLP) — hypernetwork / IoU head."""

    out_dim: int
    hidden_dim: int
    num_layers: int = 3
    sigmoid: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = jax.nn.relu(nn.Dense(self.hidden_dim, name=f"layers_{i}")(x))
        x = nn.Dense(self.out_dim, name=f"layers_{self.num_layers - 1}")(x)
        return jax.nn.sigmoid(x) if self.sigmoid else x


class LayerNorm2d(nn.Module):
    """Channel-only LayerNorm on an NHWC map (reference nn/modules LayerNorm2d)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        u = x.mean(-1, keepdims=True)
        s = jnp.square(x - u).mean(-1, keepdims=True)
        x = (x - u) / jnp.sqrt(s + self.eps)
        w = self.param("weight", nn.initializers.ones, (C,))
        b = self.param("bias", nn.initializers.zeros, (C,))
        return x * w + b


def _rel_coords(q_size: int, k_size: int) -> np.ndarray:
    """Static (q, k) index table into a (2*max-1,) relative-position array
    (reference modules/utils.py:196 get_rel_pos index math)."""
    q = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    return (q - k + (k_size - 1) * max(q_size / k_size, 1.0)).astype(np.int32)


class REAttention(nn.Module):
    """Multi-head attention with decomposed relative positions
    (reference blocks.py REAttention + utils.add_decomposed_rel_pos).

    Input (B, H, W, C) with H, W static; the rel-pos tables index through a
    trace-time-constant coordinate table, so the gather compiles to a static
    slice pattern.
    """

    dim: int
    num_heads: int
    input_size: Tuple[int, int]
    qkv_bias: bool = True
    use_rel_pos: bool = True

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))  # (B,nh,HW,hd)
        attn = jnp.einsum("bnqc,bnkc->bnqk", q * (hd ** -0.5), k)
        if self.use_rel_pos:
            rh = self.param("rel_pos_h", nn.initializers.zeros,
                            (2 * self.input_size[0] - 1, hd))
            rw = self.param("rel_pos_w", nn.initializers.zeros,
                            (2 * self.input_size[1] - 1, hd))
            Rh = rh[_rel_coords(H, H)]                      # (H, H, hd)
            Rw = rw[_rel_coords(W, W)]                      # (W, W, hd)
            qq = q.reshape(B, self.num_heads, H, W, hd)
            rel_h = jnp.einsum("bnhwc,hkc->bnhwk", qq, Rh)
            rel_w = jnp.einsum("bnhwc,wkc->bnhwk", qq, Rw)
            attn = (attn.reshape(B, self.num_heads, H, W, H, W)
                    + rel_h[..., :, None] + rel_w[..., None, :]
                    ).reshape(B, self.num_heads, H * W, H * W)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnqk,bnkc->bnqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class ViTBlock(nn.Module):
    """ViT block with optional window attention (reference blocks.py:877)."""

    dim: int
    num_heads: int
    input_size: Tuple[int, int]
    mlp_ratio: float = 4.0
    window_size: int = 0              # 0 = global attention
    use_rel_pos: bool = True

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        ws = self.window_size
        if ws > 0:
            ph, pw = (-H) % ws, (-W) % ws
            Hp, Wp = H + ph, W + pw
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C) \
                 .transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
            attn_size = (ws, ws)
        else:
            attn_size = (H, W)
        x = REAttention(self.dim, self.num_heads, attn_size,
                        use_rel_pos=self.use_rel_pos, name="attn")(x)
        if ws > 0:
            x = x.reshape(B, Hp // ws, Wp // ws, ws, ws, C) \
                 .transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
            x = x[:, :H, :W]
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        return x + MLPBlock(self.dim, int(self.dim * self.mlp_ratio),
                            name="mlp")(y)


class ImageEncoderViT(nn.Module):
    """SAM's ViT image encoder (reference encoders.py:23).

    (B, S, S, 3) → (B, S/16, S/16, out_chans). The absolute positional
    embedding is sized for 1024² pretraining and statically resized when the
    model is built at another resolution (reference :153-158 interpolates at
    runtime; here the resize folds into trace-time constants).
    """

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = ()
    use_rel_pos: bool = True
    pretrain_size: int = 1024

    @nn.compact
    def __call__(self, x):
        side = self.img_size // self.patch_size
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), padding="VALID",
                    name="patch_embed")(x)                   # (B, side, side, C)
        pe_side = self.pretrain_size // self.patch_size
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, pe_side, pe_side, self.embed_dim))
        if pe_side != side:
            pos = jax.image.resize(pos, (1, side, side, self.embed_dim),
                                   method="bilinear")
        x = x + pos
        for i in range(self.depth):
            x = ViTBlock(self.embed_dim, self.num_heads, (side, side),
                         mlp_ratio=self.mlp_ratio,
                         window_size=0 if i in self.global_attn_indexes
                         else self.window_size,
                         use_rel_pos=self.use_rel_pos, name=f"blocks_{i}")(x)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck_0")(x)
        x = LayerNorm2d(name="neck_1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False,
                    name="neck_2")(x)
        return LayerNorm2d(name="neck_3")(x)


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier positional encoding (reference blocks.py:813). The
    gaussian projection matrix is a parameter so checkpoint conversion
    carries the reference's buffer verbatim."""

    num_pos_feats: int = 128

    def setup(self):
        self.gaussian_matrix = self.param(
            "gaussian_matrix", nn.initializers.normal(1.0),
            (2, self.num_pos_feats))

    def pe(self, coords):
        """coords in [0,1]² , shape (..., 2) → (..., 2*num_pos_feats)."""
        c = (2 * coords - 1) @ self.gaussian_matrix * (2 * np.pi)
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def __call__(self, size: Tuple[int, int]):
        """Dense grid encoding → (H, W, C)."""
        h, w = size
        gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        coords = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), -1)  # (h, w, 2)
        return self.pe(coords)

    def with_coords(self, coords, image_size: Tuple[int, int]):
        """Pixel coords (..., 2) xy → encoding."""
        c = coords / jnp.array([image_size[1], image_size[0]], coords.dtype)
        return self.pe(c)


class PromptEncoder(nn.Module):
    """Sparse (points/boxes) + dense (mask) prompt embeddings
    (reference encoders.py:165).

    The static-shape contract: `points` (B, P, 2) pixel xy with `labels`
    (B, P) in {-1: pad, 0: neg, 1: pos, 2: box-TL, 3: box-BR}. The label
    gathers one of 5 learned embeddings — identical algebra to the
    reference's masked adds (encoders.py:283-289), one fused gather here.
    """

    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        # rows: [not_a_point(-1), neg(0), pos(1), box_tl(2), box_br(3)]
        self.point_embed = self.param(
            "point_embeddings", nn.initializers.normal(1.0),
            (5, self.embed_dim))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim))
        self.mask_convs = [nn.Conv(self.mask_in_chans // 4, (2, 2),
                                   strides=(2, 2), name="mask_down_0"),
                           nn.Conv(self.mask_in_chans, (2, 2), strides=(2, 2),
                                   name="mask_down_1"),
                           nn.Conv(self.embed_dim, (1, 1), name="mask_down_2")]
        self.mask_norms = [LayerNorm2d(name="mask_ln_0"),
                           LayerNorm2d(name="mask_ln_1")]

    def get_dense_pe(self):
        return self.pe_layer(self.image_embedding_size)[None]   # (1, H, W, C)

    def __call__(self, points, labels, masks=None):
        # Sparse: positional encoding (+0.5 pixel-center shift) + label embed;
        # label -1 zeroes the positional part (reference :283-285).
        pe = self.pe_layer.with_coords(points + 0.5, self.input_image_size)
        pe = jnp.where((labels == -1)[..., None], 0.0, pe)
        sparse = pe + self.point_embed[labels + 1]              # (B, P, C)
        # Dense: mask downscaling or the learned no-mask embedding.
        h, w = self.image_embedding_size
        if masks is None:
            dense = jnp.broadcast_to(
                self.no_mask_embed.reshape(1, 1, 1, -1),
                (points.shape[0], h, w, self.embed_dim))
        else:
            x = masks[..., None]                                # (B, 4h, 4w, 1)
            x = jax.nn.gelu(self.mask_norms[0](self.mask_convs[0](x)),
                            approximate=False)
            x = jax.nn.gelu(self.mask_norms[1](self.mask_convs[1](x)),
                            approximate=False)
            dense = self.mask_convs[2](x)
        return sparse, dense


class Attention(nn.Module):
    """Projected multi-head attention with internal downsampling
    (reference transformer.py Attention)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d = self.embedding_dim // self.downsample_rate
        hd = d // self.num_heads
        q = nn.Dense(d, name="q_proj")(q)
        k = nn.Dense(d, name="k_proj")(k)
        v = nn.Dense(d, name="v_proj")(v)

        def split(x):
            B, N, _ = x.shape
            return x.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = jax.nn.softmax(
            jnp.einsum("bnqc,bnkc->bnqk", q, k) / np.sqrt(hd), axis=-1)
        out = jnp.einsum("bnqk,bnkc->bnqc", attn, v)
        B, _, N, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, N, d)
        return nn.Dense(self.embedding_dim, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    """Sparse↔dense cross-attention block (reference transformer.py:146)."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = Attention(self.embedding_dim, self.num_heads,
                                name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + Attention(self.embedding_dim, self.num_heads,
                                          name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries)
        q, k = queries + query_pe, keys + key_pe
        queries = queries + Attention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries)
        queries = queries + MLPBlock(self.embedding_dim, self.mlp_dim,
                                     act="relu", name="mlp")(queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries)
        q, k = queries + query_pe, keys + key_pe
        keys = keys + Attention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """Mask-decoder transformer (reference transformer.py:12)."""

    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe (B, H, W, C); point_embedding (B, N, C)."""
        B, H, W, C = image_embedding.shape
        keys = image_embedding.reshape(B, H * W, C)
        key_pe = image_pe.reshape(-1, H * W, C)
        key_pe = jnp.broadcast_to(key_pe, keys.shape)
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim, self.num_heads, self.mlp_dim,
                self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0), name=f"layers_{i}")(
                    queries, keys, point_embedding, key_pe)
        q, k = queries + point_embedding, keys + key_pe
        queries = queries + Attention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            name="final_attn_token_to_image")(q, k, keys)
        return nn.LayerNorm(epsilon=1e-5, name="norm_final_attn")(queries), keys


class MaskDecoder(nn.Module):
    """Mask + IoU prediction from image/prompt embeddings
    (reference decoders.py:6)."""

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    transformer_depth: int = 2
    transformer_mlp_dim: int = 2048
    transformer_num_heads: int = 8

    @property
    def num_mask_tokens(self):
        return self.num_multimask_outputs + 1

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 multimask_output: bool = False):
        """image_embeddings (1 or B, H, W, C); sparse (B, P, C);
        dense (B, H, W, C) → masks (B, m, 4H, 4W), iou (B, m)."""
        D = self.transformer_dim
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, D))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (self.num_mask_tokens, D))
        B = sparse_prompt.shape[0]
        out_tokens = jnp.broadcast_to(
            jnp.concatenate([iou_token, mask_tokens], 0)[None],
            (B, 1 + self.num_mask_tokens, D))
        tokens = jnp.concatenate([out_tokens, sparse_prompt], axis=1)

        src = jnp.broadcast_to(image_embeddings,
                               (B, *image_embeddings.shape[1:])) + dense_prompt
        hs, keys = TwoWayTransformer(
            self.transformer_depth, D, self.transformer_num_heads,
            self.transformer_mlp_dim, name="transformer")(src, image_pe, tokens)
        iou_out = hs[:, 0]
        mask_out = hs[:, 1:1 + self.num_mask_tokens]

        _, H, W, _ = src.shape
        up = keys.reshape(B, H, W, D)
        up = nn.ConvTranspose(D // 4, (2, 2), strides=(2, 2),
                              name="upscale_0")(up)
        up = jax.nn.gelu(LayerNorm2d(name="upscale_ln")(up), approximate=False)
        up = nn.ConvTranspose(D // 8, (2, 2), strides=(2, 2),
                              name="upscale_1")(up)
        up = jax.nn.gelu(up, approximate=False)               # (B, 4H, 4W, D/8)

        hyper = jnp.stack(
            [MLP(D // 8, D, name=f"hyper_{i}")(mask_out[:, i])
             for i in range(self.num_mask_tokens)], axis=1)   # (B, m, D/8)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)
        iou_pred = MLP(self.num_mask_tokens, self.iou_head_hidden_dim,
                       self.iou_head_depth, name="iou_head")(iou_out)
        sl = slice(1, None) if multimask_output else slice(0, 1)
        return masks[:, sl], iou_pred[:, sl]
