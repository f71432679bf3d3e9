"""SAM2 video memory stack (NHWC, flax.linen) — TPU-native re-design.

Capability parity targets:
- RoPE attention: reference modules/blocks.py:405 (RoPEAttention) +
  modules/utils.py:74-123 (init_t_xy / compute_axial_cis / apply_rotary_enc).
- Memory attention: reference modules/memory_attention.py:12
  (MemoryAttentionLayer: RoPE self-attn -> RoPE cross-attn to memory ->
  ReLU FFN) and :140 (MemoryAttention: 4 layers + final norm).
- Memory encoder: reference modules/encoders.py:378 (MemoryEncoder =
  MaskDownSampler + pix_feat proj + CXBlock Fuser + out proj) with
  blocks.py MaskDownSampler/CXBlock/Fuser.
- Memory bank bookkeeping: reference modules/sam.py:620-783
  (_prepare_memory_conditioned_features).

TPU-first differences from the reference's dict-of-frames design:
- The bank is a FIXED-SHAPE pytree (slots x tokens x mem_dim) updated with
  `dynamic_update_slice` ring-buffer writes, so the per-frame track step is
  ONE compiled XLA graph — no shape-polymorphic memory list, no retraces.
- Frame selection is implicit: slot 0 holds the conditioning frame, slots
  1..num_maskmem-1 hold the last frames in a ring (temporal stride r=1, the
  reference's eval default is also effectively consecutive for r=1); empty
  slots are masked with an additive -inf attention bias instead of being
  absent.
- Object-pointer tokens live in a second fixed ring (max_obj_ptrs slots,
  each split into hidden_dim/mem_dim tokens, sam.py:744-749), excluded from
  RoPE exactly like the reference's num_k_exclude_rope.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolo_sod_tpu.models.sam.modules import LayerNorm2d

NEG_INF = -1e9


# ---------------------------------------------------------------------------
# Positional encodings
# ---------------------------------------------------------------------------

def sine_pos_2d(h: int, w: int, dim: int, temperature: float = 10000.0,
                normalize: bool = True) -> np.ndarray:
    """(h*w, dim) 2-D sine position embedding, y-half then x-half per token
    (reference blocks.py:700 PositionEmbeddingSine forward semantics:
    cumsum-normalized coords, interleaved sin/cos, cat(pos_y, pos_x))."""
    half = dim // 2
    ys, xs = np.meshgrid(np.arange(1, h + 1, dtype=np.float64),
                         np.arange(1, w + 1, dtype=np.float64), indexing="ij")
    if normalize:
        eps = 1e-6
        ys = ys / (h + eps) * (2 * math.pi)
        xs = xs / (w + eps) * (2 * math.pi)
    dim_t = np.arange(half, dtype=np.float64)
    dim_t = temperature ** (2.0 * (dim_t // 2) / half)
    py = ys[..., None] / dim_t                       # (h, w, half)
    px = xs[..., None] / dim_t
    py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])], -1
                  ).reshape(h, w, -1)
    px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])], -1
                  ).reshape(h, w, -1)
    return np.concatenate([py, px], -1).reshape(h * w, dim).astype(np.float32)


def sine_pe_1d(t: jax.Array, dim: int, temperature: float = 10000.0):
    """(N,) scalar positions -> (N, dim) sine embedding (reference
    modules/utils.py get_1d_sine_pe: paired-frequency exponent
    2*(i//2)/half, then cat(sin, cos))."""
    half = dim // 2
    i = jnp.arange(half, dtype=jnp.float32)
    inv = temperature ** (2.0 * jnp.floor(i / 2.0) / half)
    ang = t[..., None] / inv
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def axial_rope_angles(h: int, w: int, head_dim: int,
                      theta: float = 10000.0) -> np.ndarray:
    """(h*w, head_dim//2) rotation angles for axial 2-D RoPE: first quarter
    of channel-pairs rotates with x, second with y (reference utils.py:82
    compute_axial_cis; token order row-major, t_x = i % w, t_y = i // w)."""
    quarter = head_dim // 4
    freqs = 1.0 / (theta ** (np.arange(0, head_dim, 4)[:quarter] / head_dim))
    t = np.arange(h * w, dtype=np.float64)
    tx, ty = t % w, np.floor(t / w)
    ang_x = np.outer(tx, freqs)
    ang_y = np.outer(ty, freqs)
    return np.concatenate([ang_x, ang_y], -1).astype(np.float32)  # (S, hd//2)


def apply_rope(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Rotate channel pairs of (..., S, hd) by (S, hd//2) angles — the real
    form of the reference's complex multiply (utils.py:104)."""
    xr, xi = x[..., 0::2], x[..., 1::2]
    c, s = jnp.cos(angles), jnp.sin(angles)
    yr = xr * c - xi * s
    yi = xr * s + xi * c
    return jnp.stack([yr, yi], axis=-1).reshape(x.shape)


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

class RoPEAttention(nn.Module):
    """Projection attention with axial RoPE on q/k (reference blocks.py:405).

    `rope_k_repeat` tiles the query grid's angles across the key sequence
    (cross-attention to N memory frames of the same spatial size); the last
    `num_k_exclude_rope` keys (object-pointer tokens) are not rotated.
    """

    embedding_dim: int = 256
    num_heads: int = 1
    kv_in_dim: Optional[int] = None

    @nn.compact
    def __call__(self, q, k, v, q_hw: Tuple[int, int],
                 num_k_exclude_rope: int = 0, k_bias: jax.Array | None = None):
        D, nh = self.embedding_dim, self.num_heads
        hd = D // nh
        qp = nn.Dense(D, name="q_proj")(q)
        kp = nn.Dense(D, name="k_proj")(k)
        vp = nn.Dense(D, name="v_proj")(v)

        B, Sq = qp.shape[0], qp.shape[1]
        Sk = kp.shape[1]
        qp = qp.reshape(B, Sq, nh, hd).transpose(0, 2, 1, 3)
        kp = kp.reshape(B, Sk, nh, hd).transpose(0, 2, 1, 3)
        vp = vp.reshape(B, Sk, nh, hd).transpose(0, 2, 1, 3)

        ang = jnp.asarray(axial_rope_angles(*q_hw, hd))       # (Sq, hd//2)
        qp = apply_rope(qp, ang)
        n_rot = Sk - num_k_exclude_rope
        if n_rot > 0:
            reps = n_rot // Sq                  # rope_k_repeat (blocks.py:444)
            k_ang = jnp.tile(ang, (reps, 1)) if reps > 1 else ang
            kp = jnp.concatenate(
                [apply_rope(kp[:, :, :n_rot], k_ang), kp[:, :, n_rot:]], axis=2)

        attn = jnp.einsum("bhqc,bhkc->bhqk", qp, kp) / math.sqrt(hd)
        if k_bias is not None:                  # mask empty memory slots
            attn = attn + k_bias[:, None, None, :]
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(qp.dtype)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, vp)
        out = out.transpose(0, 2, 1, 3).reshape(B, Sq, D)
        return nn.Dense(D, name="out_proj")(out)


class MemoryAttentionLayer(nn.Module):
    """Pre-norm RoPE self-attn -> RoPE cross-attn to memory -> ReLU FFN
    (reference memory_attention.py:12; pos_enc_at_attn=False,
    pos_enc_at_cross_attn_keys=True are the SAM2 build defaults)."""

    d_model: int = 256
    dim_feedforward: int = 2048
    kv_in_dim: int = 64

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, q_hw,
                 num_k_exclude_rope: int = 0, k_bias=None):
        t2 = nn.LayerNorm(name="norm1")(tgt)
        tgt = tgt + RoPEAttention(self.d_model, 1, name="self_attn")(
            t2, t2, t2, q_hw)
        t2 = nn.LayerNorm(name="norm2")(tgt)
        # queries un-positioned, keys positioned (SAM2 build defaults:
        # pos_enc_at_cross_attn_queries=False, pos_enc_at_cross_attn_keys=True)
        tgt = tgt + RoPEAttention(self.d_model, 1, kv_in_dim=self.kv_in_dim,
                                  name="cross_attn_image")(
            t2, memory + pos, memory, q_hw,
            num_k_exclude_rope=num_k_exclude_rope, k_bias=k_bias)
        t2 = nn.LayerNorm(name="norm3")(tgt)
        t2 = nn.Dense(self.dim_feedforward, name="linear1")(t2)
        t2 = nn.Dense(self.d_model, name="linear2")(jax.nn.relu(t2))
        return tgt + t2


class MemoryAttention(nn.Module):
    """Stack of memory-attention layers + final norm (memory_attention.py:140).
    Inputs are (B, S, C) token tensors; `k_bias` carries the empty-slot mask.
    """

    d_model: int = 256
    num_layers: int = 4
    kv_in_dim: int = 64

    @nn.compact
    def __call__(self, curr, curr_pos, memory, memory_pos, q_hw,
                 num_obj_ptr_tokens: int = 0, k_bias=None):
        # SAM2 builds with pos_enc_at_input=True (memory_attention.py:208-210)
        x = curr + 0.1 * curr_pos
        for i in range(self.num_layers):
            x = MemoryAttentionLayer(self.d_model, kv_in_dim=self.kv_in_dim,
                                     name=f"layers_{i}")(
                x, memory, memory_pos, curr_pos, q_hw,
                num_k_exclude_rope=num_obj_ptr_tokens, k_bias=k_bias)
        return nn.LayerNorm(name="norm")(x)


# ---------------------------------------------------------------------------
# Memory encoder
# ---------------------------------------------------------------------------

class MaskDownSampler(nn.Module):
    """Downsample a (B, H, W, 1) mask by total_stride with progressive
    channel expansion (reference blocks.py:59: stride-2 k3 convs + LayerNorm2d
    + GELU, then 1x1 to embed_dim)."""

    embed_dim: int = 256
    total_stride: int = 16

    @nn.compact
    def __call__(self, m):
        layers = int(math.log2(self.total_stride))
        ch = 1
        for i in range(layers):
            ch *= 4
            m = nn.Conv(ch, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        name=f"down_{i}")(m)
            m = LayerNorm2d(name=f"ln_{i}")(m)
            m = jax.nn.gelu(m, approximate=False)
        return nn.Conv(self.embed_dim, (1, 1), name="out")(m)


class CXBlock(nn.Module):
    """ConvNeXt block: 7x7 depthwise conv -> LN -> MLP -> gamma scale +
    residual (reference blocks.py:114)."""

    dim: int = 256

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (7, 7), padding=[(3, 3), (3, 3)],
                    feature_group_count=self.dim, name="dwconv")(x)
        y = LayerNorm2d(name="norm")(y)
        y = nn.Dense(self.dim * 4, name="pwconv1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="pwconv2")(y)
        gamma = self.param("gamma",
                           nn.initializers.constant(1e-6), (self.dim,))
        return x + gamma * y


class MemoryEncoder(nn.Module):
    """(pix_feat (B,h,w,256), mask logits (B,H,W,1)) -> (B,h,w,mem_dim)
    memory features (reference encoders.py:378). The caller pre-applies the
    sigmoid scale/bias (sam.py:808-813: sigmoid(x)*20-10)."""

    out_dim: int = 64
    in_dim: int = 256

    @nn.compact
    def __call__(self, pix_feat, masks):
        m = MaskDownSampler(self.in_dim, name="mask_downsampler")(masks)
        x = nn.Conv(self.in_dim, (1, 1), name="pix_feat_proj")(pix_feat)
        x = x + m
        for i in range(2):                        # Fuser(CXBlock, num_layers=2)
            x = CXBlock(self.in_dim, name=f"fuser_{i}")(x)
        if self.out_dim != self.in_dim:
            x = nn.Conv(self.out_dim, (1, 1), name="out_proj")(x)
        return x


# ---------------------------------------------------------------------------
# Fixed-shape memory bank (pure pytree, ring-buffer semantics)
# ---------------------------------------------------------------------------

def init_bank(batch: int, s_tokens: int, mem_dim: int = 64,
              hidden_dim: int = 256, num_maskmem: int = 7,
              max_obj_ptrs: int = 16) -> dict:
    """Empty bank. Slot 0 = conditioning frame; 1..num_maskmem-1 = ring of
    the most recent frames; frame_idx -1 marks an empty slot."""
    return {
        "feats": jnp.zeros((batch, num_maskmem, s_tokens, mem_dim), jnp.float32),
        "pos": jnp.zeros((num_maskmem, s_tokens, mem_dim), jnp.float32),
        "frame_idx": jnp.full((num_maskmem,), -1, jnp.int32),
        "ptrs": jnp.zeros((batch, max_obj_ptrs, hidden_dim), jnp.float32),
        "ptr_frame_idx": jnp.full((max_obj_ptrs,), -1, jnp.int32),
        "t": jnp.zeros((), jnp.int32),        # frames tracked so far
    }


def write_bank(bank: dict, mem_feat: jax.Array, spatial_pos: jax.Array,
               obj_ptr: jax.Array, frame_idx: jax.Array,
               is_cond: bool) -> dict:
    """Insert one frame's memory. Conditioning frames take slot 0; others
    rotate through slots 1..N-1 (reference keeps the last num_maskmem-1
    frames, sam.py:655-683). Object pointers rotate through their own ring
    (last max_obj_ptrs frames, sam.py:726-733)."""
    n = bank["frame_idx"].shape[0]
    b, s, d = mem_feat.shape
    if is_cond:
        slot = jnp.zeros((), jnp.int32)
    else:
        slot = 1 + (bank["t"] - 1) % (n - 1)     # t counts frames already seen
    feats = jax.lax.dynamic_update_slice(
        bank["feats"], mem_feat[:, None], (0, slot, 0, 0))
    pos = jax.lax.dynamic_update_slice(
        bank["pos"], spatial_pos[None], (slot, 0, 0))
    fidx = jax.lax.dynamic_update_slice(
        bank["frame_idx"], frame_idx[None].astype(jnp.int32), (slot,))
    np_ = bank["ptr_frame_idx"].shape[0]
    pslot = bank["t"] % np_
    ptrs = jax.lax.dynamic_update_slice(
        bank["ptrs"], obj_ptr[:, None], (0, pslot, 0))
    pfidx = jax.lax.dynamic_update_slice(
        bank["ptr_frame_idx"], frame_idx[None].astype(jnp.int32), (pslot,))
    return {"feats": feats, "pos": pos, "frame_idx": fidx,
            "ptrs": ptrs, "ptr_frame_idx": pfidx, "t": bank["t"] + 1}


def read_bank(bank: dict, frame_idx: jax.Array, tpos_enc: jax.Array,
              ptr_tpos_fn, mem_dim: int = 64) -> tuple:
    """Assemble the fixed-length memory sequence for cross-attention.

    Returns (memory (B, L, mem_dim), memory_pos (B, L, mem_dim),
    k_bias (B, L) additive mask, num_ptr_tokens). L = num_maskmem*S +
    max_obj_ptrs*(hidden/mem_dim); empty slots get NEG_INF bias instead of
    being dropped — static shapes, one compiled graph for every frame.

    Temporal encoding (reference sam.py:693-696 + maskmem_tpos_enc index
    algebra): conditioning slot -> enc[num_maskmem-1]; a frame t_rel frames
    back -> enc[t_rel-1], clipped into range for ring age > num_maskmem-1
    (such a slot is about to be overwritten; the clip only touches frames
    the reference would have already evicted).
    """
    B, n, S, d = bank["feats"].shape
    t_rel = frame_idx - bank["frame_idx"]                     # (n,)
    enc_idx = jnp.clip(t_rel - 1, 0, n - 2)
    enc_idx = enc_idx.at[0].set(n - 1)                        # cond slot
    tpos = tpos_enc[enc_idx]                                  # (n, mem_dim)
    mem = bank["feats"].reshape(B, n * S, d)
    pos = (bank["pos"] + tpos[:, None]).reshape(1, n * S, d)
    pos = jnp.broadcast_to(pos, (B, n * S, d))
    valid = (bank["frame_idx"] >= 0)
    k_bias_spatial = jnp.where(jnp.repeat(valid, S), 0.0, NEG_INF)

    npt, hidden = bank["ptrs"].shape[1], bank["ptrs"].shape[2]
    split = hidden // mem_dim                                 # tokens per ptr
    ptr_valid = bank["ptr_frame_idx"] >= 0
    t_diff = jnp.where(ptr_valid, frame_idx - bank["ptr_frame_idx"], 0)
    ptr_pos = ptr_tpos_fn(t_diff.astype(jnp.float32))         # (npt, mem_dim)
    ptr_tokens = bank["ptrs"].reshape(B, npt * split, mem_dim)
    ptr_pos = jnp.broadcast_to(
        jnp.repeat(ptr_pos, split, axis=0)[None], (B, npt * split, mem_dim))
    k_bias_ptr = jnp.where(jnp.repeat(ptr_valid, split), 0.0, NEG_INF)

    memory = jnp.concatenate([mem, ptr_tokens], axis=1)
    memory_pos = jnp.concatenate([pos, ptr_pos], axis=1)
    k_bias = jnp.broadcast_to(
        jnp.concatenate([k_bias_spatial, k_bias_ptr])[None], memory.shape[:2])
    return memory, memory_pos, k_bias, npt * split
