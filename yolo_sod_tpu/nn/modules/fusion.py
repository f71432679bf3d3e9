"""Routing / recurrent fusion blocks (NHWC, flax.linen).

TPU-native re-expression of:
- BiLevelRoutingAttention + BiLevelRoutingAttentionFusionBlock
  (reference braf_block.py:15-160). The reference computes token-level
  attention with a Python double loop over (batch*heads, regions) — an
  O(BH*R) interpreter hot spot (braf_block.py:102-115). Here the routed
  regions gather with jnp.take_along_axis into a fixed (BH, R, K*T, D)
  tensor and ONE batched attention einsum covers every region — fully
  vectorized, fixed shapes, MXU-friendly.
- ConvGRUCell + RecurrentAttentionFusionBlock
  (reference recurrent_attention_fusion_block.py:14-179).
- SageAttention2 separable-gate attention (reference sageattention2.py:9-38);
  the flag-file one-shot A/B machinery (:41-75) reduces to an env check at
  construction since module choice must be static under jit.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_sod_tpu.nn.modules.block import C2f
from yolo_sod_tpu.nn.modules.conv import ChannelNorm, ConvBNAct, ScaleAdd


class SageAttention2(nn.Module):
    """Separable channel+spatial gate attention (reference sageattention2.py:9-38)."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        hidden = max(8, c // 8)
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        w = nn.Conv(hidden, (1, 1), use_bias=False, name="c_fc1")(g)
        w = nn.Conv(c, (1, 1), use_bias=False, name="c_fc2")(jax.nn.silu(w))
        x = x * jax.nn.sigmoid(w)
        avg_map = jnp.mean(x, axis=-1, keepdims=True)
        max_map = jnp.max(x, axis=-1, keepdims=True)
        s = nn.Conv(1, (7, 7), padding=3, use_bias=False, name="s_conv")(
            jnp.concatenate([avg_map, max_map], axis=-1))
        return x * jax.nn.sigmoid(s)


def use_sageattention2() -> bool:
    """Static stand-in for the reference's one-shot flag (sageattention2.py:41-62)."""
    return os.environ.get("USE_SAGE_ATTENTION2", "0") == "1"


class BiLevelRoutingAttention(nn.Module):
    """BRA: region-routing + token attention inside routed regions only.

    Reference braf_block.py:15-126. Complexity O(HW * K * T) instead of
    O((HW)^2); everything batched, no per-region loop.
    """

    dim: int
    num_heads: int = 8
    window_size: int = 8
    topk: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        ws = self.window_size
        nh = self.num_heads
        hd = C // nh
        scale = hd ** -0.5

        ph = (ws - H % ws) % ws
        pw = (ws - W % ws) % ws
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0))) if (ph or pw) else x
        Hp, Wp = H + ph, W + pw
        gh, gw = Hp // ws, Wp // ws
        R, T = gh * gw, ws * ws

        qkv = ConvBNAct(C, C * 3, 1, act=False, name="qkv")(xp, train)

        def windows(t):
            # (B, Hp, Wp, C) -> (B*nh, R, T, hd)
            t = t.reshape(B, gh, ws, gw, ws, nh, hd)
            t = t.transpose(0, 5, 1, 3, 2, 4, 6)           # B, nh, gh, gw, ws, ws, hd
            return t.reshape(B * nh, R, T, hd)

        q, k, v = (windows(t) for t in jnp.split(qkv, 3, axis=-1))

        # Region-level routing: mean-pooled region tokens, top-k affinity.
        q_r = q.mean(axis=2)                               # (BH, R, hd)
        k_r = k.mean(axis=2)
        affinity = jnp.einsum("brd,bkd->brk", q_r, k_r) * scale
        kk = min(self.topk, R)
        _, top_idx = jax.lax.top_k(affinity, kk)           # (BH, R, K)

        # Gather routed K/V windows: (BH, R, K, T, hd) -> (BH, R, K*T, hd).
        def gather(t):
            g = jnp.take_along_axis(t[:, None], top_idx[..., None, None], axis=2)
            return g.reshape(B * nh, R, kk * T, hd)

        k_sel, v_sel = gather(k), gather(v)

        # Token attention within routed token set — one batched einsum.
        from yolo_sod_tpu.ops.numerics import stable_softmax_lowp
        attn = jnp.einsum("brtd,brsd->brts", q, k_sel) * scale
        attn = stable_softmax_lowp(attn)
        out = jnp.einsum("brts,brsd->brtd", attn, v_sel)   # (BH, R, T, hd)

        out = out.reshape(B, nh, gh, gw, ws, ws, hd)
        out = out.transpose(0, 2, 4, 3, 5, 1, 6).reshape(B, Hp, Wp, C)
        if ph or pw:
            out = out[:, :H, :W]
        return ConvBNAct(C, C, 1, act=False, name="proj")(out, train)


class BiLevelRoutingAttentionFusionBlock(nn.Module):
    """BRAF: 1x1 align → C2f refine → BRA → 1x1 out (reference braf_block.py:129-160)."""

    c1: int
    c2: int
    num_heads: int = 8
    window_size: int = 8
    topk: int = 4
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_hidden = int(self.c2 * self.e)
        c_hidden = max(32, (c_hidden // self.num_heads) * self.num_heads)
        x = ConvBNAct(self.c1, c_hidden, 1, name="cv_in")(x, train)
        x = C2f(c_hidden, c_hidden, n=1, shortcut=True, name="c2f")(x, train)
        x = BiLevelRoutingAttention(c_hidden, self.num_heads, self.window_size,
                                    self.topk, name="bra")(x, train)
        return ConvBNAct(c_hidden, self.c2, 1, act=False, name="cv_out")(x, train)


class ConvGRUCell(nn.Module):
    """Convolutional GRU cell with ChannelNorm-stabilized gates
    (reference recurrent_attention_fusion_block.py:14-66)."""

    input_dim: int
    hidden_dim: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, h):
        k = self.kernel_size
        combined = jnp.concatenate([x, h], axis=-1)
        gates = nn.Conv(2 * self.hidden_dim, (k, k), padding=k // 2,
                        name="conv_gates")(combined)
        gates = ChannelNorm(2 * self.hidden_dim, name="cn_gates")(gates)
        reset, update = jnp.split(jax.nn.sigmoid(gates), 2, axis=-1)
        cand_in = jnp.concatenate([x, reset * h], axis=-1)
        cand = nn.Conv(self.hidden_dim, (k, k), padding=k // 2,
                       name="conv_can")(cand_in)
        cand = jnp.tanh(ChannelNorm(self.hidden_dim, name="cn_can")(cand))
        return (1 - update) * h + update * cand


class RecurrentAttentionFusionBlock(nn.Module):
    """RAFB: ConvGRU context path × attention refinement path with a context
    gate and ScaleAdd residual (reference recurrent_attention_fusion_block.py:69-179).

    Input may be a single map or [feature, hidden-state] pair; hidden state
    defaults to zeros (the YAML graphs pass a single input).
    """

    c1: int
    c2: int
    gru_hidden_dim: int = 128
    n_heads: int = 4
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (list, tuple)):
            f_curr = x[0]
            h_prev = x[1] if len(x) > 1 and x[1].shape[-1] == self.gru_hidden_dim else None
        else:
            f_curr, h_prev = x, None
        B, H, W, _ = f_curr.shape
        embed = max(32, int(self.c2 * self.e))
        if embed % self.n_heads:
            embed = (embed // self.n_heads + 1) * self.n_heads

        if h_prev is None:
            h_prev = jnp.zeros((B, H, W, self.gru_hidden_dim), f_curr.dtype)
        h_curr = ConvGRUCell(self.c1, self.gru_hidden_dim, name="conv_gru")(f_curr, h_prev)

        f_attn = C2f(self.c1, embed, n=1, shortcut=True, name="attn_c2f")(f_curr, train)
        if use_sageattention2():
            f_attn = SageAttention2(embed, name="sage")(f_attn, train)
        else:
            from yolo_sod_tpu.ops.pallas_attention import fused_mhsa

            seq = f_attn.reshape(B, H * W, embed)
            seq = nn.LayerNorm(name="ln1")(seq)
            # Full-map MHSA — at P2 scale this is a 25k-token sequence, so it
            # routes through the Pallas flash kernel (never materializes the
            # (L, L) score matrix in HBM).
            hd = embed // self.n_heads
            qkv = nn.Dense(3 * embed, name="mhsa_qkv")(seq)
            qkv = qkv.reshape(B, H * W, 3, self.n_heads, hd)
            q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3).reshape(
                B * self.n_heads, H * W, hd) for i in range(3))
            attn = fused_mhsa(q, k, v)
            attn = attn.reshape(B, self.n_heads, H * W, hd).transpose(0, 2, 1, 3)
            attn = nn.Dense(embed, name="mhsa_out")(attn.reshape(B, H * W, embed))
            seq = seq + attn
            y = nn.LayerNorm(name="ln2")(seq)
            y = nn.Dense(embed * 2, name="ffn1")(y)
            y = nn.Dense(embed, name="ffn2")(jax.nn.gelu(y))
            seq = seq + y
            f_attn = seq.reshape(B, H, W, embed)

        gate = ConvBNAct(self.gru_hidden_dim, embed, 1, name="context_gate")(h_curr, train)
        f_fused = f_attn * jax.nn.sigmoid(gate)

        out = ConvBNAct(embed, self.c2, 1, name="out_conv")(f_fused, train)
        res = ConvBNAct(self.c1, self.c2, 1, name="res_proj")(f_curr, train)
        return ScaleAdd(init_alpha=0.5, name="residual_add")([out, res], train)
