"""Pallas TPU kernel: the ENTIRE Swin window-transformer block, fused.

Round-3 HLO accounting (tools/hlo_bytes.py) showed the P2 WindowAttention
site still carried ~830 MB/batch of writes in pre/post-kernel glue even
with the lane-packed attention kernel (ops/pallas_window_attn.py):

    159 MB  in_proj qkv output (8464, 49, 192)
    159 MB  pure layout copy of it ({0,2,1} dot layout -> {2,1,0} kernel
            operand constraint)
    159 MB  q/k/v split fusion
    182 MB  3x pad 49 -> 56 feeding the kernel
     60 MB  attention output
    ~110 MB LN2 / MLP-hidden (8464, 49, 128) round-trips

This kernel replaces all of it: one pallas_call consumes the partitioned
windows (BW, 49, C) plus the block's 12 parameter tensors and computes

    w1 = w  + out_proj(MHSA(LayerNorm1(w)))        # attention half
    y  = w1 + mlp_1(gelu(mlp_0(LayerNorm2(w1))))   # MLP half

entirely in VMEM — HBM sees one (BW, 49, C) read and one write. The custom
VJP recomputes the forward in VMEM and emits dw plus all parameter
gradients; parameter grads are accumulated across the (sequential) TPU grid
in f32 via constant-index output blocks.

Reference behavior: blocks_transformer.py:81-131 (WindowAttention = LN ->
torch MultiheadAttention -> residual, LN -> MLP(gelu) -> residual). Math
parity with the plain-JAX path is pinned by tests/test_swin_block_kernel.py
(interpret mode, forward + every gradient).

Mosaic constraints honored (see pallas_window_attn.py): matmuls carry at
most ONE batch dimension (weights are broadcast to the window-block axis;
heads unroll in Python and slice lanes), and reductions stay on logical
shapes so the 49-token axis needs no explicit padding.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6          # flax nn.LayerNorm default, matches the plain path
_GELU_A = 0.044715
_GELU_C = 0.7978845608028654  # sqrt(2/pi)


def _head(t, h: int, hd: int):
    return jax.lax.slice_in_dim(t, h * hd, (h + 1) * hd, axis=2)


def _bmm(x, wb, mm=jnp.float32):
    """(BB, L, K) @ (BB, K, N) -> (BB, L, N). Weights arrive pre-broadcast
    over the window-block axis (Mosaic's tpu.matmul takes a single batch
    axis, and in-kernel rank/sublane broadcasts of small operands crash the
    CustomCallEmitter — `limits[i] <= dim(i)` — so the wrapper materializes
    the tiny broadcasts in XLA instead).

    `mm` is the MXU operand dtype: when the block's IO dtype is bf16 the
    wrapper passes bf16 so the systolic array runs at its bf16 rate (4x the
    f32 rate) with f32 accumulation — the same contract the unfused flax
    path had (LayerNorm casts back to bf16 before each Dense). f32 inputs
    (CPU parity tests, f32 training) keep f32 operands bit-for-bit."""
    return jax.lax.dot_general(
        x.astype(mm), wb.astype(mm),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _bmm_t(x, wb, mm=jnp.float32):
    """(BB, L, N) @ (BB, K, N) contracted on N -> (BB, L, K)."""
    return jax.lax.dot_general(
        x.astype(mm), wb.astype(mm),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _wgrad(x, dy, mm=jnp.float32):
    """sum_b x[b]^T dy[b]: (BB, L, K), (BB, L, N) -> (K, N)."""
    g = jax.lax.dot_general(
        x.astype(mm), dy.astype(mm),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # (BB, K, N)
    return g.sum(axis=0)


def _bias_grad(dy):
    """(BB, L, N) -> (1, N)."""
    return dy.sum(axis=0).sum(axis=0, keepdims=True)


def _ln_fwd(x, g, b):
    """LayerNorm over the last axis; returns (out, xhat, rstd)."""
    mu = x.mean(axis=-1, keepdims=True)
    xc = x - mu
    var = (xc * xc).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xh = xc * rstd
    return xh * g + b, xh, rstd


def _ln_bwd(dout, xh, rstd, g):
    """Input gradient of LayerNorm plus (dg, db) as (1, C) rows."""
    dg = _bias_grad(dout * xh)
    db = _bias_grad(dout)
    dxh = dout * g
    m1 = dxh.mean(axis=-1, keepdims=True)
    m2 = (dxh * xh).mean(axis=-1, keepdims=True)
    dx = rstd * (dxh - m1 - xh * m2)
    return dx, dg, db


def _gelu(x):
    u = _GELU_C * (x + _GELU_A * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(u))


def _gelu_grad(x):
    u = _GELU_C * (x + _GELU_A * x * x * x)
    t = jnp.tanh(u)
    du = _GELU_C * (1.0 + 3.0 * _GELU_A * x * x)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du


def _attn_fwd(w, g1, be1, wqkv, bqkv, wo, bo, heads, scale, mm=jnp.float32):
    """Attention half forward; LN/softmax in f32, MXU operands in `mm`.
    Returns (w1, residuals-for-bwd)."""
    ln1, xh1, rstd1 = _ln_fwd(w, g1, be1)
    qkv = _bmm(ln1, wqkv, mm) + bqkv                      # (BB, L, 3C)
    C = w.shape[2]
    hd = C // heads
    outs, probs = [], []
    for h in range(heads):
        qh = _head(qkv, h, hd)
        kh = jax.lax.slice_in_dim(qkv, C + h * hd, C + (h + 1) * hd, axis=2)
        vh = jax.lax.slice_in_dim(qkv, 2 * C + h * hd, 2 * C + (h + 1) * hd,
                                  axis=2)
        s = jax.lax.dot_general(
            qh.astype(mm), kh.astype(mm),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale   # (BB, L, L)
        m = s.max(axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / p.sum(axis=-1, keepdims=True)
        probs.append(p)
        outs.append(jax.lax.dot_general(
            p.astype(mm), vh.astype(mm),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    attn = jnp.concatenate(outs, axis=2)                  # (BB, L, C)
    w1 = w + _bmm(attn, wo, mm) + bo
    return w1, (ln1, xh1, rstd1, qkv, probs, attn)


def _blk_fwd_kernel(w_ref, g1_ref, be1_ref, wqkv_ref, bqkv_ref, wo_ref,
                    bo_ref, g2_ref, be2_ref, w1m_ref, b1m_ref, w2m_ref,
                    b2m_ref, o_ref, *, heads: int, scale: float,
                    mm=jnp.float32):
    w = w_ref[...].astype(jnp.float32)
    f32 = lambda r: r[...].astype(jnp.float32)  # noqa: E731
    w1, _ = _attn_fwd(w, f32(g1_ref), f32(be1_ref), f32(wqkv_ref),
                      f32(bqkv_ref), f32(wo_ref), f32(bo_ref), heads, scale,
                      mm)
    ln2, _, _ = _ln_fwd(w1, f32(g2_ref), f32(be2_ref))
    h1 = _bmm(ln2, f32(w1m_ref), mm) + f32(b1m_ref)
    y = w1 + _bmm(_gelu(h1), f32(w2m_ref), mm) + f32(b2m_ref)
    o_ref[...] = y.astype(o_ref.dtype)


def _blk_bwd_kernel(w_ref, do_ref, g1_ref, be1_ref, wqkv_ref, bqkv_ref,
                    wo_ref, bo_ref, g2_ref, be2_ref, w1m_ref, b1m_ref,
                    w2m_ref, b2m_ref,
                    dw_ref, dg1_ref, dbe1_ref, dwqkv_ref, dbqkv_ref, dwo_ref,
                    dbo_ref, dg2_ref, dbe2_ref, dw1m_ref, db1m_ref, dw2m_ref,
                    db2m_ref, *, heads: int, scale: float, mm=jnp.float32):
    grad_refs = (dg1_ref, dbe1_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                 dg2_ref, dbe2_ref, dw1m_ref, db1m_ref, dw2m_ref, db2m_ref)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grad_refs:
            r[...] = jnp.zeros(r.shape, r.dtype)

    w = w_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)
    f32 = lambda r: r[...].astype(jnp.float32)  # noqa: E731
    g1, be1, wqkv, bqkv, wo, bo = (f32(r) for r in (
        g1_ref, be1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref))
    g2, be2, w1m, b1m, w2m, b2m = (f32(r) for r in (
        g2_ref, be2_ref, w1m_ref, b1m_ref, w2m_ref, b2m_ref))

    # --- recompute forward residuals in VMEM -------------------------------
    w1, (ln1, xh1, rstd1, qkv, probs, attn) = _attn_fwd(
        w, g1, be1, wqkv, bqkv, wo, bo, heads, scale, mm)
    ln2, xh2, rstd2 = _ln_fwd(w1, g2, be2)
    h1 = _bmm(ln2, w1m, mm) + b1m
    a1 = _gelu(h1)

    # --- MLP half backward --------------------------------------------------
    dm = do                                               # y = w1 + m
    dw2m_ref[...] += _wgrad(a1, dm, mm)
    db2m_ref[...] += _bias_grad(dm)
    dh1 = _bmm_t(dm, w2m, mm) * _gelu_grad(h1)
    dw1m_ref[...] += _wgrad(ln2, dh1, mm)
    db1m_ref[...] += _bias_grad(dh1)
    dln2 = _bmm_t(dh1, w1m, mm)
    dw1_ln, dg2, dbe2 = _ln_bwd(dln2, xh2, rstd2, g2)
    dg2_ref[...] += dg2
    dbe2_ref[...] += dbe2
    dw1 = do + dw1_ln

    # --- attention half backward --------------------------------------------
    dwo_ref[...] += _wgrad(attn, dw1, mm)
    dbo_ref[...] += _bias_grad(dw1)
    dattn = _bmm_t(dw1, wo, mm)                           # (BB, L, C)
    C = w.shape[2]
    hd = C // heads
    cast = lambda t: t.astype(mm)  # noqa: E731
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        p = probs[h]
        kh = jax.lax.slice_in_dim(qkv, C + h * hd, C + (h + 1) * hd, axis=2)
        vh = jax.lax.slice_in_dim(qkv, 2 * C + h * hd, 2 * C + (h + 1) * hd,
                                  axis=2)
        qh = _head(qkv, h, hd)
        doh = _head(dattn, h, hd)
        dvs.append(jax.lax.dot_general(
            cast(p), cast(doh),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
        dp = jax.lax.dot_general(
            cast(doh), cast(vh),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = p * (dp - (dp * p).sum(axis=-1, keepdims=True))
        dqs.append(jax.lax.dot_general(
            cast(ds), cast(kh),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale)
        dks.append(jax.lax.dot_general(
            cast(ds), cast(qh),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale)
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=2)       # (BB, L, 3C)
    dwqkv_ref[...] += _wgrad(ln1, dqkv, mm)
    dbqkv_ref[...] += _bias_grad(dqkv)
    dln1 = _bmm_t(dqkv, wqkv, mm)
    dw_ln, dg1, dbe1 = _ln_bwd(dln1, xh1, rstd1, g1)
    dg1_ref[...] += dg1
    dbe1_ref[...] += dbe1
    dw_ref[...] = (dw1 + dw_ln).astype(dw_ref.dtype)


def _auto_block(C: int, hidden: int, bwd: bool) -> int:
    """Window-batch block size under the ~16 MB scoped-VMEM compile limit.

    Calibrated the same way as pallas_window_attn._auto_block: Mosaic's
    stack holds f32 copies of every live tile plus per-head lane slices, so
    budget ~70 B per packed element. The block's live set is roughly
    (4 + hidden/C) C-wide tiles plus `heads` (L, L) score tiles."""
    if bwd:
        return 4
    return 8 if C <= 128 else 4


def _expand(p, bb: int, L: int):
    """Broadcast a parameter to a full VMEM block: vectors (N,) ->
    (bb, L, N), matrices (K, N) -> (bb, K, N). These are tiny (<=400 KB
    f32) and fetched once (constant-index blocks); materializing the
    broadcast in XLA avoids the in-kernel rank/sublane broadcasts that
    crash Mosaic's CustomCallEmitter."""
    if p.ndim == 1:
        return jnp.broadcast_to(p, (bb, L, p.shape[0]))
    return jnp.broadcast_to(p[None], (bb,) + p.shape)


def _grad_shape(p):
    """Accumulator shape for a parameter gradient: vectors come back as a
    (1, N) row, matrices as (K, N)."""
    return (1, p.shape[0]) if p.ndim == 1 else p.shape


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _pad_bw(t, pb: int):
    return jnp.pad(t, ((0, pb), (0, 0), (0, 0))) if pb else t


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def swin_window_block(w, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1m, b1m,
                      w2m, b2m, heads: int, block_b: int | None = None,
                      interpret: bool = False):
    """Fused Swin window block: w -> LN1 -> MHSA -> +res -> LN2 -> MLP -> +res.

    Args:
        w: (BW, L, C) partitioned windows (BW = B * nH * nW).
        g1/be1, g2/be2: LayerNorm scale/bias, (C,).
        wqkv/bqkv: packed qkv projection, (C, 3C) / (3C,) — torch
            MultiheadAttention in_proj layout (q rows, then k, then v).
        wo/bo: out projection (C, C) / (C,).
        w1m/b1m, w2m/b2m: MLP dense layers (C, hidden) / (hidden,) and back.
        heads: head count; C % heads == 0, heads split on the lane axis
            inside VMEM (lane packing, see pallas_window_attn.py).

    Returns:
        (BW, L, C) block output in w's dtype.
    """
    out, _ = _swin_fwd(w, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1m, b1m,
                       w2m, b2m, heads, block_b, interpret)
    return out


def _swin_fwd(w, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1m, b1m, w2m, b2m,
              heads, block_b, interpret):
    BW, L, C = w.shape
    scale = (C // heads) ** -0.5
    hidden = w1m.shape[-1]
    bb = block_b or _auto_block(C, hidden, bwd=False)
    pb = (-BW) % bb
    wp = _pad_bw(w, pb)
    params = [_expand(p, bb, L) for p in (g1, be1, wqkv, bqkv, wo, bo, g2,
                                          be2, w1m, b1m, w2m, b2m)]
    wspec = pl.BlockSpec((bb, L, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    mm = jnp.bfloat16 if w.dtype == jnp.bfloat16 else jnp.float32
    out = pl.pallas_call(
        functools.partial(_blk_fwd_kernel, heads=heads, scale=scale, mm=mm),
        grid=((BW + pb) // bb,),
        in_specs=[wspec] + [_const_spec(p.shape) for p in params],
        out_specs=wspec,
        out_shape=jax.ShapeDtypeStruct((BW + pb, L, C), w.dtype),
        interpret=interpret,
    )(wp, *params)
    res = (w, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1m, b1m, w2m, b2m)
    return out[:BW], res


def _swin_bwd(heads, block_b, interpret, res, do):
    w, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1m, b1m, w2m, b2m = res
    BW, L, C = w.shape
    scale = (C // heads) ** -0.5
    hidden = w1m.shape[-1]
    bb = block_b or _auto_block(C, hidden, bwd=True)
    pb = (-BW) % bb
    wp, dop = _pad_bw(w, pb), _pad_bw(do, pb)
    prims = (g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1m, b1m, w2m, b2m)
    params = [_expand(p, bb, L) for p in prims]
    wspec = pl.BlockSpec((bb, L, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    grad_shapes = [jax.ShapeDtypeStruct(_grad_shape(p), jnp.float32)
                   for p in prims]
    mm = jnp.bfloat16 if w.dtype == jnp.bfloat16 else jnp.float32
    outs = pl.pallas_call(
        functools.partial(_blk_bwd_kernel, heads=heads, scale=scale, mm=mm),
        grid=((BW + pb) // bb,),
        in_specs=[wspec, wspec] + [_const_spec(p.shape) for p in params],
        out_specs=[wspec] + [_const_spec(_grad_shape(p)) for p in prims],
        out_shape=[jax.ShapeDtypeStruct((BW + pb, L, C), w.dtype)]
        + grad_shapes,
        interpret=interpret,
    )(wp, dop, *params)
    dw = outs[0][:BW]
    grads = [g.reshape(p.shape).astype(p.dtype)
             for g, p in zip(outs[1:], prims)]
    return (dw, *grads)


swin_window_block.defvjp(_swin_fwd, _swin_bwd)


# ---------------------------------------------------------------------------
# Spatial form: window partition/reverse folded INTO the kernel.
#
# The (BW, L, C) kernel above still leaves XLA to build the partitioned
# tensor: pad H/W to window multiples, a 6-D reshape/transpose pair, plus a
# layout copy forced by the custom-call operand constraint — measured
# ~320 MB/batch of writes (and the same again in reads) at the P2 site alone
# (tools/hlo_bytes.py, 2026-08-19). The spatial kernel instead reads 7-row
# strips of the raw NHWC feature map directly via BlockSpec, builds the
# (gw, 49, C) window batch in VMEM, runs the identical block math, and
# scatters the strip back — HBM sees ONE read and ONE write of the map and
# nothing else. Out-of-bounds rows/cols of boundary blocks are zero-masked
# in-kernel, reproducing the reference's zero-pad-tokens-as-keys semantics
# (blocks_transformer.py:8-47 pads with zeros and crops after reverse)
# without materializing the pad.
#
# MEASURED NEGATIVE RESULT (2026-08-19, v5e, flagship 640x640 batch 16,
# back-to-back profile_pipeline A/B): the traffic win is real (forward
# 12.32 -> 10.92 GB/batch) but wall time REGRESSES 21.5 -> 24.9 ms/batch.
# The in-kernel strip->window relayout — reshape splitting the second-minor
# strip dim (gw*7) into (gw, 7) plus the (gw, win) transpose, twice per
# direction per step — is pure VREG-shuffle work that costs ~4.5 ms/batch,
# nearly 3x the ~1.7 ms the saved partition copies were worth at the
# 819 GB/s roofline. Mosaic relayouts across the sublane dim are that
# expensive; XLA's HBM-level 6-D transpose is cheaper per element. The
# kernel stays available opt-in (YOLO_SOD_SWIN_SPATIAL=1) and
# parity-tested; the default path remains XLA partition + the (BW, L, C)
# whole-block kernel above.
#
# Mosaic tiling constraint (also recorded here): the strip block's
# second-minor dim gw*win must be divisible by 8 or equal W exactly, and
# i1 masks cannot be minor-dim-expanded (build them 3-D via iota).
# ---------------------------------------------------------------------------


def _strip_to_windows(strip, win: int, gw: int):
    """(win, gw*win, C) -> (gw, win*win, C): the in-VMEM window partition."""
    C = strip.shape[-1]
    x = strip.reshape(win, gw, win, C).transpose(1, 0, 2, 3)
    return x.reshape(gw, win * win, C)


def _windows_to_strip(wins, win: int, gw: int):
    """Inverse of _strip_to_windows."""
    C = wins.shape[-1]
    x = wins.reshape(gw, win, win, C).transpose(1, 0, 2, 3)
    return x.reshape(win, gw * win, C)


def _strip_mask(H: int, W: int, win: int, Wb: int, nH: int, nWB: int):
    """(win, Wb, 1) validity mask for the current grid step's strip.

    Built 3-D directly: Mosaic cannot expand a minor dim on an i1 vector
    ("insertion of minor dim ... only supported for 32-bit types"), so
    mask[..., None] on a 2-D bool is not lowerable on TPU.
    """
    t = pl.program_id(0)
    r = (t // nWB) % nH
    cb = t % nWB
    rows = jax.lax.broadcasted_iota(jnp.int32, (win, Wb, 1), 0) + r * win
    cols = jax.lax.broadcasted_iota(jnp.int32, (win, Wb, 1), 1) + cb * Wb
    return (rows < H) & (cols < W)


def _sp_fwd_kernel(x_ref, g1_ref, be1_ref, wqkv_ref, bqkv_ref, wo_ref,
                   bo_ref, g2_ref, be2_ref, w1m_ref, b1m_ref, w2m_ref,
                   b2m_ref, o_ref, *, heads: int, scale: float, H: int,
                   W: int, win: int, gw: int, nH: int, nWB: int,
                   mm=jnp.float32):
    Wb = gw * win
    mask = _strip_mask(H, W, win, Wb, nH, nWB)
    strip = jnp.where(mask, x_ref[0].astype(jnp.float32), 0.0)
    w = _strip_to_windows(strip, win, gw)
    f32 = lambda r: r[...].astype(jnp.float32)  # noqa: E731
    w1, _ = _attn_fwd(w, f32(g1_ref), f32(be1_ref), f32(wqkv_ref),
                      f32(bqkv_ref), f32(wo_ref), f32(bo_ref), heads, scale,
                      mm)
    ln2, _, _ = _ln_fwd(w1, f32(g2_ref), f32(be2_ref))
    h1 = _bmm(ln2, f32(w1m_ref), mm) + f32(b1m_ref)
    y = w1 + _bmm(_gelu(h1), f32(w2m_ref), mm) + f32(b2m_ref)
    o_ref[0] = _windows_to_strip(y, win, gw).astype(o_ref.dtype)


def _sp_bwd_kernel(x_ref, do_ref, g1_ref, be1_ref, wqkv_ref, bqkv_ref,
                   wo_ref, bo_ref, g2_ref, be2_ref, w1m_ref, b1m_ref,
                   w2m_ref, b2m_ref,
                   dx_ref, dg1_ref, dbe1_ref, dwqkv_ref, dbqkv_ref, dwo_ref,
                   dbo_ref, dg2_ref, dbe2_ref, dw1m_ref, db1m_ref, dw2m_ref,
                   db2m_ref, *, heads: int, scale: float, H: int, W: int,
                   win: int, gw: int, nH: int, nWB: int, mm=jnp.float32):
    grad_refs = (dg1_ref, dbe1_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                 dg2_ref, dbe2_ref, dw1m_ref, db1m_ref, dw2m_ref, db2m_ref)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grad_refs:
            r[...] = jnp.zeros(r.shape, r.dtype)

    Wb = gw * win
    mask = _strip_mask(H, W, win, Wb, nH, nWB)
    strip = jnp.where(mask, x_ref[0].astype(jnp.float32), 0.0)
    dstrip = jnp.where(mask, do_ref[0].astype(jnp.float32), 0.0)
    w = _strip_to_windows(strip, win, gw)
    do = _strip_to_windows(dstrip, win, gw)
    f32 = lambda r: r[...].astype(jnp.float32)  # noqa: E731
    g1, be1, wqkv, bqkv, wo, bo = (f32(r) for r in (
        g1_ref, be1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref))
    g2, be2, w1m, b1m, w2m, b2m = (f32(r) for r in (
        g2_ref, be2_ref, w1m_ref, b1m_ref, w2m_ref, b2m_ref))

    # recompute forward residuals in VMEM
    w1, (ln1, xh1, rstd1, qkv, probs, attn) = _attn_fwd(
        w, g1, be1, wqkv, bqkv, wo, bo, heads, scale, mm)
    ln2, xh2, rstd2 = _ln_fwd(w1, g2, be2)
    h1 = _bmm(ln2, w1m, mm) + b1m
    a1 = _gelu(h1)

    # MLP half backward
    dm = do
    dw2m_ref[...] += _wgrad(a1, dm, mm)
    db2m_ref[...] += _bias_grad(dm)
    dh1 = _bmm_t(dm, w2m, mm) * _gelu_grad(h1)
    dw1m_ref[...] += _wgrad(ln2, dh1, mm)
    db1m_ref[...] += _bias_grad(dh1)
    dln2 = _bmm_t(dh1, w1m, mm)
    dw1_ln, dg2, dbe2 = _ln_bwd(dln2, xh2, rstd2, g2)
    dg2_ref[...] += dg2
    dbe2_ref[...] += dbe2
    dw1 = do + dw1_ln

    # attention half backward
    dwo_ref[...] += _wgrad(attn, dw1, mm)
    dbo_ref[...] += _bias_grad(dw1)
    dattn = _bmm_t(dw1, wo, mm)
    C = w.shape[2]
    hd = C // heads
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        p = probs[h]
        kh = jax.lax.slice_in_dim(qkv, C + h * hd, C + (h + 1) * hd, axis=2)
        vh = jax.lax.slice_in_dim(qkv, 2 * C + h * hd, 2 * C + (h + 1) * hd,
                                  axis=2)
        qh = _head(qkv, h, hd)
        doh = _head(dattn, h, hd)
        dvs.append(jax.lax.dot_general(
            p, doh, dimension_numbers=(((1,), (1,)), ((0,), (0,)))))
        dp = jax.lax.dot_general(
            doh, vh, dimension_numbers=(((2,), (2,)), ((0,), (0,))))
        ds = p * (dp - (dp * p).sum(axis=-1, keepdims=True))
        dqs.append(jax.lax.dot_general(
            ds, kh, dimension_numbers=(((2,), (1,)), ((0,), (0,)))) * scale)
        dks.append(jax.lax.dot_general(
            ds, qh, dimension_numbers=(((1,), (1,)), ((0,), (0,)))) * scale)
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=2)
    dwqkv_ref[...] += _wgrad(ln1, dqkv, mm)
    dbqkv_ref[...] += _bias_grad(dqkv)
    dln1 = _bmm_t(dqkv, wqkv, mm)
    dw_ln, dg1, dbe1 = _ln_bwd(dln1, xh1, rstd1, g1)
    dg1_ref[...] += dg1
    dbe1_ref[...] += dbe1
    dx_ref[0] = _windows_to_strip(dw1 + dw_ln, win, gw).astype(dx_ref.dtype)


def _sp_grid(B: int, H: int, W: int, win: int, gw: int):
    nH = -(-H // win)
    nW = -(-W // win)
    nWB = -(-nW // gw)
    return nH, nW, nWB


def _sp_gw(W: int, win: int, C: int, bwd: bool) -> int:
    """Windows per strip block, subject to the Mosaic tiling rule: the
    block's second-minor dim (strip width gw*win) must be divisible by 8
    or equal W exactly. Among legal choices under the VMEM cap (backward
    keeps a larger live set), minimize over-read of out-of-bounds window
    columns, tie-breaking toward fewer grid steps."""
    nW = -(-W // win)
    cap = (nW if C <= 128 else 12) if not bwd else (8 if C <= 128 else 4)
    cap = max(cap, 1)
    cands = []
    if W % win == 0 and nW <= cap:
        cands.append(nW)                     # exact cover: Wb == W
    g = 8 // math.gcd(win, 8)                # smallest gw with win*gw % 8 == 0
    cands += [g * k for k in range(1, max(cap // g, 1) + 1)]
    return min(cands, key=lambda gw: ((-(-nW // gw)) * gw - nW, -(-nW // gw)))


def _sp_specs(B, H, W, C, win, gw, nH, nWB, params, dtype):
    Wb = gw * win
    xspec = pl.BlockSpec(
        (1, win, Wb, C),
        lambda t: (t // (nH * nWB), (t // nWB) % nH, t % nWB, 0),
        memory_space=pltpu.VMEM)
    pspecs = [_const_spec(p.shape) for p in params]
    return xspec, pspecs


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16))
def swin_block_spatial(x, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1m, b1m,
                       w2m, b2m, heads: int, win: int = 7,
                       block_windows: int | None = None,
                       interpret: bool = False):
    """Fused Swin window block on the raw (B, H, W, C) map.

    Equivalent to window_partition -> swin_window_block -> window_reverse
    (reference blocks_transformer.py:81-131 incl. its zero-pad semantics:
    pad tokens of boundary windows participate as keys, padded outputs are
    cropped) with the partition/reverse data movement kept in VMEM.
    Requires H > win or W > win (the degenerate single-window case keeps the
    plain path). Parity pinned by tests/test_swin_block_kernel.py.
    """
    out, _ = _sp_fwd(x, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1m, b1m,
                     w2m, b2m, heads, win, block_windows, interpret)
    return out


def _sp_fwd(x, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1m, b1m, w2m, b2m,
            heads, win, block_windows, interpret):
    B, H, W, C = x.shape
    scale = (C // heads) ** -0.5
    gw = block_windows or _sp_gw(W, win, C, bwd=False)
    nH, nW, nWB = _sp_grid(B, H, W, win, gw)
    prims = (g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1m, b1m, w2m, b2m)
    params = [_expand(p, gw, win * win) for p in prims]
    xspec, pspecs = _sp_specs(B, H, W, C, win, gw, nH, nWB, params, x.dtype)
    # Same MXU-operand-precision selection as the windowed kernels: bf16 IO
    # runs the matmuls at the bf16 systolic rate (ADVICE r3: A/B timings vs
    # the default path must compare layout strategies, not matmul rates).
    mm = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    out = pl.pallas_call(
        functools.partial(_sp_fwd_kernel, heads=heads, scale=scale, H=H,
                          W=W, win=win, gw=gw, nH=nH, nWB=nWB, mm=mm),
        grid=(B * nH * nWB,),
        in_specs=[xspec] + pspecs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        interpret=interpret,
    )(x, *params)
    return out, (x, *prims)


def _sp_bwd(heads, win, block_windows, interpret, res, do):
    x, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1m, b1m, w2m, b2m = res
    B, H, W, C = x.shape
    scale = (C // heads) ** -0.5
    gw = block_windows or _sp_gw(W, win, C, bwd=True)
    nH, nW, nWB = _sp_grid(B, H, W, win, gw)
    prims = (g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1m, b1m, w2m, b2m)
    params = [_expand(p, gw, win * win) for p in prims]
    xspec, pspecs = _sp_specs(B, H, W, C, win, gw, nH, nWB, params, x.dtype)
    grad_shapes = [jax.ShapeDtypeStruct(_grad_shape(p), jnp.float32)
                   for p in prims]
    mm = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    outs = pl.pallas_call(
        functools.partial(_sp_bwd_kernel, heads=heads, scale=scale, H=H,
                          W=W, win=win, gw=gw, nH=nH, nWB=nWB, mm=mm),
        grid=(B * nH * nWB,),
        in_specs=[xspec, xspec] + pspecs,
        out_specs=[xspec] + [_const_spec(_grad_shape(p)) for p in prims],
        out_shape=[jax.ShapeDtypeStruct((B, H, W, C), x.dtype)]
        + grad_shapes,
        interpret=interpret,
    )(x, do, *params)
    dx = outs[0]
    grads = [g.reshape(p.shape).astype(p.dtype)
             for g, p in zip(outs[1:], prims)]
    return (dx, *grads)


swin_block_spatial.defvjp(_sp_fwd, _sp_bwd)


def swin_window_block_ref(w, g1, be1, wqkv, bqkv, wo, bo, g2, be2, w1m, b1m,
                          w2m, b2m, heads: int):
    """Plain-JAX reference of the fused block (the non-TPU path and the
    oracle for tests/test_swin_block_kernel.py). Identical math: LN eps
    1e-6, tanh-approximate gelu, f32 softmax."""
    dtype = w.dtype
    x = w.astype(jnp.float32)
    ln1, _, _ = _ln_fwd(x, g1.astype(jnp.float32), be1.astype(jnp.float32))
    qkv = ln1 @ wqkv.astype(jnp.float32) + bqkv.astype(jnp.float32)
    BW, L, C = x.shape
    hd = C // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qh = q.reshape(BW, L, heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(BW, L, heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(BW, L, heads, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhnd,bhmd->bhnm", qh, kh) * (hd ** -0.5)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", p, vh)
    attn = o.transpose(0, 2, 1, 3).reshape(BW, L, C)
    w1 = x + attn @ wo.astype(jnp.float32) + bo.astype(jnp.float32)
    ln2, _, _ = _ln_fwd(w1, g2.astype(jnp.float32), be2.astype(jnp.float32))
    h1 = ln2 @ w1m.astype(jnp.float32) + b1m.astype(jnp.float32)
    y = w1 + _gelu(h1) @ w2m.astype(jnp.float32) + b2m.astype(jnp.float32)
    return y.astype(dtype)
