"""SAM2 video object segmentation: streaming predictor over a memory bank.

Capability parity with the reference video path (modules/sam.py:915
track_step -> :828 _track_step / :620 _prepare_memory_conditioned_features /
:784 _encode_new_memory, exposed by sam/predict.py SAM2VideoPredictor):
prompt an object on one frame, then propagate its mask through the video by
cross-attending each new frame's features to a memory of past frames plus
object-pointer tokens, and writing each new result back into the memory.

TPU-native design (vs the reference's python dict-of-frames):
- ALL per-frame state lives in a fixed-shape pytree (`memory.init_bank`);
  `track()` is ONE jitted step — encode, memory-condition, decode, memory-
  encode, ring-buffer write — with the bank donated, so propagation never
  retraces and never re-allocates.
- Empty memory slots are attention-masked (additive -inf), not absent.
- The object axis is the batch axis: B tracked objects condition/decode in
  one SPMD-friendly batched graph (the reference loops objects in python).

SAM2.1 behaviors kept: sigmoid(x)*20-10 mask scaling for the memory encoder
(sam.py:808-813), HARD occlusion-aware no-object memory blending —
is_obj = (obj_logits > 0), not sigmoid (sam.py:822-826) — NO_OBJ_SCORE=-1024
hard-masks all masks when occluded (sam.py:24,498-501), the no-object pointer
blend with fixed_no_obj_ptr=True / soft_no_obj_ptr=False (sam.py:525-536),
multimask output during tracking with best-IoU mask+token selection
(sam.py:973-981 _use_multimask, build.py:286-289), object pointers split into
mem_dim tokens with sine temporal encoding (sam.py:735-749), no-memory
embedding on conditioning frames (sam.py:759-761). Simplified: exactly one
conditioning frame (ultralytics' video predictor prompts one frame per
object); temporal stride r=1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolo_sod_tpu.models.sam.memory import (MemoryAttention, MemoryEncoder,
                                            init_bank, read_bank, sine_pe_1d,
                                            sine_pos_2d, write_bank)
from yolo_sod_tpu.models.sam.modules import MLP
from yolo_sod_tpu.models.sam.sam2 import SAM2Model

MEM_DIM = 64
HIDDEN = 256
SIGMOID_SCALE = 20.0        # sam.py sigmoid_scale_for_mem_enc
SIGMOID_BIAS = -10.0        # sam.py sigmoid_bias_for_mem_enc
NO_OBJ_SCORE = -1024.0      # sam.py:24 — hard mask value when occluded


class _PtrTposProj(nn.Module):
    """Sine-encode an obj-ptr age and project to mem_dim
    (sam.py:738-743, proj_tpos_enc_in_obj_ptrs=True)."""

    t_max: float

    @nn.compact
    def __call__(self, t_diff):
        pe = sine_pe_1d(t_diff / self.t_max, HIDDEN)
        return nn.Dense(MEM_DIM, name="proj")(pe)


class SAM2VideoPredictor:
    """Streaming video segmentation driver.

    Example:
        model = SAM2Model("sam2_t", img_size=256); model.init()
        vp = SAM2VideoPredictor(model)
        vp.add_prompt(frame0, points=[[120, 80]], labels=[1])
        for frame in frames:
            mask, iou, obj_score = vp.track(frame)
    """

    def __init__(self, model: SAM2Model, num_maskmem: int = 7,
                 max_obj_ptrs: int = 16):
        self.model = model
        self.num_maskmem = num_maskmem
        self.max_obj_ptrs = max_obj_ptrs
        self.mem_attn = MemoryAttention(d_model=HIDDEN, num_layers=4,
                                        kv_in_dim=MEM_DIM)
        self.mem_enc = MemoryEncoder(out_dim=MEM_DIM, in_dim=HIDDEN)
        self.obj_ptr_proj = MLP(HIDDEN, HIDDEN, 3)
        self.ptr_tpos = _PtrTposProj(t_max=float(max_obj_ptrs - 1))
        self.variables: Optional[dict] = None
        self.bank = None
        self._jit: dict = {}
        s = model.img_size // 16
        self._s = s
        self._spatial_pos = jnp.asarray(sine_pos_2d(s, s, MEM_DIM))
        self._cur_pos = jnp.asarray(sine_pos_2d(s, s, HIDDEN))

    # -- parameter lifecycle ---------------------------------------------------
    def init(self, rng: Optional[jax.Array] = None):
        if self.model.variables is None:
            self.model.init()
        rng = jax.random.PRNGKey(1) if rng is None else rng
        r1, r2, r3, r4, r5, r6 = jax.random.split(rng, 6)
        s, S = self._s, self._s * self._s
        cur = jnp.zeros((1, S, HIDDEN), jnp.float32)
        L = self.num_maskmem * S + self.max_obj_ptrs * (HIDDEN // MEM_DIM)
        mem = jnp.zeros((1, L, MEM_DIM), jnp.float32)
        ma = jax.jit(lambda r, c, m: self.mem_attn.init(
            r, c, c, m, m, (s, s),
            num_obj_ptr_tokens=self.max_obj_ptrs * (HIDDEN // MEM_DIM)))(
                r1, cur, mem)
        pix = jnp.zeros((1, s, s, HIDDEN), jnp.float32)
        msk = jnp.zeros((1, self.model.img_size, self.model.img_size, 1),
                        jnp.float32)
        me = jax.jit(self.mem_enc.init)(r2, pix, msk)
        pp = self.obj_ptr_proj.init(r3, jnp.zeros((1, HIDDEN)))
        pt = self.ptr_tpos.init(r4, jnp.zeros((self.max_obj_ptrs,)))
        tpos = jax.random.normal(r5, (self.num_maskmem, MEM_DIM)) * 0.02
        k6, k7 = jax.random.split(r6)
        no_obj = jax.random.normal(k6, (MEM_DIM,)) * 0.02
        # fixed_no_obj_ptr=True -> learned no-object pointer (sam.py:307-312)
        no_obj_ptr = jax.random.normal(k7, (HIDDEN,)) * 0.02
        self.variables = {"model": self.model.variables, "mem_attn": ma,
                          "mem_enc": me, "ptr_proj": pp, "ptr_tpos": pt,
                          "maskmem_tpos_enc": tpos,
                          "no_obj_embed_spatial": no_obj,
                          "no_obj_ptr": no_obj_ptr}
        return self.variables

    # -- pure step pieces --------------------------------------------------------
    def _encode_raw(self, v, x):
        """Backbone features WITHOUT the no-memory embedding: the video path
        adds either the no-mem embed (cond) or memory conditioning (track)."""
        m = self.model
        feats = m.trunk.apply(v["trunk"], x)
        fpn = m.neck.apply(v["neck"], feats)
        s0, s1 = m._skips.apply(v["skips"], fpn[0], fpn[1])
        return fpn[2], (s0, s1)

    def _decode(self, v, embed, skips, points, labels, multimask: bool):
        """The reference prompt encoder appends one padding point (label -1)
        whenever boxes are absent (encoders.py pad=True); match it so the
        decoder sees the same token count."""
        m = self.model
        B = points.shape[0]
        points = jnp.concatenate(
            [points, jnp.zeros((B, 1, 2), points.dtype)], axis=1)
        labels = jnp.concatenate(
            [labels, jnp.full((B, 1), -1, labels.dtype)], axis=1)
        sparse, dense = m.prompt_encoder.apply(v["prompt"], points, labels)
        img_pe = m.prompt_encoder.apply(v["prompt"], method="get_dense_pe")
        masks, iou, obj, tok = m.mask_decoder.apply(
            v["decoder"], embed, img_pe, sparse, dense, skips,
            multimask_output=multimask, return_token=True)
        return masks, iou, obj, tok

    def _sam_heads(self, vars_, embed, skips, points, labels, multimask: bool):
        """Decode + SAM2.1 occlusion handling (sam.py:498-536): when
        obj_logits <= 0 all mask logits are hard-set to NO_OBJ_SCORE, and the
        object pointer is HARD-blended with the learned no_obj_ptr
        (fixed_no_obj_ptr=True, soft_no_obj_ptr=False in every SAM2 build).
        With multimask, the best-IoU mask/token is selected (sam.py:507-516;
        use_multimask_token_for_obj_ptr=True)."""
        v = vars_["model"]
        masks, iou, obj, tok = self._decode(v, embed, skips, points, labels,
                                            multimask)
        is_obj = obj > 0.0                                    # (B, 1)
        masks = jnp.where(is_obj[..., None, None], masks, NO_OBJ_SCORE)
        if multimask:
            best = jnp.argmax(iou, axis=-1)
            masks = jnp.take_along_axis(masks, best[:, None, None, None], 1)
            iou = jnp.take_along_axis(iou, best[:, None], 1)
        obj_ptr = self.obj_ptr_proj.apply(vars_["ptr_proj"], tok)
        lam = is_obj.astype(obj_ptr.dtype)
        obj_ptr = lam * obj_ptr + (1.0 - lam) * vars_["no_obj_ptr"]
        return masks, iou, obj, obj_ptr

    def _encode_memory(self, vars_, pix_feat, mask_logits, obj_logits,
                       binarize: bool = False):
        """Predicted mask + raw features -> mem_dim memory map, with the HARD
        occlusion-aware no-object blend — is_obj = (logits > 0), not sigmoid
        (sam.py:822-826). `binarize` matches the video predictor's
        set_binarize(True) on point-interacted frames (predict.py:874,
        sam.py:804-813): (mask > 0) instead of sigmoid."""
        S_img = self.model.img_size
        B = mask_logits.shape[0]
        hi = jax.image.resize(mask_logits.astype(jnp.float32),
                              (B, 1, S_img, S_img), method="bilinear")
        hi = hi[:, 0, :, :, None]                             # (B, S, S, 1)
        prob = (hi > 0).astype(jnp.float32) if binarize else jax.nn.sigmoid(hi)
        mask_for_mem = prob * SIGMOID_SCALE + SIGMOID_BIAS
        mem = self.mem_enc.apply(vars_["mem_enc"], pix_feat, mask_for_mem)
        is_obj = (obj_logits > 0.0).astype(jnp.float32)       # (B, 1)
        mem = mem + (1.0 - is_obj)[..., None, None] * \
            vars_["no_obj_embed_spatial"]
        return mem.reshape(B, -1, MEM_DIM)

    # -- jitted steps -------------------------------------------------------------
    def _cond_step(self, vars_, x, points, labels, bank):
        v = vars_["model"]
        pix, skips = self._encode_raw(v, x)
        embed = pix + v["no_mem_embed"].reshape(1, 1, 1, -1)  # sam.py:759-761
        # 1 click on an init cond frame -> multimask (sam.py:973-981)
        masks, iou, obj, obj_ptr = self._sam_heads(vars_, embed, skips,
                                                   points, labels,
                                                   multimask=True)
        mem = self._encode_memory(vars_, pix, masks, obj, binarize=True)
        bank = write_bank(bank, mem, self._spatial_pos, obj_ptr,
                          jnp.zeros((), jnp.int32), is_cond=True)
        return masks[:, 0], iou[:, 0], obj[:, 0], bank

    def _track_step(self, vars_, x, bank):
        v = vars_["model"]
        B = x.shape[0]
        s, S = self._s, self._s * self._s
        pix, skips = self._encode_raw(v, x)
        cur = pix.reshape(B, S, HIDDEN)
        cur_pos = jnp.broadcast_to(self._cur_pos[None], (B, S, HIDDEN))
        frame_idx = bank["t"]
        memory, mem_pos, k_bias, nptr = read_bank(
            bank, frame_idx, vars_["maskmem_tpos_enc"],
            lambda t: self.ptr_tpos.apply(vars_["ptr_tpos"], t), MEM_DIM)
        cond = self.mem_attn.apply(vars_["mem_attn"], cur, cur_pos, memory,
                                   mem_pos, (s, s), num_obj_ptr_tokens=nptr,
                                   k_bias=k_bias)
        embed = cond.reshape(B, s, s, HIDDEN)
        # propagation decodes promptless: one padding point (label -1);
        # multimask_output_for_tracking=True (build.py:286-289) -> multimask
        # with best-IoU selection even on tracked frames
        pts = jnp.zeros((B, 1, 2), jnp.float32)
        lbl = jnp.full((B, 1), -1, jnp.int32)
        masks, iou, obj, obj_ptr = self._sam_heads(vars_, embed, skips, pts,
                                                   lbl, multimask=True)
        mem = self._encode_memory(vars_, pix, masks, obj)
        bank = write_bank(bank, mem, self._spatial_pos, obj_ptr, frame_idx,
                          is_cond=False)
        return masks[:, 0], iou[:, 0], obj[:, 0], bank

    # -- host API -------------------------------------------------------------
    def reset(self):
        self.bank = None

    def _prep(self, frame: np.ndarray):
        im, r = self.model.preprocess_np(frame)
        return jnp.asarray(im), r

    def add_prompt(self, frame: np.ndarray, points, labels):
        """Prompt the object on a conditioning frame; starts/joins the video.
        points: (N, 2) pixel coords in the original frame; labels: (N,)."""
        if self.variables is None:
            self.init()
        x, r = self._prep(frame)
        pts = jnp.asarray(np.asarray(points, np.float32) * r)[None]
        lbl = jnp.asarray(np.asarray(labels, np.int32))[None]
        if self.bank is None:
            self.bank = init_bank(x.shape[0], self._s * self._s, MEM_DIM,
                                  HIDDEN, self.num_maskmem, self.max_obj_ptrs)
        key = ("cond", x.shape, pts.shape)
        if key not in self._jit:
            self._jit[key] = jax.jit(self._cond_step, donate_argnums=(4,))
        mask, iou, obj, self.bank = self._jit[key](self.variables, x, pts,
                                                   lbl, self.bank)
        return self._post(mask, frame.shape[:2], r), float(iou[0]), float(obj[0])

    def track(self, frame: np.ndarray):
        """Propagate the tracked object onto the next frame."""
        assert self.bank is not None, "call add_prompt() first"
        x, r = self._prep(frame)
        key = ("track", x.shape)
        if key not in self._jit:
            self._jit[key] = jax.jit(self._track_step, donate_argnums=(2,))
        mask, iou, obj, self.bank = self._jit[key](self.variables, x, self.bank)
        return self._post(mask, frame.shape[:2], r), float(iou[0]), float(obj[0])

    def _post(self, mask_logits, orig_hw: Tuple[int, int], r: float):
        """Decoder-res logits -> boolean mask at original frame resolution."""
        import cv2

        m = np.asarray(mask_logits[0], np.float32)
        S = self.model.img_size
        m = cv2.resize(m, (S, S), interpolation=cv2.INTER_LINEAR)
        h0, w0 = orig_hw
        m = m[: round(h0 * r), : round(w0 * r)]
        m = cv2.resize(m, (w0, h0), interpolation=cv2.INTER_LINEAR)
        return m > 0.0
