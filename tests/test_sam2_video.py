"""SAM2 video memory stack: RoPE math parity vs the torch reference, bank
ring-buffer semantics, and end-to-end streaming propagation.

Reference targets: modules/utils.py:74-123 (axial RoPE), modules/sam.py:
620-783 (memory conditioning), sam/predict.py SAM2VideoPredictor.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_sod_tpu.models.sam.memory import (NEG_INF, apply_rope,
                                            axial_rope_angles, init_bank,
                                            read_bank, sine_pos_2d,
                                            write_bank)

from tests import reference_shim as shim

HAVE_REF = shim.install()


# ---------------------------------------------------------------------------
# RoPE math parity
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not HAVE_REF, reason="reference package unavailable")
def test_axial_rope_matches_reference():
    import torch
    from ultralytics.models.sam.modules.utils import (apply_rotary_enc,
                                                      compute_axial_cis)

    h = w = 4
    hd = 32
    rng = np.random.default_rng(0)
    q = rng.standard_normal((1, 1, h * w, hd)).astype(np.float32)
    k = rng.standard_normal((1, 1, h * w, hd)).astype(np.float32)

    cis = compute_axial_cis(dim=hd, end_x=w, end_y=h)
    q_t, k_t = apply_rotary_enc(torch.from_numpy(q), torch.from_numpy(k),
                                freqs_cis=cis)

    ang = jnp.asarray(axial_rope_angles(h, w, hd))
    q_j = apply_rope(jnp.asarray(q), ang)
    k_j = apply_rope(jnp.asarray(k), ang)
    np.testing.assert_allclose(np.asarray(q_j), q_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_j), k_t.numpy(), atol=1e-5)


@pytest.mark.skipif(not HAVE_REF, reason="reference package unavailable")
def test_rope_k_repeat_matches_reference():
    import torch
    from ultralytics.models.sam.modules.utils import (apply_rotary_enc,
                                                      compute_axial_cis)

    h = w = 4
    hd = 16
    reps = 3
    rng = np.random.default_rng(1)
    q = rng.standard_normal((1, 1, h * w, hd)).astype(np.float32)
    k = rng.standard_normal((1, 1, reps * h * w, hd)).astype(np.float32)

    cis = compute_axial_cis(dim=hd, end_x=w, end_y=h)
    _, k_t = apply_rotary_enc(torch.from_numpy(q), torch.from_numpy(k),
                              freqs_cis=cis, repeat_freqs_k=True)

    ang = jnp.asarray(axial_rope_angles(h, w, hd))
    k_j = apply_rope(jnp.asarray(k), jnp.tile(ang, (reps, 1)))
    np.testing.assert_allclose(np.asarray(k_j), k_t.numpy(), atol=1e-5)


@pytest.mark.skipif(not HAVE_REF, reason="reference package unavailable")
def test_sine_pe_1d_matches_reference():
    import torch
    from ultralytics.models.sam.modules.utils import get_1d_sine_pe

    from yolo_sod_tpu.models.sam.memory import sine_pe_1d

    t = np.asarray([0.0, 0.25, 1.0, 7.0], np.float32)
    ref = get_1d_sine_pe(torch.from_numpy(t), dim=64)
    ours = sine_pe_1d(jnp.asarray(t), 64)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


@pytest.mark.skipif(not HAVE_REF, reason="reference package unavailable")
def test_sine_pos_matches_reference():
    import torch
    from ultralytics.models.sam.modules.blocks import PositionEmbeddingSine

    pe = PositionEmbeddingSine(num_pos_feats=64)
    ref = pe(torch.zeros(1, 64, 6, 5))           # (1, 64, 6, 5) NCHW
    ours = sine_pos_2d(6, 5, 64).reshape(6, 5, 64).transpose(2, 0, 1)
    np.testing.assert_allclose(ours, ref[0].numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# Bank semantics
# ---------------------------------------------------------------------------

def test_bank_ring_buffer_semantics():
    S, D, N = 4, 8, 4          # 4 tokens, mem_dim 8, 4 slots
    bank = init_bank(1, S, D, hidden_dim=16, num_maskmem=N, max_obj_ptrs=3)
    mk = lambda v: jnp.full((1, S, D), float(v))
    pos = jnp.zeros((S, D))
    ptr = jnp.zeros((1, 16))

    bank = write_bank(bank, mk(100), pos, ptr, jnp.asarray(0), is_cond=True)
    assert int(bank["frame_idx"][0]) == 0 and int(bank["t"]) == 1
    # 5 tracked frames through 3 non-cond slots: slots 1,2,3,1,2
    for f in range(1, 6):
        bank = write_bank(bank, mk(f), pos, ptr, jnp.asarray(f), is_cond=False)
    assert int(bank["frame_idx"][0]) == 0          # cond never evicted
    assert list(np.asarray(bank["frame_idx"][1:])) == [4, 5, 3]
    assert float(bank["feats"][0, 1, 0, 0]) == 4.0
    # obj-ptr ring wraps over 3 slots: last writes win
    assert sorted(np.asarray(bank["ptr_frame_idx"]).tolist()) == [3, 4, 5]


def test_read_bank_masks_empty_slots():
    S, D, N = 4, 8, 4
    bank = init_bank(1, S, D, hidden_dim=16, num_maskmem=N, max_obj_ptrs=3)
    bank = write_bank(bank, jnp.ones((1, S, D)), jnp.zeros((S, D)),
                      jnp.zeros((1, 16)), jnp.asarray(0), is_cond=True)
    tpos = jnp.zeros((N, D))
    mem, pos, bias, nptr = read_bank(bank, jnp.asarray(1), tpos,
                                     lambda t: jnp.zeros((3, D)), D)
    assert mem.shape == (1, N * S + 3 * 2, D)     # 16/8 = 2 tokens per ptr
    assert nptr == 6
    b = np.asarray(bias[0])
    assert (b[:S] == 0).all()                      # cond slot attendable
    assert (b[S:N * S] == NEG_INF).all()           # empty slots masked
    assert (b[N * S:N * S + 2] == 0).all()         # 1 valid ptr -> 2 tokens
    assert (b[N * S + 2:] == NEG_INF).all()


def test_read_bank_temporal_encoding_indices():
    """Cond slot gets enc[n-1]; a frame t_rel back gets enc[t_rel-1]
    (reference maskmem_tpos_enc index algebra, sam.py:693-696)."""
    S, D, N = 2, 4, 4
    bank = init_bank(1, S, D, hidden_dim=8, num_maskmem=N, max_obj_ptrs=2)
    z = jnp.zeros((S, D))
    bank = write_bank(bank, jnp.zeros((1, S, D)), z, jnp.zeros((1, 8)),
                      jnp.asarray(0), is_cond=True)
    bank = write_bank(bank, jnp.zeros((1, S, D)), z, jnp.zeros((1, 8)),
                      jnp.asarray(1), is_cond=False)
    tpos = jnp.arange(N, dtype=jnp.float32)[:, None] * jnp.ones((N, D))
    _, pos, _, _ = read_bank(bank, jnp.asarray(2), tpos,
                             lambda t: jnp.zeros((2, D)), D)
    p = np.asarray(pos[0])
    assert (p[:S] == N - 1).all()                  # cond -> enc[3]
    assert (p[S:2 * S] == 0).all()                 # t_rel=1 -> enc[0]


# ---------------------------------------------------------------------------
# End-to-end streaming propagation
# ---------------------------------------------------------------------------

def _square_frame(cx: int, cy: int, size: int = 64, half: int = 9):
    img = np.full((size, size, 3), 30, np.uint8)
    img[max(0, cy - half):cy + half, max(0, cx - half):cx + half] = 220
    return img


def test_video_predictor_streams_one_compiled_graph():
    from yolo_sod_tpu.models.sam.sam2 import SAM2Model
    from yolo_sod_tpu.models.sam.video import SAM2VideoPredictor

    model = SAM2Model(variant="custom", img_size=64, embed_dim=16,
                      stages=(1, 1, 2, 1), num_heads=1,
                      global_att_blocks=(3,), window_spec=(4, 4, 4, 4),
                      window_pos_embed_bkg_spatial_size=(16, 16))
    model.init()
    vp = SAM2VideoPredictor(model)
    vp.init(jax.random.PRNGKey(0))

    mask, iou, obj = vp.add_prompt(_square_frame(32, 32),
                                   points=[[32, 32]], labels=[1])
    assert mask.shape == (64, 64) and mask.dtype == bool
    assert np.isfinite(iou) and np.isfinite(obj)
    assert int(vp.bank["t"]) == 1

    # 8 tracked frames: bank ring wraps (6 non-cond slots), ONE compiled
    # track graph serves every frame (static shapes by design).
    for f in range(1, 9):
        m, iou, obj = vp.track(_square_frame(32 + 2 * f, 32))
        assert m.shape == (64, 64)
        assert np.isfinite(iou) and np.isfinite(obj)
    assert int(vp.bank["t"]) == 9
    assert int(vp.bank["frame_idx"][0]) == 0       # cond frame persists
    assert (np.asarray(vp.bank["frame_idx"][1:]) > 0).all()
    track_keys = [k for k in vp._jit if k[0] == "track"]
    assert len(track_keys) == 1

    # reset() starts a fresh object
    vp.reset()
    assert vp.bank is None


def test_sam_facade_video_tracking():
    """SAM('sam2_*').track(...) routes to the video predictor (reference
    exposes SAM2VideoPredictor through the same models.sam namespace)."""
    from yolo_sod_tpu.models.sam import SAM, SAM2VideoPredictor

    sam = SAM("sam2_t", img_size=64, embed_dim=16, stages=(1, 1, 2, 1),
              num_heads=1, global_att_blocks=(3,), window_spec=(4, 4, 4, 4),
              window_pos_embed_bkg_spatial_size=(16, 16))
    # first call without points is an error
    with pytest.raises(ValueError, match="points"):
        sam.track(_square_frame(32, 32))
    mask, iou, obj = sam.track(_square_frame(32, 32), points=[[32, 32]])
    assert isinstance(sam.video_predictor, SAM2VideoPredictor)
    assert mask.shape == (64, 64)
    m2, iou2, obj2 = sam.track(_square_frame(34, 32))
    assert m2.shape == (64, 64) and np.isfinite(iou2)
    sam.reset_video()
    assert sam.video_predictor.bank is None
    # SAM1 variants have no memory stack
    with pytest.raises(ValueError, match="SAM2"):
        SAM("sam_b", img_size=64).track(_square_frame(1, 1))


# ---------------------------------------------------------------------------
# Shared-weight torch parity: MemoryAttention / MemoryEncoder
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not HAVE_REF, reason="reference package unavailable")
def test_memory_attention_torch_parity():
    import torch
    from ultralytics.models.sam.modules.memory_attention import (
        MemoryAttention as RefMA, MemoryAttentionLayer as RefLayer)

    from yolo_sod_tpu.models.sam.convert import convert_memory_attention
    from yolo_sod_tpu.models.sam.memory import MemoryAttention

    torch.manual_seed(0)
    ref = RefMA(d_model=256, pos_enc_at_input=True,
                layer=RefLayer(), num_layers=2).eval()

    s, S = 4, 16                      # square current grid (RoPE recompute)
    n_spatial, n_ptr = 2 * S, 4       # 2 memory frames + 4 ptr tokens
    rng = np.random.default_rng(0)
    curr = rng.standard_normal((S, 1, 256)).astype(np.float32)
    cpos = rng.standard_normal((S, 1, 256)).astype(np.float32)
    mem = rng.standard_normal((n_spatial + n_ptr, 1, 64)).astype(np.float32)
    mpos = rng.standard_normal((n_spatial + n_ptr, 1, 64)).astype(np.float32)

    with torch.no_grad():
        out_t = ref(torch.from_numpy(curr), torch.from_numpy(mem),
                    torch.from_numpy(cpos), torch.from_numpy(mpos),
                    num_obj_ptr_tokens=n_ptr)          # (S, 1, 256)

    ours = MemoryAttention(d_model=256, num_layers=2, kv_in_dim=64)
    variables = convert_memory_attention(ref, num_layers=2)
    out_j = ours.apply(variables,
                       jnp.asarray(curr.transpose(1, 0, 2)),
                       jnp.asarray(cpos.transpose(1, 0, 2)),
                       jnp.asarray(mem.transpose(1, 0, 2)),
                       jnp.asarray(mpos.transpose(1, 0, 2)),
                       (s, s), num_obj_ptr_tokens=n_ptr)
    np.testing.assert_allclose(np.asarray(out_j)[0],
                               out_t.numpy().transpose(1, 0, 2)[0],
                               atol=2e-4, rtol=1e-3)


@pytest.mark.skipif(not HAVE_REF, reason="reference package unavailable")
def test_memory_encoder_torch_parity():
    import torch
    from ultralytics.models.sam.modules.encoders import MemoryEncoder as RefME

    from yolo_sod_tpu.models.sam.convert import convert_memory_encoder
    from yolo_sod_tpu.models.sam.memory import MemoryEncoder

    torch.manual_seed(1)
    ref = RefME(out_dim=64).eval()
    rng = np.random.default_rng(2)
    pix = rng.standard_normal((1, 256, 8, 8)).astype(np.float32)
    mask = rng.standard_normal((1, 1, 128, 128)).astype(np.float32)

    with torch.no_grad():
        out = ref(torch.from_numpy(pix), torch.from_numpy(mask),
                  skip_mask_sigmoid=True)
        feat_t = out["vision_features"].numpy()        # (1, 64, 8, 8)
        pos_t = out["vision_pos_enc"][-1].numpy()      # (1, 64, 8, 8)

    ours = MemoryEncoder(out_dim=64, in_dim=256)
    variables = convert_memory_encoder(ref)
    feat_j = ours.apply(variables,
                        jnp.asarray(pix.transpose(0, 2, 3, 1)),
                        jnp.asarray(mask.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(feat_j).transpose(0, 3, 1, 2),
                               feat_t, atol=2e-4, rtol=1e-3)
    # spatial pos enc of the memory tokens matches the reference's
    np.testing.assert_allclose(
        sine_pos_2d(8, 8, 64).reshape(8, 8, 64).transpose(2, 0, 1),
        pos_t[0], atol=1e-5)


# ---------------------------------------------------------------------------
# FULL video track_step torch parity (shared weights, 1 cond + 2 track frames)
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not HAVE_REF, reason="reference package unavailable")
def test_sam2_video_track_step_torch_parity():
    """End-to-end video parity: the same random frames through the reference
    SAM2Model.track_step chain (forward_image → _prepare_backbone_features →
    track_step with a python output_dict, sam.py:915) and through our jitted
    cond/track steps with a fixed-shape memory bank. Shared weights via
    convert_sam2_video. Asserts mask logits, IoU, object scores, object
    pointers, and encoded memory features agree per frame — this certifies
    the whole memory-conditioning path (RoPE memory attention, temporal
    encodings, obj-ptr tokens, occlusion blends) in one shot."""
    import torch
    from ultralytics.models.sam.modules.encoders import (FpnNeck, Hiera,
                                                         ImageEncoder,
                                                         MemoryEncoder)
    from ultralytics.models.sam.modules.memory_attention import (
        MemoryAttention as RefMA, MemoryAttentionLayer)
    from ultralytics.models.sam.modules.sam import SAM2Model as RefSAM2

    from yolo_sod_tpu.models.sam.convert import convert_sam2_video
    from yolo_sod_tpu.models.sam.sam2 import SAM2Model
    from yolo_sod_tpu.models.sam.video import SAM2VideoPredictor

    torch.manual_seed(0)
    trunk = Hiera(embed_dim=16, num_heads=1, stages=(1, 1, 2, 1),
                  global_att_blocks=(3,), window_spec=(4, 4, 4, 4),
                  window_pos_embed_bkg_spatial_size=(16, 16))
    neck = FpnNeck(d_model=256, backbone_channel_list=[128, 64, 32, 16],
                   fpn_top_down_levels=[2, 3], fpn_interp_model="nearest")
    ref = RefSAM2(
        image_encoder=ImageEncoder(trunk=trunk, neck=neck, scalp=1),
        memory_attention=RefMA(d_model=256, pos_enc_at_input=True,
                               num_layers=4, layer=MemoryAttentionLayer()),
        memory_encoder=MemoryEncoder(out_dim=64),
        num_maskmem=7, image_size=64,
        sigmoid_scale_for_mem_enc=20.0, sigmoid_bias_for_mem_enc=-10.0,
        use_mask_input_as_output_without_sam=True,
        directly_add_no_mem_embed=True, use_high_res_features_in_sam=True,
        multimask_output_in_sam=True, iou_prediction_use_sigmoid=True,
        use_obj_ptrs_in_encoder=True, add_tpos_enc_to_obj_ptrs=True,
        only_obj_ptrs_in_the_past_for_eval=True, pred_obj_scores=True,
        pred_obj_scores_mlp=True, fixed_no_obj_ptr=True,
        multimask_output_for_tracking=True,
        use_multimask_token_for_obj_ptr=True,
        multimask_min_pt_num=0, multimask_max_pt_num=1,
        use_mlp_for_obj_ptr_proj=True, no_obj_embed_spatial=True,
        proj_tpos_enc_in_obj_ptrs=True, use_signed_tpos_enc_to_obj_ptrs=True,
        sam_mask_decoder_extra_args=dict(
            dynamic_multimask_via_stability=True,
            dynamic_multimask_stability_delta=0.05,
            dynamic_multimask_stability_thresh=0.98)).eval()
    ref.binarize_mask_from_pts_for_mem_enc = True   # predict.py:874
    with torch.no_grad():
        for p in ref.parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)

    ours_model = SAM2Model(variant="custom", img_size=64, embed_dim=16,
                           stages=(1, 1, 2, 1), num_heads=1,
                           global_att_blocks=(3,), window_spec=(4, 4, 4, 4),
                           window_pos_embed_bkg_spatial_size=(16, 16))
    vp = SAM2VideoPredictor(ours_model, num_maskmem=7, max_obj_ptrs=16)
    vp.variables = convert_sam2_video(ref, trunk_depth=5)
    ours_model.variables = vp.variables["model"]

    rng = np.random.default_rng(7)
    frames = [rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
              for _ in range(3)]
    pts = np.array([[[30.0, 30.0]]], np.float32)
    lbl = np.array([[1]], np.int32)

    # -- reference drive ----------------------------------------------------
    od = {"cond_frame_outputs": {}, "non_cond_frame_outputs": {}}
    ref_outs = []
    with torch.no_grad():
        for t, x in enumerate(frames):
            xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
            bo = ref.forward_image(xt)
            _, vf, vp_pos, fs = ref._prepare_backbone_features(bo)
            pi = ({"point_coords": torch.from_numpy(pts),
                   "point_labels": torch.from_numpy(lbl)} if t == 0 else None)
            out = ref.track_step(t, t == 0, vf, vp_pos, fs, pi, None, od,
                                 num_frames=16)
            (od["cond_frame_outputs"] if t == 0
             else od["non_cond_frame_outputs"])[t] = out
            ref_outs.append(out)

    # -- our drive ----------------------------------------------------------
    bank = init_bank(1, 16, 64, 256, num_maskmem=7, max_obj_ptrs=16)
    m0, i0, o0, bank = vp._cond_step(vp.variables, jnp.asarray(frames[0]),
                                     jnp.asarray(pts), jnp.asarray(lbl), bank)
    ours_outs = [(m0, i0, o0)]
    for x in frames[1:]:
        m, i, o, bank = vp._track_step(vp.variables, jnp.asarray(x), bank)
        ours_outs.append((m, i, o))

    for t, (ref_out, (m, i, o)) in enumerate(zip(ref_outs, ours_outs)):
        mask_ref = ref_out["pred_masks"][:, 0].numpy()        # (1, 16, 16)
        obj_ref = ref_out["object_score_logits"][:, 0].numpy()
        np.testing.assert_allclose(np.asarray(o), obj_ref,
                                   atol=5e-3, rtol=2e-2, err_msg=f"t={t} obj")
        agree = ((np.asarray(m) > 0) == (mask_ref > 0)).mean()
        assert agree > 0.99, f"t={t} mask sign agreement {agree}"
        np.testing.assert_allclose(np.asarray(m), mask_ref, atol=0.05,
                                   rtol=5e-2, err_msg=f"t={t} mask logits")
        # the memory written for this frame: spatial features + obj pointer
        # live in the bank at deterministic slots (write_bank ring algebra)
        mem_ref = ref_out["maskmem_features"].numpy()         # (1, 64, 4, 4)
        mem_slot = 0 if t == 0 else 1 + (t - 1) % 6
        np.testing.assert_allclose(
            np.asarray(bank["feats"][0, mem_slot]).reshape(4, 4, 64)
            .transpose(2, 0, 1), mem_ref[0],
            atol=5e-3, rtol=2e-2, err_msg=f"t={t} mem")
        ptr_ref = ref_out["obj_ptr"].numpy()                  # (1, 256)
        np.testing.assert_allclose(np.asarray(bank["ptrs"][0, t % 16]),
                                   ptr_ref[0], atol=5e-3, rtol=2e-2,
                                   err_msg=f"t={t} obj_ptr")
