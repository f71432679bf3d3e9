"""SAM family: numerical parity vs the reference torch implementation with
SHARED weights (the gold-standard correctness proof — reference modules are
built in-process with random init, converted via models/sam/convert.py), plus
predictor / everything-mode behavior.

Small dims (img 64, embed 64, depth 2) keep CPU runtime sane; every code path
(windowed + global attention, rel-pos, prompt padding, two-way transformer,
mask upscaling) traces identically to the 1024² production config.
"""

import numpy as np
import pytest

import tests.reference_shim as shim

HAVE_REF = shim.install()


def _small_ref_sam():
    """Reference SAMModel at test dims (mirrors reference build.py:122)."""
    from functools import partial

    import torch
    from ultralytics.models.sam.modules.decoders import MaskDecoder
    from ultralytics.models.sam.modules.encoders import (ImageEncoderViT,
                                                         PromptEncoder)
    from ultralytics.models.sam.modules.sam import SAMModel
    from ultralytics.models.sam.modules.transformer import TwoWayTransformer

    torch.manual_seed(0)
    enc = ImageEncoderViT(
        img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        mlp_ratio=4, out_chans=256, qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
        use_rel_pos=True, global_attn_indexes=[1], window_size=4)
    # The reference forward rescales pos_embed by img_size/1024 even though
    # __init__ already sized it for img_size (encoders.py:153-158) — at 64²
    # that computes a 0-sized interpolation. Pinning img_size=1024 skips the
    # rescale; the 4x4 pos_embed then adds directly, matching our encoder.
    enc.img_size = 1024
    pe = PromptEncoder(embed_dim=256, image_embedding_size=(4, 4),
                       input_image_size=(64, 64), mask_in_chans=16)
    dec = MaskDecoder(
        num_multimask_outputs=3,
        transformer=TwoWayTransformer(depth=2, embedding_dim=256,
                                      mlp_dim=2048, num_heads=8),
        transformer_dim=256, iou_head_depth=3, iou_head_hidden_dim=256)
    # randomize embeddings/tables that init to zeros so parity is non-trivial
    with torch.no_grad():
        for m in (enc, pe, dec):
            for p in m.parameters():
                if p.abs().sum() == 0:
                    p.normal_(0, 0.02)
    return SAMModel(image_encoder=enc, prompt_encoder=pe, mask_decoder=dec,
                    pixel_mean=[123.675, 116.28, 103.53],
                    pixel_std=[58.395, 57.12, 57.375])


@pytest.fixture(scope="module")
def pair():
    if not HAVE_REF:
        pytest.skip("reference package unavailable")
    from yolo_sod_tpu.models.sam.convert import convert_sam
    from yolo_sod_tpu.models.sam.model import SAMModel

    ref = _small_ref_sam()
    ours = SAMModel(img_size=64, embed_dim=64, depth=2, num_heads=2,
                    global_attn_indexes=(1,), window_size=4)
    ours.variables = convert_sam(ref, depth=2)
    return ref, ours


def test_image_encoder_parity(pair):
    import jax.numpy as jnp
    import torch

    ref, ours = pair
    x = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref.image_encoder(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = ours.encode_image(ours.variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want.detach().numpy(), atol=2e-4, rtol=1e-3)


def test_prompt_encoder_parity_points_and_boxes(pair):
    """Our unified (points+labels) row form must equal the reference's
    separate points/boxes path, incl. the pad point."""
    import jax.numpy as jnp
    import torch

    ref, ours = pair
    pts = np.array([[[10.0, 20.0], [40.0, 8.0]]], np.float32)
    lbl = np.array([[1, 0]], np.int32)
    box = np.array([[5.0, 6.0, 50.0, 40.0]], np.float32)

    # case 1: points only (reference pads with a -1 point)
    with torch.no_grad():
        sp_ref, dn_ref = ref.prompt_encoder(
            points=(torch.from_numpy(pts), torch.from_numpy(lbl)),
            boxes=None, masks=None)
    rows_p = np.concatenate([pts, np.zeros((1, 1, 2), np.float32)], 1)
    rows_l = np.concatenate([lbl, -np.ones((1, 1), np.int32)], 1)
    sp, dn = ours.prompt_encoder.apply(
        ours.variables["prompt"], jnp.asarray(rows_p), jnp.asarray(rows_l))
    np.testing.assert_allclose(np.asarray(sp), sp_ref.detach().numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dn).transpose(0, 3, 1, 2),
                               dn_ref.detach().numpy(), atol=1e-5, rtol=1e-4)

    # case 2: points + box (corners are label-2/3 points, no pad)
    with torch.no_grad():
        sp_ref2, _ = ref.prompt_encoder(
            points=(torch.from_numpy(pts), torch.from_numpy(lbl)),
            boxes=torch.from_numpy(box), masks=None)
    rows_p2 = np.concatenate([pts, box.reshape(1, 2, 2)], 1)
    rows_l2 = np.concatenate([lbl, np.array([[2, 3]], np.int32)], 1)
    sp2, _ = ours.prompt_encoder.apply(
        ours.variables["prompt"], jnp.asarray(rows_p2), jnp.asarray(rows_l2))
    # reference concats [points+pad? no pad when boxes given..., corners]
    np.testing.assert_allclose(np.asarray(sp2), sp_ref2.detach().numpy(),
                               atol=1e-5, rtol=1e-4)


def test_mask_decoder_parity(pair):
    import jax.numpy as jnp
    import torch

    ref, ours = pair
    rng = np.random.default_rng(1)
    feat = rng.standard_normal((1, 4, 4, 256)).astype(np.float32)
    sparse = rng.standard_normal((1, 3, 256)).astype(np.float32)
    dense = rng.standard_normal((1, 4, 4, 256)).astype(np.float32)
    with torch.no_grad():
        pe_t = ref.prompt_encoder.get_dense_pe()
        m_ref, iou_ref = ref.mask_decoder(
            image_embeddings=torch.from_numpy(feat.transpose(0, 3, 1, 2)),
            image_pe=pe_t,
            sparse_prompt_embeddings=torch.from_numpy(sparse),
            dense_prompt_embeddings=torch.from_numpy(dense.transpose(0, 3, 1, 2)),
            multimask_output=True)
    img_pe = ours.prompt_encoder.apply(ours.variables["prompt"],
                                       method="get_dense_pe")
    m, iou = ours.mask_decoder.apply(
        ours.variables["decoder"], jnp.asarray(feat), img_pe,
        jnp.asarray(sparse), jnp.asarray(dense), multimask_output=True)
    np.testing.assert_allclose(np.asarray(iou), iou_ref.detach().numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(m), m_ref.detach().numpy(),
                               atol=5e-4, rtol=1e-2)


def test_end_to_end_prompt_parity(pair):
    """Full image → features → point prompt → mask logits, both stacks."""
    import jax.numpy as jnp
    import torch

    ref, ours = pair
    rng = np.random.default_rng(2)
    img = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    pts = np.array([[[30.0, 30.0]]], np.float32)
    lbl = np.array([[1]], np.int32)
    with torch.no_grad():
        f_t = ref.image_encoder(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        sp, dn = ref.prompt_encoder(
            points=(torch.from_numpy(pts), torch.from_numpy(lbl)),
            boxes=None, masks=None)
        m_ref, iou_ref = ref.mask_decoder(
            image_embeddings=f_t, image_pe=ref.prompt_encoder.get_dense_pe(),
            sparse_prompt_embeddings=sp, dense_prompt_embeddings=dn,
            multimask_output=False)
    feats = ours.encode_image(ours.variables, jnp.asarray(img))
    rows_p = np.concatenate([pts, np.zeros((1, 1, 2), np.float32)], 1)
    rows_l = np.concatenate([lbl, -np.ones((1, 1), np.int32)], 1)
    m, iou = ours.decode(ours.variables, feats, jnp.asarray(rows_p),
                         jnp.asarray(rows_l))
    np.testing.assert_allclose(np.asarray(iou), iou_ref.detach().numpy(),
                               atol=1e-3, rtol=1e-2)
    # mask logits agree; compare where the reference is decisive
    np.testing.assert_allclose(np.asarray(m), m_ref.detach().numpy(),
                               atol=2e-3, rtol=5e-2)
    agree = (np.asarray(m) > 0) == (m_ref.detach().numpy() > 0)
    assert agree.mean() > 0.99


# ----------------------------------------------------------- predictor API --

@pytest.fixture(scope="module")
def small_sam():
    from yolo_sod_tpu.models.sam import SAM

    return SAM("sam_b", img_size=64, embed_dim=64, depth=2, num_heads=2,
               global_attn_indexes=(1,), window_size=4)


def test_sam_prompted_predict(small_sam):
    img = (np.random.default_rng(0).random((48, 60, 3)) * 255).astype(np.uint8)
    res = small_sam(img, points=[[30, 24]], labels=[1])
    assert len(res) == 1
    r = res[0]
    assert r.masks is not None and r.masks.data.shape[1:] == (48, 60)
    assert len(r.boxes) == len(r.masks.data)

    res2 = small_sam(img, bboxes=[[5, 5, 40, 40], [10, 10, 55, 45]])
    assert len(res2[0]) == 2                   # one mask per box prompt


def test_sam_everything_mode(small_sam):
    img = (np.random.default_rng(1).random((48, 60, 3)) * 255).astype(np.uint8)
    res = small_sam(img, points_stride=4, conf=0.0)
    r = res[0]
    # untrained model: just contract checks — masks/boxes/scores aligned
    assert r.masks is None or len(r.masks.data) == len(r.boxes)


def test_amg_helpers():
    import jax.numpy as jnp

    from yolo_sod_tpu.models.sam import amg

    g = amg.build_point_grid(4)
    assert g.shape == (16, 2) and g.min() > 0 and g.max() < 1
    m = np.zeros((2, 8, 8), bool)
    m[0, 2:5, 3:7] = True
    boxes = np.asarray(amg.batched_mask_to_box(jnp.asarray(m)))
    np.testing.assert_allclose(boxes[0], [3, 2, 7, 5])
    np.testing.assert_allclose(boxes[1], [0, 0, 0, 0])
    logits = jnp.where(jnp.asarray(m), 5.0, -5.0)
    s = np.asarray(amg.calculate_stability_score(logits, 0.0, 0.95))
    np.testing.assert_allclose(s[0], 1.0)
    keep = amg.nms_greedy(np.array([[0, 0, 10, 10], [1, 1, 10, 10],
                                    [20, 20, 30, 30.0]]),
                          np.array([0.9, 0.8, 0.7]), 0.5)
    assert list(keep) == [0, 2]


# ----------------------------------------------------------- MobileSAM -----

def test_tiny_vit_parity():
    """MobileSAM's TinyViT encoder vs the reference with shared weights."""
    if not HAVE_REF:
        pytest.skip("reference package unavailable")
    import jax.numpy as jnp
    import torch
    from ultralytics.models.sam.modules.tiny_encoder import TinyViT as RefTinyViT

    from yolo_sod_tpu.models.sam.convert import convert_tiny_vit
    from yolo_sod_tpu.models.sam.tiny_encoder import TinyViT

    torch.manual_seed(0)
    ref = RefTinyViT(img_size=64, in_chans=3, embed_dims=(16, 32, 40, 320),
                     depths=(1, 1, 2, 1), num_heads=(1, 2, 2, 4),
                     window_sizes=(4, 4, 7, 4), drop_path_rate=0.0)
    with torch.no_grad():
        for p in ref.parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)
    # eval() AFTER randomizing: the reference caches `ab` attention biases at
    # train(False) time (tiny_encoder.py:456-462) — randomizing afterwards
    # would leave the forward on stale zero biases.
    ref = ref.eval()

    ours = TinyViT(img_size=64, embed_dims=(16, 32, 40, 320),
                   depths=(1, 1, 2, 1), num_heads=(1, 2, 2, 4),
                   window_sizes=(4, 4, 7, 4))
    variables = convert_tiny_vit(ref.state_dict(), depths=(1, 1, 2, 1))
    x = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = ours.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want.detach().numpy(), atol=5e-4, rtol=1e-2)


def test_mobile_sam_builds_and_prompts():
    from yolo_sod_tpu.models.sam import SAM

    sam = SAM("mobile_sam", img_size=64)
    img = (np.random.default_rng(2).random((48, 60, 3)) * 255).astype(np.uint8)
    res = sam(img, points=[[30, 24]])
    assert len(res) == 1 and res[0].masks.data.shape[1:] == (48, 60)


# ----------------------------------------------------------------- SAM2 -----

def test_torch_bicubic_matrix_matches_torch():
    import torch

    from yolo_sod_tpu.models.sam.sam2 import torch_bicubic_matrix

    x = np.random.default_rng(0).standard_normal((1, 3, 14, 14)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(37, 23), mode="bicubic",
        align_corners=False).numpy()
    Wh = torch_bicubic_matrix(14, 37)
    Ww = torch_bicubic_matrix(14, 23)
    got = np.einsum("hH,bcHW,wW->bchw", Wh, x, Ww)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def _small_ref_sam2():
    """Reference SAM2 image-path pieces at test dims (build.py:_build_sam2
    shape, without the video memory stack)."""
    from types import SimpleNamespace

    import torch
    from ultralytics.models.sam.modules.blocks import SAM2TwoWayTransformer
    from ultralytics.models.sam.modules.decoders import SAM2MaskDecoder
    from ultralytics.models.sam.modules.encoders import (FpnNeck, Hiera,
                                                         ImageEncoder,
                                                         PromptEncoder)

    torch.manual_seed(0)
    trunk = Hiera(embed_dim=16, num_heads=1, stages=(1, 1, 2, 1),
                  global_att_blocks=(3,), window_spec=(4, 4, 4, 4),
                  window_pos_embed_bkg_spatial_size=(16, 16))
    neck = FpnNeck(d_model=256, backbone_channel_list=[128, 64, 32, 16],
                   fpn_top_down_levels=[2, 3], fpn_interp_model="nearest")
    image_encoder = ImageEncoder(trunk=trunk, neck=neck, scalp=1)
    prompt = PromptEncoder(embed_dim=256, image_embedding_size=(4, 4),
                           input_image_size=(64, 64), mask_in_chans=16)
    decoder = SAM2MaskDecoder(
        num_multimask_outputs=3,
        transformer=SAM2TwoWayTransformer(depth=2, embedding_dim=256,
                                          mlp_dim=2048, num_heads=8),
        transformer_dim=256, use_high_res_features=True,
        iou_prediction_use_sigmoid=True, pred_obj_scores=True,
        pred_obj_scores_mlp=True, use_multimask_token_for_obj_ptr=True,
        dynamic_multimask_via_stability=True,
        dynamic_multimask_stability_delta=0.05,
        dynamic_multimask_stability_thresh=0.98)
    mods = SimpleNamespace(image_encoder=image_encoder,
                           sam_prompt_encoder=prompt,
                           sam_mask_decoder=decoder,
                           no_mem_embed=torch.randn(1, 1, 256) * 0.02)
    with torch.no_grad():
        for m in (image_encoder, prompt, decoder):
            for p in m.parameters():
                if p.abs().sum() == 0:
                    p.normal_(0, 0.02)
    image_encoder.eval(), prompt.eval(), decoder.eval()
    return mods


@pytest.fixture(scope="module")
def sam2_pair():
    if not HAVE_REF:
        pytest.skip("reference package unavailable")
    from yolo_sod_tpu.models.sam.convert import convert_sam2
    from yolo_sod_tpu.models.sam.sam2 import SAM2Model

    ref = _small_ref_sam2()
    ours = SAM2Model(variant="custom", img_size=64, embed_dim=16,
                     stages=(1, 1, 2, 1), num_heads=1,
                     global_att_blocks=(3,), window_spec=(4, 4, 4, 4),
                     window_pos_embed_bkg_spatial_size=(16, 16))
    ours.variables = convert_sam2(ref, trunk_depth=5)
    return ref, ours


def _ref_sam2_features(ref, x_t):
    import torch

    with torch.no_grad():
        out = ref.image_encoder(x_t)
        fpn = out["backbone_fpn"]
        fpn[0] = ref.sam_mask_decoder.conv_s0(fpn[0])
        fpn[1] = ref.sam_mask_decoder.conv_s1(fpn[1])
        # (1, 1, C) no-mem embed broadcast over the NCHW spatial map
        embed = fpn[2] + ref.no_mem_embed.permute(0, 2, 1)[..., None]
    return fpn[0], fpn[1], embed


def test_sam2_encoder_parity(sam2_pair):
    import jax.numpy as jnp
    import torch

    ref, ours = sam2_pair
    x = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32)
    s0_t, s1_t, emb_t = _ref_sam2_features(
        ref, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    feats = ours.encode_image(ours.variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(feats["high_res_feats"][0]).transpose(0, 3, 1, 2),
        s0_t.detach().numpy(), atol=5e-4, rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(feats["high_res_feats"][1]).transpose(0, 3, 1, 2),
        s1_t.detach().numpy(), atol=5e-4, rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(feats["image_embed"]).transpose(0, 3, 1, 2),
        emb_t.detach().numpy(), atol=5e-4, rtol=1e-2)


def test_sam2_end_to_end_prompt_parity(sam2_pair):
    import jax.numpy as jnp
    import torch

    ref, ours = sam2_pair
    x = np.random.default_rng(1).standard_normal((1, 64, 64, 3)).astype(np.float32)
    pts = np.array([[[30.0, 30.0]]], np.float32)
    lbl = np.array([[1]], np.int32)
    s0_t, s1_t, emb_t = _ref_sam2_features(
        ref, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        sp, dn = ref.sam_prompt_encoder(
            points=(torch.from_numpy(pts), torch.from_numpy(lbl)),
            boxes=None, masks=None)
        for multi in (True, False):
            m_ref, iou_ref, _, _ = ref.sam_mask_decoder(
                image_embeddings=emb_t,
                image_pe=ref.sam_prompt_encoder.get_dense_pe(),
                sparse_prompt_embeddings=sp, dense_prompt_embeddings=dn,
                multimask_output=multi, repeat_image=False,
                high_res_features=[s0_t, s1_t])
            feats = ours.encode_image(ours.variables, jnp.asarray(x))
            rows_p = np.concatenate([pts, np.zeros((1, 1, 2), np.float32)], 1)
            rows_l = np.concatenate([lbl, -np.ones((1, 1), np.int32)], 1)
            m, iou = ours.decode(ours.variables, feats, jnp.asarray(rows_p),
                                 jnp.asarray(rows_l), multimask_output=multi)
            np.testing.assert_allclose(np.asarray(iou),
                                       iou_ref.detach().numpy(),
                                       atol=2e-3, rtol=2e-2)
            agree = (np.asarray(m) > 0) == (m_ref.detach().numpy() > 0)
            assert agree.mean() > 0.99, f"multi={multi}"


def test_sam2_facade_prompts():
    from yolo_sod_tpu.models.sam import SAM

    sam = SAM("sam2_t", img_size=64, embed_dim=16, stages=(1, 1, 1, 1),
              global_att_blocks=(2,), window_spec=(4, 4, 4, 4),
              window_pos_embed_bkg_spatial_size=(4, 4))
    img = (np.random.default_rng(3).random((48, 60, 3)) * 255).astype(np.uint8)
    res = sam(img, bboxes=[[5, 5, 40, 40], [10, 8, 55, 45]])
    r = res[0]
    assert len(r) == 2 and r.masks.data.shape[1:] == (48, 60)
