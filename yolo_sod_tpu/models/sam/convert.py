"""Reference-SAM (torch) checkpoint → flax variables.

Maps the reference's state_dict layout (models/sam/build.py checkpoints /
modules constructed in-process) onto models/sam/modules.py parameter trees.
Used both to load real SAM checkpoints and by tests/test_sam.py to prove
numerical parity against the reference implementation with shared weights.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w):  # torch tensor → numpy
    return np.asarray(w.detach().cpu().numpy())


def _conv(w):
    """torch conv (O, I, kh, kw) → flax (kh, kw, I, O)."""
    return _t(w).transpose(2, 3, 1, 0)


def _convT(w):
    """torch ConvTranspose2d (I, O, kh, kw) → flax ConvTranspose (kh, kw, I, O).

    flax's conv_transpose applies the kernel unflipped (it is a fractionally
    strided conv), while torch's is the conv adjoint — spatially flip to
    match (verified numerically)."""
    return _t(w).transpose(2, 3, 0, 1)[::-1, ::-1].copy()


def _lin(w):
    return _t(w).T


def _ln(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]),
            "bias": _t(sd[f"{prefix}.bias"])}


def _ln2d(sd, prefix):
    return {"weight": _t(sd[f"{prefix}.weight"]),
            "bias": _t(sd[f"{prefix}.bias"])}


def _dense(sd, prefix):
    out = {"kernel": _lin(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _attention(sd, prefix):
    """Decoder Attention (q/k/v/out projections)."""
    return {p: _dense(sd, f"{prefix}.{p}") for p in
            ("q_proj", "k_proj", "v_proj", "out_proj")}


def convert_image_encoder(sd: Dict, depth: int) -> Dict:
    """ImageEncoderViT state_dict → flax params (modules.ImageEncoderViT)."""
    p = {
        "patch_embed": {"kernel": _conv(sd["patch_embed.proj.weight"]),
                        "bias": _t(sd["patch_embed.proj.bias"])},
        "neck_0": {"kernel": _conv(sd["neck.0.weight"])},
        "neck_1": _ln2d(sd, "neck.1"),
        "neck_2": {"kernel": _conv(sd["neck.2.weight"])},
        "neck_3": _ln2d(sd, "neck.3"),
    }
    if "pos_embed" in sd:
        p["pos_embed"] = _t(sd["pos_embed"])
    for i in range(depth):
        b = f"blocks.{i}"
        attn = {"qkv": _dense(sd, f"{b}.attn.qkv"),
                "proj": _dense(sd, f"{b}.attn.proj")}
        if f"{b}.attn.rel_pos_h" in sd:
            attn["rel_pos_h"] = _t(sd[f"{b}.attn.rel_pos_h"])
            attn["rel_pos_w"] = _t(sd[f"{b}.attn.rel_pos_w"])
        p[f"blocks_{i}"] = {
            "norm1": _ln(sd, f"{b}.norm1"), "norm2": _ln(sd, f"{b}.norm2"),
            "attn": attn,
            "mlp": {"lin1": _dense(sd, f"{b}.mlp.lin1"),
                    "lin2": _dense(sd, f"{b}.mlp.lin2")},
        }
    return p


def convert_prompt_encoder(sd: Dict) -> Dict:
    """PromptEncoder state_dict → flax params. Embedding row order:
    [not_a_point(-1), neg(0), pos(1), box_tl(2), box_br(3)]
    (modules.PromptEncoder docstring)."""
    rows = [_t(sd["not_a_point_embed.weight"])[0]]
    rows += [_t(sd[f"point_embeddings.{i}.weight"])[0] for i in range(4)]
    return {
        "pe_layer": {"gaussian_matrix":
                     _t(sd["pe_layer.positional_encoding_gaussian_matrix"])},
        "point_embeddings": np.stack(rows),
        "no_mask_embed": _t(sd["no_mask_embed.weight"]),
        "mask_down_0": {"kernel": _conv(sd["mask_downscaling.0.weight"]),
                        "bias": _t(sd["mask_downscaling.0.bias"])},
        "mask_ln_0": _ln2d(sd, "mask_downscaling.1"),
        "mask_down_1": {"kernel": _conv(sd["mask_downscaling.3.weight"]),
                        "bias": _t(sd["mask_downscaling.3.bias"])},
        "mask_ln_1": _ln2d(sd, "mask_downscaling.4"),
        "mask_down_2": {"kernel": _conv(sd["mask_downscaling.6.weight"]),
                        "bias": _t(sd["mask_downscaling.6.bias"])},
    }


def convert_mask_decoder(sd: Dict, depth: int = 2,
                         num_mask_tokens: int = 4) -> Dict:
    """MaskDecoder state_dict → flax params."""

    def twoway_block(b):
        return {
            "self_attn": _attention(sd, f"{b}.self_attn"),
            "cross_attn_token_to_image":
                _attention(sd, f"{b}.cross_attn_token_to_image"),
            "cross_attn_image_to_token":
                _attention(sd, f"{b}.cross_attn_image_to_token"),
            "norm1": _ln(sd, f"{b}.norm1"), "norm2": _ln(sd, f"{b}.norm2"),
            "norm3": _ln(sd, f"{b}.norm3"), "norm4": _ln(sd, f"{b}.norm4"),
            "mlp": {"lin1": _dense(sd, f"{b}.mlp.lin1"),
                    "lin2": _dense(sd, f"{b}.mlp.lin2")},
        }

    def mlp3(prefix, n=3):
        return {f"layers_{i}": _dense(sd, f"{prefix}.layers.{i}")
                for i in range(n)}

    p = {
        "iou_token": _t(sd["iou_token.weight"]),
        "mask_tokens": _t(sd["mask_tokens.weight"]),
        "transformer": {
            **{f"layers_{i}": twoway_block(f"transformer.layers.{i}")
               for i in range(depth)},
            "final_attn_token_to_image":
                _attention(sd, "transformer.final_attn_token_to_image"),
            "norm_final_attn": _ln(sd, "transformer.norm_final_attn"),
        },
        "upscale_0": {"kernel": _convT(sd["output_upscaling.0.weight"]),
                      "bias": _t(sd["output_upscaling.0.bias"])},
        "upscale_ln": _ln2d(sd, "output_upscaling.1"),
        "upscale_1": {"kernel": _convT(sd["output_upscaling.3.weight"]),
                      "bias": _t(sd["output_upscaling.3.bias"])},
        "iou_head": mlp3("iou_prediction_head"),
    }
    for i in range(num_mask_tokens):
        p[f"hyper_{i}"] = mlp3(f"output_hypernetworks_mlps.{i}")
    return p


def _convbn(sd, prefix):
    """Conv2d_BN → (params, batch_stats) for modules.tiny_encoder.ConvBN."""
    params = {"c": {"kernel": _conv(sd[f"{prefix}.c.weight"])},
              "bn": {"scale": _t(sd[f"{prefix}.bn.weight"]),
                     "bias": _t(sd[f"{prefix}.bn.bias"])}}
    stats = {"bn": {"mean": _t(sd[f"{prefix}.bn.running_mean"]),
                    "var": _t(sd[f"{prefix}.bn.running_var"])}}
    return params, stats


def convert_tiny_vit(sd: Dict, depths=(2, 2, 6, 2)) -> Dict:
    """Reference TinyViT state_dict → flax variables (tiny_encoder.TinyViT)."""
    params: Dict = {}
    stats: Dict = {}

    def put(name, prefix):
        p, s = _convbn(sd, prefix)
        params[name], stats[name] = p, s

    put("patch_embed_0", "patch_embed.seq.0")
    put("patch_embed_1", "patch_embed.seq.2")
    for i in range(depths[0]):
        b = f"layers.0.blocks.{i}"
        p = {}
        s = {}
        for cv in ("conv1", "conv2", "conv3"):
            pp, ss = _convbn(sd, f"{b}.{cv}")
            p[cv], s[cv] = pp, ss
        params[f"layer0_block{i}"], stats[f"layer0_block{i}"] = p, s
    for li in range(len(depths)):
        if f"layers.{li}.downsample.conv1.c.weight" in sd:
            p = {}
            s = {}
            for cv in ("conv1", "conv2", "conv3"):
                pp, ss = _convbn(sd, f"layers.{li}.downsample.{cv}")
                p[cv], s[cv] = pp, ss
            params[f"layer{li}_down"], stats[f"layer{li}_down"] = p, s
    for li in range(1, len(depths)):
        for i in range(depths[li]):
            b = f"layers.{li}.blocks.{i}"
            lc_p, lc_s = _convbn(sd, f"{b}.local_conv")
            params[f"layer{li}_block{i}"] = {
                "attn": {"norm": _ln(sd, f"{b}.attn.norm"),
                         "qkv": _dense(sd, f"{b}.attn.qkv"),
                         "proj": _dense(sd, f"{b}.attn.proj"),
                         "attention_biases": _t(sd[f"{b}.attn.attention_biases"])},
                "local_conv": lc_p,
                "mlp_norm": _ln(sd, f"{b}.mlp.norm"),
                "fc1": _dense(sd, f"{b}.mlp.fc1"),
                "fc2": _dense(sd, f"{b}.mlp.fc2"),
            }
            stats[f"layer{li}_block{i}"] = {"local_conv": lc_s}
    params["neck_0"] = {"kernel": _conv(sd["neck.0.weight"])}
    params["neck_1"] = _ln2d(sd, "neck.1")
    params["neck_2"] = {"kernel": _conv(sd["neck.2.weight"])}
    params["neck_3"] = _ln2d(sd, "neck.3")
    return {"params": params, "batch_stats": stats}


def convert_sam(torch_sam, depth: int) -> Dict:
    """Full reference SAMModel → our variables dict."""
    return {
        "encoder": {"params": convert_image_encoder(
            torch_sam.image_encoder.state_dict(), depth)},
        "prompt": {"params": convert_prompt_encoder(
            torch_sam.prompt_encoder.state_dict())},
        "decoder": {"params": convert_mask_decoder(
            torch_sam.mask_decoder.state_dict())},
    }


# ------------------------------------------------------------------- SAM2 --

def convert_hiera(sd: Dict, depth: int) -> Dict:
    """Reference Hiera state_dict → flax params (sam2.Hiera)."""
    p = {
        "patch_embed": {"kernel": _conv(sd["patch_embed.proj.weight"]),
                        "bias": _t(sd["patch_embed.proj.bias"])},
        "pos_embed": _t(sd["pos_embed"]).transpose(0, 2, 3, 1),
        "pos_embed_window": _t(sd["pos_embed_window"]).transpose(0, 2, 3, 1),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        blk = {
            "norm1": _ln(sd, f"{b}.norm1"), "norm2": _ln(sd, f"{b}.norm2"),
            "attn": {"qkv": _dense(sd, f"{b}.attn.qkv"),
                     "proj": _dense(sd, f"{b}.attn.proj")},
            "mlp_0": _dense(sd, f"{b}.mlp.layers.0"),
            "mlp_1": _dense(sd, f"{b}.mlp.layers.1"),
        }
        if f"{b}.proj.weight" in sd:          # dim-growth skip projection
            blk["proj"] = _dense(sd, f"{b}.proj")
        p[f"blocks_{i}"] = blk
    return p


def convert_fpn_neck(sd: Dict, n_levels: int = 4) -> Dict:
    return {f"convs_{j}": {"kernel": _conv(sd[f"convs.{j}.conv.weight"]),
                           "bias": _t(sd[f"convs.{j}.conv.bias"])}
            for j in range(n_levels)}


def convert_sam2_mask_decoder(sd: Dict, num_mask_tokens: int = 4) -> Dict:
    """Reference SAM2MaskDecoder → flax params (sam2.SAM2MaskDecoder).
    The transformer blocks' 2-layer reference MLP maps onto MLPBlock
    (layers.0→lin1, layers.1→lin2; ReLU in both)."""

    def twoway_block(b):
        return {
            "self_attn": _attention(sd, f"{b}.self_attn"),
            "cross_attn_token_to_image":
                _attention(sd, f"{b}.cross_attn_token_to_image"),
            "cross_attn_image_to_token":
                _attention(sd, f"{b}.cross_attn_image_to_token"),
            "norm1": _ln(sd, f"{b}.norm1"), "norm2": _ln(sd, f"{b}.norm2"),
            "norm3": _ln(sd, f"{b}.norm3"), "norm4": _ln(sd, f"{b}.norm4"),
            "mlp": {"lin1": _dense(sd, f"{b}.mlp.layers.0"),
                    "lin2": _dense(sd, f"{b}.mlp.layers.1")},
        }

    def mlp3(prefix, n=3):
        return {f"layers_{i}": _dense(sd, f"{prefix}.layers.{i}")
                for i in range(n)}

    p = {
        "obj_score_token": _t(sd["obj_score_token.weight"]),
        "iou_token": _t(sd["iou_token.weight"]),
        "mask_tokens": _t(sd["mask_tokens.weight"]),
        "transformer": {
            **{f"layers_{i}": twoway_block(f"transformer.layers.{i}")
               for i in range(2)},
            "final_attn_token_to_image":
                _attention(sd, "transformer.final_attn_token_to_image"),
            "norm_final_attn": _ln(sd, "transformer.norm_final_attn"),
        },
        "upscale_0": {"kernel": _convT(sd["output_upscaling.0.weight"]),
                      "bias": _t(sd["output_upscaling.0.bias"])},
        "upscale_ln": _ln2d(sd, "output_upscaling.1"),
        "upscale_1": {"kernel": _convT(sd["output_upscaling.3.weight"]),
                      "bias": _t(sd["output_upscaling.3.bias"])},
        "iou_head": mlp3("iou_prediction_head"),
        "obj_head": mlp3("pred_obj_score_head"),
    }
    for i in range(num_mask_tokens):
        p[f"hyper_{i}"] = mlp3(f"output_hypernetworks_mlps.{i}")
    return p


def convert_sam2(torch_sam2, trunk_depth: int) -> Dict:
    """Reference SAM2Model → our SAM2Model.variables (image path)."""
    dec_sd = torch_sam2.sam_mask_decoder.state_dict()
    return {
        "trunk": {"params": convert_hiera(
            torch_sam2.image_encoder.trunk.state_dict(), trunk_depth)},
        "neck": {"params": convert_fpn_neck(
            torch_sam2.image_encoder.neck.state_dict())},
        "skips": {"params": {
            "conv_s0": {"kernel": _conv(dec_sd["conv_s0.weight"]),
                        "bias": _t(dec_sd["conv_s0.bias"])},
            "conv_s1": {"kernel": _conv(dec_sd["conv_s1.weight"]),
                        "bias": _t(dec_sd["conv_s1.bias"])}}},
        "prompt": {"params": convert_prompt_encoder(
            torch_sam2.sam_prompt_encoder.state_dict())},
        "decoder": {"params": convert_sam2_mask_decoder(dec_sd)},
        "no_mem_embed": _t(torch_sam2.no_mem_embed),
    }


def convert_memory_attention(torch_ma, num_layers: int = 4) -> Dict:
    """Reference MemoryAttention (memory_attention.py:140) → memory.MemoryAttention params."""
    sd = torch_ma.state_dict()
    params: Dict = {"norm": _ln(sd, "norm")}
    for i in range(num_layers):
        p = f"layers.{i}"
        params[f"layers_{i}"] = {
            "self_attn": _attention(sd, f"{p}.self_attn"),
            "cross_attn_image": _attention(sd, f"{p}.cross_attn_image"),
            "linear1": _dense(sd, f"{p}.linear1"),
            "linear2": _dense(sd, f"{p}.linear2"),
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "norm3": _ln(sd, f"{p}.norm3"),
        }
    return {"params": params}


def convert_memory_encoder(torch_me) -> Dict:
    """Reference MemoryEncoder (encoders.py:378) → memory.MemoryEncoder params.

    The torch mask_downsampler.encoder is a flat Sequential
    [conv, LN2d, GELU] * k + final 1x1; CXBlock pwconvs are nn.Linear."""
    sd = torch_me.state_dict()
    conv_idx = sorted({int(k.split(".")[2]) for k in sd
                       if k.startswith("mask_downsampler.encoder.")
                       and k.endswith(".weight")
                       and sd[k].ndim == 4})
    down = conv_idx[:-1]
    params: Dict = {"mask_downsampler": {}}
    md = params["mask_downsampler"]
    for j, ci in enumerate(down):
        md[f"down_{j}"] = {
            "kernel": _conv(sd[f"mask_downsampler.encoder.{ci}.weight"]),
            "bias": _t(sd[f"mask_downsampler.encoder.{ci}.bias"])}
        md[f"ln_{j}"] = _ln2d(sd, f"mask_downsampler.encoder.{ci + 1}")
    last = conv_idx[-1]
    md["out"] = {"kernel": _conv(sd[f"mask_downsampler.encoder.{last}.weight"]),
                 "bias": _t(sd[f"mask_downsampler.encoder.{last}.bias"])}
    params["pix_feat_proj"] = {
        "kernel": _conv(sd["pix_feat_proj.weight"]),
        "bias": _t(sd["pix_feat_proj.bias"])}
    for i in range(2):
        p = f"fuser.layers.{i}"
        params[f"fuser_{i}"] = {
            "dwconv": {"kernel": _conv(sd[f"{p}.dwconv.weight"]),
                       "bias": _t(sd[f"{p}.dwconv.bias"])},
            "norm": _ln2d(sd, f"{p}.norm"),
            "pwconv1": _dense(sd, f"{p}.pwconv1"),
            "pwconv2": _dense(sd, f"{p}.pwconv2"),
            "gamma": _t(sd[f"{p}.gamma"]),
        }
    if "out_proj.weight" in sd and sd["out_proj.weight"].ndim == 4:
        params["out_proj"] = {"kernel": _conv(sd["out_proj.weight"]),
                              "bias": _t(sd["out_proj.bias"])}
    return {"params": params}


def convert_sam2_video(torch_sam2, trunk_depth: int) -> Dict:
    """FULL reference SAM2Model (image stack + memory stack, sam.py:165-390
    parameter inventory) → SAM2VideoPredictor.variables (video.py).

    Covers: image stack (convert_sam2), MemoryAttention, MemoryEncoder,
    obj_ptr_proj (3-layer MLP, use_mlp_for_obj_ptr_proj=True),
    obj_ptr_tpos_proj (proj_tpos_enc_in_obj_ptrs=True), maskmem_tpos_enc
    (squeezed from (N,1,1,D)), no_obj_embed_spatial and no_obj_ptr
    (SAM2.1 / fixed_no_obj_ptr=True parameters)."""
    sd = torch_sam2.state_dict()
    return {
        "model": convert_sam2(torch_sam2, trunk_depth),
        "mem_attn": convert_memory_attention(torch_sam2.memory_attention),
        "mem_enc": convert_memory_encoder(torch_sam2.memory_encoder),
        "ptr_proj": {"params": {
            f"layers_{i}": _dense(sd, f"obj_ptr_proj.layers.{i}")
            for i in range(3)}},
        "ptr_tpos": {"params": {"proj": _dense(sd, "obj_ptr_tpos_proj")}},
        "maskmem_tpos_enc": _t(sd["maskmem_tpos_enc"])[:, 0, 0, :],
        "no_obj_embed_spatial": _t(sd["no_obj_embed_spatial"])[0],
        "no_obj_ptr": _t(sd["no_obj_ptr"])[0],
    }
