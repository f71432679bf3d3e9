"""Torch (ultralytics .pt) → flax variables converter.

Capability analog of reference attempt_load_one_weight/torch_safe_load
(nn/tasks.py:824-958): lets a user of the reference bring their trained
checkpoint across. Host-side only; torch is used purely as a reader.

Key translation torch → flax (our module names were chosen to be parallel):
  model.{i}.rest        → params["model_{i}"][rest...]  (numeric segments fold
                          into their parent with '_': m.0.cv1 → m_0.cv1)
  conv.weight (O,I,kh,kw)      → conv.kernel (kh,kw,I,O)
  linear weight (O,I)          → kernel (I,O)
  bn.weight / bn.bias          → bn.scale / bn.bias      (params)
  bn.running_mean/var          → bn.mean / bn.var        (batch_stats)
  ConvTranspose2d (I,O,kh,kw)  → kernel (kh,kw,I,O) SPATIALLY FLIPPED
                          (flax ConvTranspose with transpose_kernel=False is a
                          fractionally-strided conv, so torch's weight must be
                          mirrored; verified numerically in test_torch_convert)

Returns the variables dict plus a report of unmatched keys so fidelity holes
are visible instead of silent.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Tuple

import numpy as np

from yolo_sod_tpu.utils import LOGGER


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def load_torch_state_dict(path) -> dict:
    """Read a .pt/.pth into a {key: np.ndarray} state dict (EMA preferred,
    mirroring the reference checkpoint layout trainer.py:513-546)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model = None
    if isinstance(ckpt, dict):
        model = ckpt.get("ema") or ckpt.get("model") or ckpt
    if hasattr(model, "state_dict"):
        sd = model.state_dict()
    elif isinstance(model, dict):
        sd = model
    else:
        raise ValueError(f"cannot find a state dict in {path}")
    return {k: v.detach().float().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def _candidate_paths(key: str, available: set) -> list:
    """Translate a torch dotted key into candidate flax paths.

    Numeric segments can either fold into the previous segment (Sequential
    index → our `name_N`) or fold into 'model' (top-level layer index).
    Generate the fold/no-fold combinations and filter by availability of the
    module prefix among `available` path-prefixes.
    """
    parts = key.split(".")
    heads = [[]]
    for p in parts:
        new = []
        for h in heads:
            if p.isdigit() and h:
                new.append(h[:-1] + [f"{h[-1]}_{p}"])   # fold into previous
            new.append(h + [p])                          # keep separate
        heads = new
    return [tuple(h) for h in heads]


_SKIP_SUFFIXES = ("num_batches_tracked", "anchors", "strides",
                  "dfl.conv.weight")  # frozen DFL arange conv is closed-form here

# Structural renames torch -> flax applied before candidate generation:
# reference module internals whose names differ from ours by construction.
_KEY_REWRITES = (
    (".channel_attention.fc.0.", ".fc1."),       # CBAM channel MLP
    (".channel_attention.fc.2.", ".fc2."),
    (".spatial_attention.conv1.", ".spatial."),  # CBAM spatial conv
    (".mlp.2.", ".mlp_1."),                      # Linear-GELU-Linear Sequential
    (".mlp.0.", ".mlp_0."),
    ("in_proj_weight", "in_proj.weight"),        # packed torch MHA qkv
    ("in_proj_bias", "in_proj.bias"),
)

# Non-legacy Detect cls tower is a nested Sequential in the reference
# (head.py: cv3 = Seq(Seq(DWConv, Conv), Seq(DWConv, Conv), Conv2d)) →
# torch keys cv3.{i}.{0,1}.{0,1}.*; our flax names flatten the inner pair
# to cv3_{i}_{0,1}{a,b} (nn/modules/head.py:73-76).
_CV3_NESTED = re.compile(r"cv3\.(\d+)\.([01])\.([01])\.")


def _rewrite_key(key: str) -> str:
    key = _CV3_NESTED.sub(
        lambda m: f"cv3_{m.group(1)}_{m.group(2)}{'ab'[int(m.group(3))]}.", key)
    for old, new_k in _KEY_REWRITES:
        if old in key:
            key = key.replace(old, new_k)
    return key


def convert_torch_checkpoint(src, model) -> Tuple[dict, dict]:
    """Map a torch state dict onto `model`'s flax variables.

    Args:
        src: path to .pt OR a {key: ndarray} state dict.
        model: DetectionModel with initialized variables (shapes are the spec).

    Returns:
        (variables, report) — report = {"matched": n, "missing": [...],
        "unused": [...]}.
    """
    sd = load_torch_state_dict(src) if isinstance(src, (str, Path)) else dict(src)
    if model.variables is None:
        model.init()
    params = _flatten({"params": dict(model.variables["params"])})
    bstats = _flatten({"batch_stats": dict(model.variables.get("batch_stats", {}))})
    target = {**params, **bstats}
    # index by (module-path-minus-leaf) for candidate matching
    new = dict(target)
    used = set()
    missing = []

    def try_set(path, val) -> bool:
        if path not in target:
            return False
        want = target[path].shape
        if val.shape != tuple(want):
            return False
        new[path] = val.astype(np.asarray(target[path]).dtype)
        used.add(path)
        return True

    matched = 0
    unused = []
    for key, val in sd.items():
        key = _rewrite_key(key)
        leaf = key.split(".")[-1]
        if any(key.endswith(s) for s in _SKIP_SUFFIXES):
            continue
        base = key.rsplit(".", 1)[0]
        # leaf-name + transform candidates, tried in order
        cands: list[tuple[str, Any]] = []
        if leaf == "weight":
            if val.ndim == 4:
                # ConvTranspose weights are IOHW and need a spatial mirror
                # (see module docstring); with square in==out channels the
                # plain-conv transpose is shape-identical but numerically
                # wrong, so route by the reference's module name.
                if base.endswith(("upsample", "conv_transpose")):
                    cands.append(
                        ("kernel", val[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)))
                cands.append(("kernel", val.transpose(2, 3, 1, 0)))   # conv OIHW→HWIO
            elif val.ndim == 2:
                cands.append(("kernel", val.T))
                cands.append(("embedding", val))
            else:
                cands.append(("scale", val))
                cands.append(("weight", val))
                cands.append(("gamma", val))
        elif leaf == "bias":
            cands.append(("bias", val))
            cands.append(("beta", val))
        elif leaf == "running_mean":
            cands.append(("mean", val))
        elif leaf == "running_var":
            cands.append(("var", val))
        else:
            cands.append((leaf, val))

        hit = False
        for new_leaf, v in cands:
            for mod_path in _candidate_paths(base, None):
                for coll in ("params", "batch_stats"):
                    if try_set((coll,) + mod_path + (new_leaf,), v):
                        hit = True
                        break
                if hit:
                    break
            if hit:
                break
        if hit:
            matched += 1
        else:
            unused.append(key)

    for path in target:
        if path not in used:
            missing.append(".".join(path))

    report = {"matched": matched, "missing": missing, "unused": unused}
    if unused:
        LOGGER.warning(f"convert: {len(unused)} torch keys unmatched "
                       f"(first: {unused[:3]})")
    if missing:
        LOGGER.warning(f"convert: {len(missing)} target leaves not filled "
                       f"(first: {missing[:3]})")
    LOGGER.info(f"convert: matched {matched}/{len(sd)} torch keys")

    out = _unflatten(new)
    variables = {"params": out["params"]}
    if "batch_stats" in out:
        variables["batch_stats"] = out["batch_stats"]
    return variables, report


def convert_rtdetr_decoder(sd: dict, nh: int = 8) -> Tuple[dict, dict]:
    """torch RTDETRDecoder state_dict (numpy values) -> our RTDETRDecoder
    variables (params, batch_stats).

    Explicit structural map (reference nn/modules/head.py:361 RTDETRDecoder):
    packed torch MultiheadAttention in_proj splits into flax MHDPA
    query/key/value DenseGeneral kernels (C, nh, hd); Sequential(Linear,
    LayerNorm) enc_output splits into enc_output + enc_output_norm; ModuleList
    heads land on our per-layer dec_*_head{i} names.
    """
    import numpy as np

    P: dict = {}
    S: dict = {}

    def lin(prefix):
        return {"kernel": np.asarray(sd[prefix + ".weight"]).T,
                "bias": np.asarray(sd[prefix + ".bias"])}

    def ln(prefix):
        return {"scale": np.asarray(sd[prefix + ".weight"]),
                "bias": np.asarray(sd[prefix + ".bias"])}

    def mlp(prefix, n=3):
        return {f"layer{j}": lin(f"{prefix}.layers.{j}") for j in range(n)}

    n_levels = 0
    while f"input_proj.{n_levels}.0.weight" in sd:
        w = np.asarray(sd[f"input_proj.{n_levels}.0.weight"])
        P[f"input_proj_{n_levels}_conv"] = {"kernel": w.transpose(2, 3, 1, 0)}
        P[f"input_proj_{n_levels}_bn"] = {
            "scale": np.asarray(sd[f"input_proj.{n_levels}.1.weight"]),
            "bias": np.asarray(sd[f"input_proj.{n_levels}.1.bias"])}
        S[f"input_proj_{n_levels}_bn"] = {
            "mean": np.asarray(sd[f"input_proj.{n_levels}.1.running_mean"]),
            "var": np.asarray(sd[f"input_proj.{n_levels}.1.running_var"])}
        n_levels += 1

    P["enc_output"] = lin("enc_output.0")
    P["enc_output_norm"] = ln("enc_output.1")
    P["enc_score_head"] = lin("enc_score_head")
    P["enc_bbox_head"] = mlp("enc_bbox_head")
    P["query_pos_head"] = mlp("query_pos_head", n=2)
    P["denoising_class_embed"] = np.asarray(sd["denoising_class_embed.weight"])

    ndl = 0
    while f"decoder.layers.{ndl}.self_attn.in_proj_weight" in sd:
        pre = f"decoder.layers.{ndl}"
        C = np.asarray(sd[f"{pre}.self_attn.in_proj_weight"]).shape[1]
        hd = C // nh
        inw = np.asarray(sd[f"{pre}.self_attn.in_proj_weight"])
        inb = np.asarray(sd[f"{pre}.self_attn.in_proj_bias"])
        sa = {}
        for j, name in enumerate(("query", "key", "value")):
            sa[name] = {"kernel": inw[j * C:(j + 1) * C].T.reshape(C, nh, hd),
                        "bias": inb[j * C:(j + 1) * C].reshape(nh, hd)}
        ow = np.asarray(sd[f"{pre}.self_attn.out_proj.weight"])
        sa["out"] = {"kernel": ow.T.reshape(nh, hd, C),
                     "bias": np.asarray(sd[f"{pre}.self_attn.out_proj.bias"])}
        layer = {"self_attn": sa,
                 "cross_attn": {k: lin(f"{pre}.cross_attn.{k}") for k in
                                ("sampling_offsets", "attention_weights",
                                 "value_proj", "output_proj")},
                 "norm1": ln(f"{pre}.norm1"), "norm2": ln(f"{pre}.norm2"),
                 "norm3": ln(f"{pre}.norm3"),
                 "linear1": lin(f"{pre}.linear1"),
                 "linear2": lin(f"{pre}.linear2")}
        P[f"decoder_layer{ndl}"] = layer
        P[f"dec_score_head{ndl}"] = lin(f"dec_score_head.{ndl}")
        P[f"dec_bbox_head{ndl}"] = mlp(f"dec_bbox_head.{ndl}")
        ndl += 1

    return P, S
