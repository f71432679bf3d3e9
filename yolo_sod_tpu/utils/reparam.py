"""Structural reparameterization: RepConv train branches -> one 3x3 conv.

TPU-native analog of the reference's deploy-time fusion
(reference nn/modules/conv.py RepConv.fuse_convs :228-286, which builds the
equivalent kernel/bias and deletes the branches; BaseModel.fuse tasks.py:
201-227 triggers it). Here the model is pure-functional, so fusion is a
checkpoint transform: walk the variables tree, fold each branch's BatchNorm
into its conv, pad the 1x1 kernel to 3x3, add the identity branch as a
centered delta kernel, and sum — producing the params of the deploy-mode
RepConv (a single biased 3x3, `nn/modules/standard.rep_deploy`).

Why it matters on TPU: XLA already constant-folds Conv+BN at inference, but
it cannot merge three *convolutions*; fusing them removes two full reads of
the input activation map per RepConv — a direct HBM-traffic win for a
memory-bound model (PERF.md roofline).
"""

from __future__ import annotations

import numpy as np

from yolo_sod_tpu.nn.modules.conv import BN_EPS


def _fold_bn(kernel: np.ndarray, bn_params: dict, bn_stats: dict,
             eps: float = BN_EPS):
    """Fold a BatchNorm into the conv it follows.

    kernel is NHWC-layout (kh, kw, cin, cout); BN scale/bias/mean/var are
    (cout,). Returns (kernel', bias').
    """
    scale = np.asarray(bn_params["scale"], np.float32)
    bias = np.asarray(bn_params["bias"], np.float32)
    mean = np.asarray(bn_stats["mean"], np.float32)
    var = np.asarray(bn_stats["var"], np.float32)
    mult = scale / np.sqrt(var + eps)
    return np.asarray(kernel, np.float32) * mult, bias - mean * mult


def _is_repconv_node(p: dict) -> bool:
    """Heuristic match for a RepConv param subtree: two ConvBNAct branches
    whose kernels are 3x3 and 1x1 with identical channel shapes."""
    if not (isinstance(p, dict) and "conv1" in p and "conv2" in p):
        return False
    c1, c2 = p["conv1"], p["conv2"]
    try:
        k3 = c1["conv"]["kernel"]
        k1 = c2["conv"]["kernel"]
    except (KeyError, TypeError):
        return False
    return (getattr(k3, "ndim", 0) == 4 and getattr(k1, "ndim", 0) == 4
            and k3.shape[:2] == (3, 3) and k1.shape[:2] == (1, 1)
            and k3.shape[2:] == k1.shape[2:] and "bn" in c1 and "bn" in c2)


def _fuse_node(p: dict, s: dict) -> tuple[dict, int]:
    """Fuse one RepConv subtree -> deploy params {"fused": {kernel, bias}}."""
    w3, b3 = _fold_bn(p["conv1"]["conv"]["kernel"], p["conv1"]["bn"],
                      s["conv1"]["bn"])
    w1, b1 = _fold_bn(p["conv2"]["conv"]["kernel"], p["conv2"]["bn"],
                      s["conv2"]["bn"])
    w = w3 + np.pad(w1, ((1, 1), (1, 1), (0, 0), (0, 0)))
    b = b3 + b1
    if "bn" in p:                                   # identity branch (c1==c2, s==1)
        cin = w3.shape[2]
        wid = np.zeros_like(w3)
        wid[1, 1, np.arange(cin), np.arange(cin)] = 1.0
        wi, bi = _fold_bn(wid, p["bn"], s["bn"])
        w, b = w + wi, b + bi
    return {"fused": {"kernel": w, "bias": b}}, 1


def fuse_rep_variables(variables) -> tuple[dict, int]:
    """Rewrite every RepConv subtree in a flax variables collection to its
    deploy form. Returns (new_variables, n_fused). BatchNorm state belonging
    to fused branches is dropped; all other params/stats pass through.
    """
    try:
        from flax.core import unfreeze
        params = unfreeze(variables["params"])
        stats = unfreeze(variables.get("batch_stats", {}))
    except Exception:
        params = dict(variables["params"])
        stats = dict(variables.get("batch_stats", {}))
    n_fused = 0

    def walk(p, s):
        nonlocal n_fused
        out_p, out_s = {}, {}
        for k, v in p.items():
            sv = s.get(k, {}) if isinstance(s, dict) else {}
            if _is_repconv_node(v):
                fused, n = _fuse_node(v, sv)
                out_p[k] = fused
                n_fused += n                         # stats subtree dropped
            elif isinstance(v, dict):
                np_, ns_ = walk(v, sv)
                out_p[k] = np_
                if ns_:
                    out_s[k] = ns_
            else:
                out_p[k] = v
        # stats-only keys at this level (BN under modules with no params here)
        if isinstance(s, dict):
            for k, v in s.items():
                if k not in p:
                    out_s[k] = v
        return out_p, out_s

    new_p, new_s = walk(params, stats)
    out = {"params": new_p}
    if new_s:
        out["batch_stats"] = new_s
    for k in variables:
        if k not in ("params", "batch_stats"):
            out[k] = variables[k]
    return out, n_fused
