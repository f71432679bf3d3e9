"""YAML graph compiler + DetectionModel.

TPU-native re-expression of reference ultralytics/nn/tasks.py:
- parse_model (:967-1169): YAML rows [from, repeats, module, args] →
  fully-resolved LayerSpecs with the fork's channel-inference rules,
  including the backbone+neck+head merge (:992) and the custom-module
  channel rules (:1100-1146).
- DetectionModel (:333-423): here a host-side object owning a single flax
  Network whose __call__ replays the layer list; under jit the per-layer
  Python loop disappears into one XLA graph (vs the reference's hot loop #1,
  tasks.py:165-192).
- Stride discovery: computed *statically* by tracking cumulative downsample
  factors through the rows (vs the reference's dummy 256x256 forward,
  tasks.py:357-371).
"""

from __future__ import annotations

import contextlib
import dataclasses
import hashlib
import json
import math
import os
import re
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolo_sod_tpu.nn.modules import MODULE_REGISTRY
from yolo_sod_tpu.ops.decode import decode_detections
from yolo_sod_tpu.utils import LOGGER, ROOT, colorstr, yaml_load

# Module families sharing channel-inference rules (reference tasks.py:1005-1146).
_BASE_CH = {"Conv", "ConvTranspose", "GhostConv", "Bottleneck", "SPP", "SPPF", "DWConv",
            "Focus", "BottleneckCSP", "C1", "C2", "C2f", "C3k2", "C3", "C3x", "RepC3",
            "PSA", "C2PSA", "C2fPSA", "A2C2f", "C2fAttn", "VimBlock", "CompactInvertedBlock",
            "RecurrentAttentionFusionBlock", "BiLevelRoutingAttentionFusionBlock",
            "RepConv", "LightConv"}
_REPEAT_INSERT = {"BottleneckCSP", "C1", "C2", "C2f", "C3k2", "C3", "C3x", "RepC3",
                  "C2fPSA", "C2PSA", "A2C2f", "C2fAttn"}
_ATTN_PASSTHROUGH = {"SE", "MixedAttention", "MambaBlock", "SwinBlock", "SE_Block",
                     "CA_Block", "A2_Attn", "CBAM_Block", "SageAttention2",
                     "BiLevelRoutingAttention"}
_HEADS = {"Detect", "DetectStable", "Segment", "Pose", "OBB", "v10Detect",
          "DETRAuxHead", "RTDETRDecoder", "WorldDetect"}
_MULTI_INPUT = {"Concat", "Add", "ScaleAdd", "HyperACEBlock", "CA_FPN_Block",
                "HyperACEBlockStable", "ImagePoolingAttn"} | _HEADS
# Modules that consume the text-guide side input (YOLO-World vocabulary).
_GUIDE_CONSUMERS = {"C2fAttn", "WorldDetect"}
# Spatial effect of a module on the cumulative downsample factor.
_DOWNSAMPLE_BY_S = {"Conv", "DWConv", "GhostConv", "Focus",
                    "RepConv"}  # factor = arg s (Focus: 2*s)


def make_divisible(x, divisor: int = 8):
    """Round channel count up to the nearest multiple of divisor."""
    return math.ceil(x / divisor) * divisor


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    """One fully-resolved graph row."""

    i: int                      # layer index
    f: Tuple[int, ...]          # absolute input layer indices (-1 = image input, i==0 only)
    n: int                      # sequential repeats (non-n-consuming modules only)
    name: str                   # registry module name
    args: Tuple[Any, ...]       # resolved constructor args
    kwargs: Tuple[Tuple[str, Any], ...]  # resolved constructor kwargs
    c2: int                     # output channels
    stride: int                 # cumulative downsample factor of the output
    multi_input: bool           # module consumes a list of inputs


@dataclasses.dataclass(frozen=True)
class ParsedGraph:
    specs: Tuple[LayerSpec, ...]
    save: Tuple[int, ...]       # indices whose outputs later layers consume
    nc: int
    detect_index: int           # index of the detect head layer (-1 if none)
    detect_strides: Tuple[int, ...]


def _freeze(x):
    """Recursively convert lists to tuples so LayerSpec stays hashable."""
    if isinstance(x, list):
        return tuple(_freeze(v) for v in x)
    return x


def parse_model(d: dict, ch: int = 3, verbose: bool = False) -> ParsedGraph:
    """Compile a model YAML dict into LayerSpecs (reference tasks.py:967-1169)."""
    nc = d.get("nc", 80)
    legacy = True
    max_channels = float("inf")
    scales = d.get("scales")
    depth = d.get("depth_multiple", 1.0)
    width = d.get("width_multiple", 1.0)
    scale = d.get("scale")
    if scales:
        if not scale:
            scale = tuple(scales.keys())[0]
            LOGGER.warning(f"no model scale passed, assuming scale='{scale}'")
        depth, width, max_channels = scales[scale]

    rows = list(d.get("backbone", [])) + list(d.get("neck", [])) + list(d.get("head", []))
    outs: list[int] = []      # output channels per layer
    strides: list[int] = []   # cumulative downsample factor per layer
    specs: list[LayerSpec] = []
    save: set[int] = set()
    detect_index, detect_strides = -1, ()

    def ch_of(i: int, x: int) -> int:
        if x == -1 and i == 0:
            return ch
        return outs[x] if x >= 0 else outs[i + x]

    def stride_of(i: int, x: int) -> int:
        if x == -1 and i == 0:
            return 1
        return strides[x] if x >= 0 else strides[i + x]

    for i, (f, n, m, args) in enumerate(rows):
        name = m if isinstance(m, str) else m.__name__

        def _resolve(a):
            if isinstance(a, str):
                if a == "nc":
                    return nc
                if a in ("None", "none"):
                    return None
                if a == "True":
                    return True
                if a == "False":
                    return False
            return a

        args = [_resolve(a) for a in args]
        n = max(round(n * depth), 1) if n > 1 else n
        f_list = list(f) if isinstance(f, (list, tuple)) else [f]
        abs_f = tuple(x if (x >= 0 or (x == -1 and i == 0)) else i + x for x in f_list)
        c1 = ch_of(i, f_list[0])
        s_in = stride_of(i, f_list[0])
        s_out = s_in
        kwargs: dict[str, Any] = {}
        multi = name in _MULTI_INPUT

        if name in _BASE_CH:
            c2 = args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            if name == "C2fAttn":
                # embed channels + head count scale with width
                # (reference tasks.py:1051-1055)
                args[1] = make_divisible(min(args[1], max_channels // 2) * width, 8)
                args[2] = int(max(round(min(args[2], max_channels // 2 // 32)) * width, 1)
                              if args[2] > 1 else args[2])
            args = [c1, c2, *args[1:]]
            if name in _REPEAT_INSERT:
                args.insert(2, n)
                n = 1
            if name == "C3k2":
                legacy = False
                if scale and scale in "mlx":
                    if len(args) > 3:
                        args[3] = True
                    else:
                        args.append(True)
            if name == "A2C2f":
                legacy = False
                if scale and scale in "lx":
                    args.append(True)   # residual
                    args.append(1.5)    # mlp_ratio
            if name in _DOWNSAMPLE_BY_S:
                s = args[3] if len(args) > 3 else 1
                s_out = s_in * int(s) * (2 if name == "Focus" else 1)
            elif name == "ConvTranspose":
                s = args[3] if len(args) > 3 else 2
                s_out = max(1, s_in // int(s))
        elif name in ("nn.Upsample", "Upsample"):
            # args [size, scale_factor, mode]
            c2 = c1
            size, sf, mode = (args + [None, 2, "nearest"])[:3]
            kwargs = {"size": size, "scale_factor": int(sf or 2), "mode": mode}
            args = []
            s_out = max(1, s_in // kwargs["scale_factor"])
        elif name == "Concat":
            c2 = sum(ch_of(i, x) for x in f_list)
            s_out = s_in
        elif name in ("Add", "ScaleAdd"):
            c2 = c1
        elif name == "SpaceToDepth":
            r = int(args[0]) if args else 2
            c2 = c1 * r * r
            args = [r]
            s_out = s_in * r
        elif name == "ImagePoolingAttn":
            # Refines the text guide from pooled pyramid levels; produces no
            # feature map (c2=0 keeps it out of the channel chain).
            kwargs = {"ec": int(args[0]) if args else 256,
                      "ch": tuple(ch_of(i, x) for x in f_list)}
            args = []
            c2 = 0
        elif name == "OmniKernelFusion":
            c2 = int(args[1])
        elif name == "HyperACEBlock":
            c2 = int(args[2])
        elif name == "CA_FPN_Block":
            # YAML: [[high, low], 1, CA_FPN_Block, [out]]
            c2 = int(args[0])
            args = [ch_of(i, f_list[1]), ch_of(i, f_list[0]), c2]
        elif name == "HyperACEBlockStable":
            # YAML: [[high, low], 1, HyperACEBlockStable, [out]]
            c2 = int(args[0])
            args = [ch_of(i, f_list[0]), ch_of(i, f_list[1]), c2]
        elif name == "MFBlock":
            c2 = c1
            args = [c1, int(args[0]) if args else c1]
        elif name in ("SimAM",):
            c2 = c1
            args = []
        elif name in ("FusionLockTSS", "GlobalDetail", "DynamicPixelAttn",
                      "BiFormerLiteBlock", "LayerNorm2d", "CBAM",
                      "ChannelAttention", "AIFI", "TransformerEncoderLayer",
                      "PSABlock"):
            c2 = c1
            args = [c1, *args]
        elif name == "SpatialAttention":
            c2 = c1
        elif name == "Classify":
            c2 = args[0] if args else nc
            args = [c1, c2]
        elif name in ("HGStem", "HGBlock"):
            if name == "HGStem":
                s_out = s_in * 4     # stem1 s2 + stem3 s2
            # Reference tasks.py:1088-1090 passes cm/c2 through RAW — no
            # width scaling, no max_channels clamp (rtdetr-l's 2048-ch
            # HGBlocks exceed its scales max_channels=1024 by design).
            cm, c2 = int(args[0]), int(args[1])
            args = [c1, cm, c2, *args[2:]]
            if name == "HGBlock":
                # row repeats fold into the block's inner conv count
                # (reference parse_model: args.insert(4, n); n = 1)
                while len(args) < 4:
                    args.append(3)       # default k
                args.insert(4, n)
                n = 1
        elif name == "ResNetLayer":
            # YAML passes c1 explicitly: [c1, c2, s, is_first, n]
            # (reference tasks.py:1094: c2 = args[1] if is_first else args[1]*4)
            is_first = len(args) > 3 and args[3]
            c2 = int(args[1]) if is_first else int(args[1]) * 4
            s_out = s_in * (4 if is_first else int(args[2]) if len(args) > 2 else 1)
        elif name == "AGLU":
            c2 = c1
            args = []
        elif name in _ATTN_PASSTHROUGH:
            c2 = c1
            if name in ("MambaBlock", "SwinBlock", "CA_Block", "CBAM_Block", "MixedAttention",
                        "SageAttention2", "BiLevelRoutingAttention"):
                args = [c1, *args]
            elif name == "A2_Attn":
                args = [c1, None, *args]
            # SE / SE_Block keep raw args (the channel count lands in `reduction`,
            # reproducing reference behavior — see attention.SE docstring).
        elif name in _HEADS:
            in_chs = tuple(ch_of(i, x) for x in f_list)
            det_strides = tuple(stride_of(i, x) for x in f_list)
            if name in ("Detect", "DetectStable", "v10Detect"):
                kwargs = {"nc": args[0] if args else nc, "ch": in_chs,
                          "legacy": legacy, "strides": det_strides}
                args = []
                detect_index, detect_strides = i, det_strides
            elif name == "WorldDetect":
                # YAML: [nc, embed, with_bn]
                kwargs = {"nc": args[0] if args else nc, "ch": in_chs,
                          "legacy": legacy, "strides": det_strides,
                          "embed": int(args[1]) if len(args) > 1 else 512,
                          "with_bn": bool(args[2]) if len(args) > 2 else False}
                args = []
                detect_index, detect_strides = i, det_strides
            elif name == "RTDETRDecoder":
                kwargs = {"nc": args[0] if args else nc, "ch": in_chs}
                # optional size overrides [nc, hd, nq, ndl] (tiny-test/model-
                # family scaling; upstream hardcodes 256/300/6)
                for j, key in ((1, "hd"), (2, "nq"), (3, "ndl")):
                    if len(args) > j:
                        kwargs[key] = int(args[j])
                args = []
                detect_index, detect_strides = i, det_strides
            elif name in ("Segment", "Pose", "OBB"):
                kwargs = {"nc": args[0] if args else nc, "ch": in_chs,
                          "legacy": legacy, "strides": det_strides}
                if name == "Segment" and len(args) > 1:
                    kwargs["nm"] = args[1]
                    if len(args) > 2:
                        # Proto channels scale with width (reference
                        # tasks.py parse_model: args[2] = make_divisible(
                        # min(args[2], max_channels) * width, 8)).
                        kwargs["npr"] = make_divisible(
                            min(int(args[2]), max_channels) * width, 8)
                elif name == "Pose" and len(args) > 1:
                    kwargs["kpt_shape"] = tuple(args[1])
                elif name == "OBB" and len(args) > 1:
                    kwargs["ne"] = args[1]
                args = []
                detect_index, detect_strides = i, det_strides
            c2 = 0  # heads do not feed the channel chain
        else:
            c2 = c1

        spec = LayerSpec(
            i=i, f=abs_f, n=n, name=name, args=_freeze(args),
            kwargs=tuple(sorted((k, _freeze(v)) for k, v in kwargs.items())),
            c2=c2, stride=s_out, multi_input=multi,
        )
        specs.append(spec)
        for x in abs_f:
            if x != -1 and x != i - 1:
                save.add(x)
        outs.append(c2)
        strides.append(s_out)
        if verbose:
            LOGGER.info(f"{i:>3} {str(abs_f):>18} {n:>3} {name:<28}{str(args):<40} c2={c2} /{s_out}")

    return ParsedGraph(specs=tuple(specs), save=tuple(sorted(save)), nc=nc,
                       detect_index=detect_index, detect_strides=detect_strides)


def build_module(spec: LayerSpec, name: str) -> nn.Module:
    """Instantiate the flax module for a LayerSpec."""
    cls = MODULE_REGISTRY.get(spec.name)
    if cls is None:
        raise KeyError(f"module '{spec.name}' is not registered in MODULE_REGISTRY")
    return cls(*spec.args, **dict(spec.kwargs), name=name)


class Network(nn.Module):
    """Replay a ParsedGraph's layer list: the save-list topological replay of
    reference BaseModel._predict_once (tasks.py:165-192), composed at trace time.
    """

    graph: ParsedGraph

    @nn.compact
    def __call__(self, x, train: bool = False, active_mask=None, guide=None,
                 dn=None, embed=None):
        # dn: optional (dn_cls, dn_bbox, attn_mask) CDN denoising queries for
        # an RTDETRDecoder head (fixed-capacity; see models/utils/loss.py
        # get_cdn_group).
        # embed: optional static tuple of layer indices — return the
        # concatenation of their GAP'd feature vectors instead of the head
        # output (reference tasks.py:188-191), truncating the replay at
        # max(embed).
        saved: dict[int, jax.Array] = {}
        embeddings: list[jax.Array] = []
        out = x
        if guide is not None and guide.shape[0] != x.shape[0]:
            # One text vocabulary for the whole batch (closed-set serving).
            guide = jnp.broadcast_to(guide, (x.shape[0], *guide.shape[1:]))
        if guide is not None:
            guide = guide.astype(x.dtype)
        ori_guide = guide
        for spec in self.graph.specs:
            if spec.multi_input:
                inputs = [out if j == spec.i - 1 else saved[j] for j in spec.f]
            else:
                j = spec.f[0]
                inputs = out if (j == spec.i - 1 or j == -1) else saved[j]
            if spec.name == "C2fAttn":
                out = build_module(spec, f"model_{spec.i}")(inputs, guide, train)
            elif spec.name == "WorldDetect":
                out = build_module(spec, f"model_{spec.i}")(
                    inputs, ori_guide, train, active_mask)
            elif spec.name == "ImagePoolingAttn":
                # Refine the guide in place; the running feature map is
                # untouched (reference WorldModel.predict tasks.py:692-693).
                guide = build_module(spec, f"model_{spec.i}")(inputs, guide, train)
                continue
            elif spec.name in ("Detect", "DetectStable", "v10Detect",
                               "Segment", "Pose", "OBB"):
                out = build_module(spec, f"model_{spec.i}")(inputs, train, active_mask)
            elif spec.name == "RTDETRDecoder" and dn is not None:
                out = build_module(spec, f"model_{spec.i}")(
                    inputs, train, None, *dn)
            elif spec.n > 1:
                out = inputs
                for r in range(spec.n):
                    out = build_module(spec, f"model_{spec.i}_{r}")(out, train)
            else:
                out = build_module(spec, f"model_{spec.i}")(inputs, train)
            if spec.i in self.graph.save:
                saved[spec.i] = out
            if embed and spec.i in embed:
                # GAP over spatial dims (NHWC) — the reference's
                # adaptive_avg_pool2d(x, (1,1)).squeeze (tasks.py:189).
                embeddings.append(jnp.mean(out, axis=(1, 2)))
                if spec.i == max(embed):
                    return jnp.concatenate(embeddings, axis=-1)
        return out



MODEL_CFG_DIRS = (ROOT / "cfg" / "models", Path.cwd())


def yaml_model_load(path) -> dict:
    """Load a model YAML, resolving scale from the filename (yolov12n → scale 'n')."""
    path = Path(path)
    stem = path.stem
    unified = re.sub(r"(\d+)([nslmx])(.*)$", r"\1\3", stem)  # yolov12n → yolov12
    if unified == stem:
        unified = re.sub(r"-([nslmx])$", "", stem)            # fastsam-s → fastsam
    candidates = [path]
    for d in MODEL_CFG_DIRS:
        candidates += [d / path.name, d / f"{unified}.yaml"]
    file = next((c for c in candidates if c.exists()), None)
    if file is None:
        raise FileNotFoundError(f"model yaml '{path}' not found in {MODEL_CFG_DIRS}")
    d = yaml_load(file, append_filename=True)
    if unified != stem and d.get("scales"):
        m = re.search(r"\d+([nslmx])", stem) or re.search(r"-([nslmx])$", stem)
        if m:
            d["scale"] = m.group(1)
    return d


class DetectionModel:
    """Host-side model object: parsed graph + flax Network + params.

    Reference DetectionModel (tasks.py:333-423). Pure-functional core: params
    live in `self.variables` (a flax FrozenDict of params + batch_stats) and
    every compute path takes them explicitly.
    """

    def __init__(self, cfg="yolov12-sod-fusion-v5-simple.yaml", ch: int = 3,
                 nc: Optional[int] = None, verbose: bool = False):
        self.yaml = cfg if isinstance(cfg, dict) else yaml_model_load(cfg)
        if nc and nc != self.yaml.get("nc"):
            LOGGER.info(f"overriding model.yaml nc={self.yaml.get('nc')} with nc={nc}")
            self.yaml["nc"] = nc
        self.graph = parse_model(self.yaml, ch=ch, verbose=verbose)
        self.nc = self.graph.nc
        # (The r2/r3 opt-in int8 activation boundary at P2 was removed after
        # an end-to-end A/B measured it as a 0.96x REGRESSION: the
        # quant/dequant pair ADDED 0.8 GB/batch of traffic instead of
        # halving the boundary tensor — XLA materialized both the int8 copy
        # and the f32 operands around it. PERF.md round-4 A/B table.)
        self.net = Network(self.graph)
        self.stride = np.array(self.graph.detect_strides or (8, 16, 32))
        self.names = {i: f"{i}" for i in range(self.nc)}
        self.ch = ch
        self.variables = None
        self.task = "detect"

    # -- parameter lifecycle -------------------------------------------------
    def init(self, rng: Optional[jax.Array] = None, imgsz: int = 256):
        """Initialize variables with a dummy NHWC batch.

        Param shapes depend only on channel counts, never the spatial size
        (pinned by tests/test_model_build.py's tree-equality check), so the
        trace ALWAYS runs at the smallest stride-valid size (2x max stride —
        64^2 for a P2-P5 model) regardless of the serving imgsz: init cost is
        O(smallest graph), not O(serving resolution). The requested `imgsz`
        is only a fallback for exotic graphs whose trace needs more pixels.
        """
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        # Trace with train=True so train-only branches (v10Detect's one2many
        # towers) materialize their params at init.
        # jit the init trace: eager flax init dispatches every conv/norm op
        # one by one on the host (105 s for E1 on CPU; 14.5 s compiled).
        # rng and dummy are jit ARGUMENTS: closure-captured device arrays
        # lower as MLIR constants and cost a device->host fetch each.
        # The compiled init executable is additionally AOT-cached on disk
        # (utils/aot.py): the graph is weight-free (inputs are rng + zeros),
        # so a fresh process pays an abstract re-trace + deserialize instead
        # of the ~20 s init-graph XLA compile (VERDICT r4 weak #5).
        fn = lambda r, d: self.net.init(r, d, train=True)  # noqa: E731
        key = "init:" + hashlib.sha256(
            json.dumps(self.yaml, sort_keys=True, default=str).encode()
        ).hexdigest()[:16]

        def run_init(sz):
            from yolo_sod_tpu.utils.aot import cached_compile

            dummy = jnp.zeros((1, sz, sz, self.ch), jnp.float32)
            try:
                compiled, stats = cached_compile(fn, (rng, dummy), key)
                self.init_timings = stats
            except Exception as e:
                LOGGER.warning(f"AOT init cache unavailable ({e}); jit path")
                compiled = jax.jit(fn)
                self.init_timings = {"cache": "error"}
            return compiled(rng, dummy)

        self.variables = self._init_size_fallback(
            run_init, imgsz,
            abstract_init=lambda sz: jax.eval_shape(
                fn, rng, jnp.zeros((1, sz, sz, self.ch), jnp.float32)))
        return self.variables

    def _init_size_fallback(self, run_init, imgsz: int, abstract_init=None):
        """Run `run_init(size)` at the smallest stride-valid size, retrying
        at the requested imgsz for exotic graphs whose trace needs more
        pixels (the shared retry loop of DetectionModel/WorldModel init)."""
        smax = int(self.stride.max())
        imgsz = int(math.ceil(max(imgsz, smax * 2) / smax) * smax)
        sizes = list(dict.fromkeys((smax * 2, imgsz)))
        for i, sz in enumerate(sizes):
            try:
                out = run_init(sz)
            except Exception as e:
                if i == len(sizes) - 1:
                    raise
                LOGGER.warning(f"init trace at {sz}x{sz} failed ({e}); "
                               f"retrying at {sizes[i + 1]}x{sizes[i + 1]}")
                continue
            # Channels-only invariant guard: the fast path inits at 2*stride
            # regardless of the serving imgsz, which is only sound while no
            # module's PARAM shapes depend on the spatial size. A module that
            # violates this would init "successfully" with wrong shapes and
            # fail only at serving/checkpoint-load time — opt into the cheap
            # abstract cross-check (no compile, no device work) to fail at
            # init instead.
            if (sz != imgsz and i == 0 and abstract_init is not None
                    and os.environ.get("YOLO_SOD_INIT_SHAPECHECK")):
                ref = abstract_init(imgsz)
                got = jax.tree_util.tree_map(lambda a: a.shape, out)
                want = jax.tree_util.tree_map(lambda a: a.shape, ref)
                if got != want:
                    raise RuntimeError(
                        f"param shapes from the {sz}x{sz} init trace differ "
                        f"from the requested {imgsz}x{imgsz} trace — a module "
                        "in this graph has spatial-size-dependent params; "
                        "init must run at the serving size")
            return out

    @property
    def params(self):
        return self.variables["params"] if self.variables else None

    def num_params(self) -> int:
        if self.variables is None:
            self.init()
        leaves = jax.tree_util.tree_leaves(self.variables["params"])
        return int(sum(np.prod(l.shape) for l in leaves))

    # -- deploy-time reparameterization ---------------------------------------
    def fuse(self):
        """Fold every RepConv's train branches into one biased 3x3
        (reference BaseModel.fuse tasks.py:201-227 + RepConv.fuse_convs
        conv.py:228-286). A checkpoint transform here: params are rewritten
        by utils/reparam.fuse_rep_variables and subsequent traces run under
        `rep_deploy()` so the graph instantiates the single fused conv.
        No-op (and cheap) when the graph contains no RepConv."""
        from yolo_sod_tpu.utils.reparam import fuse_rep_variables

        if getattr(self, "_rep_deploy", False):
            return self
        if self.variables is None:
            self.init()
        fused, n = fuse_rep_variables(self.variables)
        if n:
            self.variables = fused
            self._rep_deploy = True
            LOGGER.info(f"fused {n} RepConv blocks to deploy form")
        return self

    def _deploy_ctx(self):
        from yolo_sod_tpu.nn.modules.standard import rep_deploy

        return rep_deploy(True) if getattr(self, "_rep_deploy", False) \
            else contextlib.nullcontext()

    # -- compute paths -------------------------------------------------------
    def apply(self, variables, x, train: bool = False, active_mask=None,
              mutable: bool = False):
        """Raw forward: returns per-level head maps (train format)."""
        with self._deploy_ctx():
            if mutable:
                return self.net.apply(variables, x, train=train,
                                      active_mask=active_mask,
                                      mutable=["batch_stats"])
            return self.net.apply(variables, x, train=train,
                                  active_mask=active_mask)

    def embed(self, variables, x, indices=None):
        """Image embeddings: GAP'd feature vectors of the given layer
        indices, concatenated (reference Model.embed engine/model.py:467 →
        tasks.py:188-191; default = second-to-last layer). Returns (B, D)."""
        if not indices:
            indices = [len(self.graph.specs) - 2]
        with self._deploy_ctx():
            return self.net.apply(variables, x, train=False,
                                  embed=tuple(int(i) for i in indices))

    def predict(self, variables, x):
        """Inference forward + decode → (B, A, 4+nc) with pixel xywh boxes.

        Uniform across head families: Detect/DetectStable/v10Detect decode
        per-level maps through DFL+dist2bbox; RTDETRDecoder already emits
        decoded normalized boxes (scaled to pixels here); Segment/Pose/OBB
        decode their detect part (extra outputs via apply())."""
        head = self.graph.specs[self.graph.detect_index].name \
            if self.graph.detect_index >= 0 else "Detect"
        with self._deploy_ctx():
            out = self.net.apply(variables, x, train=False)
        if head == "RTDETRDecoder":
            h, w = x.shape[1], x.shape[2]
            scale = jnp.array([w, h, w, h], out.dtype)
            return jnp.concatenate([out[..., :4] * scale, out[..., 4:]], -1)
        if head in ("Segment", "Pose", "OBB"):
            out = out[0]
        return decode_detections(out, self.graph.detect_strides, self.nc)

    def predict_augment(self, variables, x):
        """TTA inference (reference tasks.py:381-418): 3 passes at scales
        [1, 0.83, 0.67] with an lr-flip on the middle one; predictions
        de-scaled/de-flipped back and concatenated along the anchor axis.
        All sizes are static, so the whole TTA ensemble compiles into one
        graph. Tail clipping (reference _clip_augmented) drops the coarsest
        level of the up-scaled pass and the finest level of the down-scaled
        pass, matching the reference's P-level trust heuristic.

        End-to-end heads (v10Detect's NMS-free top-k, RT-DETR's query
        decoder) don't have per-anchor level maps to scale-merge — like the
        reference (tasks.py:381-418), warn and fall back to single-scale.
        """
        head = self.graph.specs[self.graph.detect_index].name \
            if self.graph.detect_index >= 0 else "Detect"
        if head in ("v10Detect", "RTDETRDecoder", "DETRAuxHead"):
            LOGGER.warning(
                f"WARNING: {head} does not support 'augment=True' prediction; "
                "reverting to single-scale")
            return self.predict(variables, x)
        B, H, W, C = x.shape
        gs = int(self.stride.max())
        outs = []
        for si, flip in ((1.0, False), (0.83, True), (0.67, False)):
            h = int(math.ceil(H * si / gs) * gs)
            w = int(math.ceil(W * si / gs) * gs)
            xi = x[:, :, ::-1] if flip else x
            if (h, w) != (H, W):
                xi = jax.image.resize(xi, (B, h, w, C), method="bilinear")
            p = self.predict(variables, xi)            # (B, A_i, 4+nc)
            # de-scale boxes back to the original resolution
            sx, sy = W / w, H / h
            boxes = p[..., :4] * jnp.array([sx, sy, sx, sy], p.dtype)
            if flip:
                boxes = boxes.at[..., 0].set(W - boxes[..., 0])
            outs.append(jnp.concatenate([boxes, p[..., 4:]], -1))

        # Tail clipping: drop the last (coarsest) level from the full-scale
        # pass and the first (finest) level from the most-downscaled pass.
        def level_sizes(scale_h, scale_w):
            return [int(math.ceil(H * scale_h / s) * math.ceil(W * scale_w / s))
                    for s in self.graph.detect_strides]

        def trim(p, sizes, drop_first=False, drop_last=False):
            if drop_last:
                return p[:, : sum(sizes[:-1])]
            if drop_first:
                return p[:, sizes[0]:]
            return p

        s0 = [int(math.ceil(H / s)) * int(math.ceil(W / s))
              for s in self.graph.detect_strides]
        outs[0] = trim(outs[0], s0, drop_last=True)
        h2 = int(math.ceil(H * 0.67 / gs) * gs)
        w2 = int(math.ceil(W * 0.67 / gs) * gs)
        s2 = [int(math.ceil(h2 / s)) * int(math.ceil(w2 / s))
              for s in self.graph.detect_strides]
        outs[-1] = trim(outs[-1], s2, drop_first=True)
        return jnp.concatenate(outs, axis=1)

    def info(self, imgsz: int = 640):
        n = self.num_params()
        LOGGER.info(f"{colorstr('model:')} {len(self.graph.specs)} layers, {n:,} parameters")
        return len(self.graph.specs), n


class ClassificationModel(DetectionModel):
    """Image classifier over the same YAML graph machinery
    (reference tasks.py ClassificationModel). predict() returns softmax probs.
    """

    def __init__(self, cfg="yolov12-cls.yaml", ch: int = 3,
                 nc: Optional[int] = None, verbose: bool = False):
        super().__init__(cfg, ch=ch, nc=nc, verbose=verbose)
        self.task = "classify"
        self.stride = np.array([1])

    def predict(self, variables, x):
        logits = self.net.apply(variables, x, train=False)
        return jax.nn.softmax(logits, axis=-1)


class SegmentationModel(DetectionModel):
    """Detect + instance masks (reference tasks.py SegmentationModel).
    predict() returns the decoded detect part; the Segment predictor/validator
    pull coefficients + prototypes through apply()."""

    def __init__(self, cfg="yolov12-seg.yaml", ch: int = 3,
                 nc: Optional[int] = None, verbose: bool = False):
        super().__init__(cfg, ch=ch, nc=nc, verbose=verbose)
        self.task = "segment"


class WorldModel(DetectionModel):
    """Open-vocabulary detector (reference tasks.py WorldModel :633).

    Text features ride through the graph as a `guide` side input consumed by
    C2fAttn / WorldDetect and refined by ImagePoolingAttn; `set_classes`
    swaps the vocabulary without touching any parameter (the contrastive
    head is shape-independent of nc), so one set of weights serves any
    class list — offline, once the embeddings are computed.
    """

    def __init__(self, cfg="yolov8s-world.yaml", ch: int = 3,
                 nc: Optional[int] = None, verbose: bool = False):
        super().__init__(cfg, ch=ch, nc=nc, verbose=verbose)
        self.task = "detect"
        spec = self.graph.specs[self.graph.detect_index]
        self.embed_dim = dict(spec.kwargs).get("embed", 512)
        # Placeholder vocabulary (reference :638 uses randn): deterministic,
        # unit-norm, one row per built-time class.
        rng = np.random.default_rng(0)
        t = rng.standard_normal((1, self.nc, self.embed_dim)).astype(np.float32)
        self.txt_feats = t / np.linalg.norm(t, axis=-1, keepdims=True)

    def set_classes(self, names, embedder=None):
        """Embed a new class-name vocabulary and make it the decode target
        (reference :642-661). No parameters change; predictor pipelines
        recompile once because nc (the cls-channel count) is static."""
        from yolo_sod_tpu.utils.text_embed import get_text_embedder

        names = list(names)
        embedder = embedder or get_text_embedder(self.embed_dim)
        feats = np.asarray(embedder(names), np.float32)      # (K, D)
        feats = feats / np.maximum(
            np.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        self.txt_feats = feats[None]
        self.nc = len(names)
        self.names = {i: n for i, n in enumerate(names)}

    def init(self, rng: Optional[jax.Array] = None, imgsz: int = 256):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        initfn = jax.jit(
            lambda r, d, g: self.net.init(r, d, train=True, guide=g))
        guide = jnp.asarray(self.txt_feats)
        self.variables = self._init_size_fallback(
            lambda sz: initfn(rng, jnp.zeros((1, sz, sz, self.ch),
                                             jnp.float32), guide), imgsz)
        return self.variables

    def apply(self, variables, x, train: bool = False, active_mask=None,
              mutable: bool = False, txt_feats=None):
        guide = jnp.asarray(self.txt_feats) if txt_feats is None else txt_feats
        if mutable:
            return self.net.apply(variables, x, train=train,
                                  active_mask=active_mask, guide=guide,
                                  mutable=["batch_stats"])
        return self.net.apply(variables, x, train=train,
                              active_mask=active_mask, guide=guide)

    def predict(self, variables, x, txt_feats=None):
        guide = jnp.asarray(self.txt_feats) if txt_feats is None else txt_feats
        out = self.net.apply(variables, x, train=False, guide=guide)
        return decode_detections(out, self.graph.detect_strides, self.nc)

    def embed(self, variables, x, indices=None):
        """As DetectionModel.embed, with the text guide injected — the neck's
        C2fAttn layers sit before the default embed index and need it."""
        if not indices:
            indices = [len(self.graph.specs) - 2]
        with self._deploy_ctx():
            return self.net.apply(variables, x, train=False,
                                  guide=jnp.asarray(self.txt_feats),
                                  embed=tuple(int(i) for i in indices))


class PoseModel(DetectionModel):
    """Detect + keypoints (reference tasks.py PoseModel :501-520): when the
    dataset declares a kpt_shape different from the model YAML's, the head
    is rebuilt for the data's shape (reference overrides cfg["kpt_shape"])."""

    def __init__(self, cfg="yolov12-pose.yaml", ch: int = 3,
                 nc: Optional[int] = None, verbose: bool = False,
                 data_kpt_shape=None):
        cfg = cfg if isinstance(cfg, dict) else yaml_model_load(cfg)
        if data_kpt_shape is not None:
            ks = list(data_kpt_shape)
            for row in cfg.get("head", []):
                if row[2] == "Pose" and len(row[3]) > 1 and list(row[3][1]) != ks:
                    LOGGER.info(f"overriding model.yaml kpt_shape={row[3][1]} "
                                f"with kpt_shape={ks}")
                    row[3] = [row[3][0], ks, *row[3][2:]]
        super().__init__(cfg, ch=ch, nc=nc, verbose=verbose)
        self.task = "pose"

    @property
    def kpt_shape(self):
        spec = self.graph.specs[self.graph.detect_index]
        return dict(spec.kwargs).get("kpt_shape", (17, 3))


class OBBModel(DetectionModel):
    """Detect + oriented boxes (reference tasks.py OBBModel)."""

    def __init__(self, cfg="yolov12-obb.yaml", ch: int = 3,
                 nc: Optional[int] = None, verbose: bool = False):
        super().__init__(cfg, ch=ch, nc=nc, verbose=verbose)
        self.task = "obb"


class NASModel(DetectionModel):
    """YOLO-NAS-style detector (reference models/nas/model.py:26 NAS wraps a
    super-gradients net whose forward emits *decoded xyxy boxes + class
    scores*; the NASPredictor/NASValidator then convert and NMS,
    predict.py:35-48, val.py:38-50).

    TPU-native re-expression: the architecture itself is a YAML graph built
    from reparameterizable RepConv stages (`cfg/models/yolo-nas-s.yaml` —
    super-gradients' QARepVGG stage recipe) and the NDFL-style DFL head our
    decode already speaks; `predict()` honors the family's output contract by
    emitting xyxy pixel boxes instead of xywh. `fuse()` (inherited) is the
    deploy-time reparameterization that defines this family.
    """

    def __init__(self, cfg="yolo-nas-s.yaml", ch: int = 3,
                 nc: Optional[int] = None, verbose: bool = False):
        super().__init__(cfg, ch=ch, nc=nc, verbose=verbose)
        self.task = "detect"

    def predict(self, variables, x):
        """(B, A, 4+nc) with **xyxy** pixel boxes + sigmoid scores — the
        super-gradients output convention the reference NAS predictor
        consumes (reference nas/predict.py:37: `preds_in[0][0]` is xyxy)."""
        with self._deploy_ctx():
            out = self.net.apply(variables, x, train=False)
        return decode_detections(out, self.graph.detect_strides, self.nc,
                                 xywh=False)


_HEAD2TASK = {"Segment": "segment", "Pose": "pose", "OBB": "obb",
              "Classify": "classify"}


def guess_model_task(cfg) -> str:
    """Infer the task from a model YAML: head-module sniff first (reference
    guess_model_task tasks.py:1206 reads the config's last head row), then a
    filename suffix sniff."""
    name = ""
    try:
        d = cfg if isinstance(cfg, dict) else yaml_model_load(cfg)
        rows = list(d.get("head", [])) or list(d.get("backbone", []))
        for row in reversed(rows):
            m = row[2] if isinstance(row[2], str) else row[2].__name__
            if m in _HEAD2TASK:
                return _HEAD2TASK[m]
            if m in ("Detect", "DetectStable", "v10Detect", "RTDETRDecoder",
                     "WorldDetect"):
                return "detect"
        name = str(d.get("yaml_file", ""))
    except (FileNotFoundError, KeyError, TypeError, IndexError):
        name = str(cfg)
    stem = Path(name).stem.lower()
    for suffix, task in (("-cls", "classify"), ("-seg", "segment"),
                         ("-pose", "pose"), ("-obb", "obb")):
        if suffix in stem:
            return task
    return "detect"
