"""Detection heads (NHWC, flax.linen).

TPU-native re-expression of reference ultralytics/nn/modules/head.py:
Detect :21-172 and detect_stable.py:7-31 (DetectStable).

Design: the head always returns the raw per-level maps (B, H, W, 4*reg_max+nc);
decode (DFL expectation + dist2bbox + sigmoid) lives in
yolo_sod_tpu.ops.decode as a pure function applied inside the same jitted
graph at inference — anchors are trace-time constants, so there is no
reference-style anchor caching / shape check.

DetectStable's per-scale curriculum gating is a runtime (nl,) float mask
multiplied into each level's training output — multiplying by 0 both zeroes
the contribution and kills the gradient, matching the reference's
``yi.detach() * 0.0`` without retracing when the mask flips.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_sod_tpu.nn.modules.conv import ConvBNAct, DWConv


class Detect(nn.Module):
    """YOLO detect head: per-level box (4*reg_max) and cls (nc) conv stacks.

    Reference head.py:21-74. `legacy` selects the v8-style cls tower (two 3x3
    Convs) vs the v10/v12 DW tower; `strides` feed the prior-prob bias init
    (reference bias_init head.py:133-141).
    """

    nc: int = 80
    ch: Tuple[int, ...] = ()
    legacy: bool = True
    strides: Tuple[int, ...] = ()
    reg_max: int = 16
    end2end: bool = False

    @property
    def nl(self):
        return len(self.ch)

    @property
    def no(self):
        return self.nc + self.reg_max * 4

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False,
                 active_mask: jax.Array | None = None):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        strides = self.strides or tuple(8 * 2 ** i for i in range(self.nl))
        outs = []
        for i, (x, c1, s) in enumerate(zip(xs, self.ch, strides)):
            # Box tower: Conv 3x3 → Conv 3x3 → 1x1 to 4*reg_max (bias 1.0).
            b = ConvBNAct(c1, c2, 3, name=f"cv2_{i}_0")(x, train)
            b = ConvBNAct(c2, c2, 3, name=f"cv2_{i}_1")(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True,
                        bias_init=nn.initializers.constant(1.0),
                        name=f"cv2_{i}_2")(b)
            # Cls tower.
            cls_bias = nn.initializers.constant(math.log(5 / self.nc / (640 / s) ** 2))
            if self.legacy:
                c = ConvBNAct(c1, c3, 3, name=f"cv3_{i}_0")(x, train)
                c = ConvBNAct(c3, c3, 3, name=f"cv3_{i}_1")(c, train)
            else:
                c = DWConv(c1, c1, 3, name=f"cv3_{i}_0a")(x, train)
                c = ConvBNAct(c1, c3, 1, name=f"cv3_{i}_0b")(c, train)
                c = DWConv(c3, c3, 3, name=f"cv3_{i}_1a")(c, train)
                c = ConvBNAct(c3, c3, 1, name=f"cv3_{i}_1b")(c, train)
            c = nn.Conv(self.nc, (1, 1), use_bias=True, bias_init=cls_bias,
                        name=f"cv3_{i}_2")(c)
            y = jnp.concatenate([b, c], axis=-1)
            if active_mask is not None:
                # Gate this scale: 0 zeroes the output AND its gradient.
                y = y * active_mask[i].astype(y.dtype)
            outs.append(y)
        return outs


class Classify(nn.Module):
    """Classification head: 1x1 conv → GAP → linear (reference head.py Classify).

    Returns logits (B, nc); softmax happens in the loss / predictor.
    """

    c1: int
    nc: int
    c_: int = 1280

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(self.c1, self.c_, 1, name="conv")(x, train)
        x = jnp.mean(x, axis=(1, 2))                 # GAP -> (B, c_)
        return nn.Dense(self.nc, name="linear")(x)


class v10Detect(Detect):
    """End-to-end (NMS-free) dual head (reference head.py:592-626).

    Training: two parallel tower sets — one2many (TAL topk=10 supervision)
    and one2one (topk=1) consuming stop_gradient'ed features — returned as a
    dict for E2EDetectLoss. Inference: one2one maps only; decode + top-k
    replaces NMS entirely (ops.nms.topk_postprocess), which is the natural
    TPU formulation: fixed shapes, no suppression loop at all.
    """

    end2end: bool = True

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False,
                 active_mask: jax.Array | None = None):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        strides = self.strides or tuple(8 * 2 ** i for i in range(self.nl))

        def towers(prefix, inputs):
            outs = []
            for i, (x, c1, s) in enumerate(zip(inputs, self.ch, strides)):
                b = ConvBNAct(c1, c2, 3, name=f"{prefix}cv2_{i}_0")(x, train)
                b = ConvBNAct(c2, c2, 3, name=f"{prefix}cv2_{i}_1")(b, train)
                b = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True,
                            bias_init=nn.initializers.constant(1.0),
                            name=f"{prefix}cv2_{i}_2")(b)
                # Light cls tower: DW 3x3 + 1x1, twice (reference :617-621).
                cls_bias = nn.initializers.constant(
                    math.log(5 / self.nc / (640 / s) ** 2))
                c = ConvBNAct(c1, c1, 3, g=c1, name=f"{prefix}cv3_{i}_0a")(x, train)
                c = ConvBNAct(c1, c3, 1, name=f"{prefix}cv3_{i}_0b")(c, train)
                c = ConvBNAct(c3, c3, 3, g=c3, name=f"{prefix}cv3_{i}_1a")(c, train)
                c = ConvBNAct(c3, c3, 1, name=f"{prefix}cv3_{i}_1b")(c, train)
                c = nn.Conv(self.nc, (1, 1), use_bias=True, bias_init=cls_bias,
                            name=f"{prefix}cv3_{i}_2")(c)
                outs.append(jnp.concatenate([b, c], axis=-1))
            return outs

        one2one = towers("one2one_", [jax.lax.stop_gradient(x) for x in xs]
                         if train else xs)
        if not train:
            return one2one
        one2many = towers("", xs)
        return {"one2many": one2many, "one2one": one2one}


class DetectStable(Detect):
    """Detect with per-scale curriculum gating (reference detect_stable.py:7-31).

    Identical parameters to Detect; the gating happens through the
    `active_mask` argument of __call__ which the trainer controls as a
    runtime array — no retrace on mask flips.
    """
