"""Segment / Pose / OBB task heads (reference nn/modules/head.py: Segment,
Pose, OBB; block.py: Proto).

Each extends Detect with task-specific towers; outputs stay fixed-shape:
- Segment: per-anchor mask coefficients (nm) + prototype masks from P3.
- Pose: per-anchor keypoint regressions (kpt_shape = [K, 2|3]).
- OBB: per-anchor rotation angle channel.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
from flax import linen as nn

from yolo_sod_tpu.nn.modules.conv import ConvBNAct
from yolo_sod_tpu.nn.modules.head import Detect


class Proto(nn.Module):
    """Mask prototypes from the highest-res level (reference block.py Proto):
    conv → LEARNED 2x ConvTranspose upsample (block.py:97, not nearest) →
    conv → conv to nm prototype channels."""

    c1: int
    c_: int = 256
    nm: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(self.c1, self.c_, 3, name="cv1")(x, train)
        x = nn.ConvTranspose(self.c_, (2, 2), strides=(2, 2),
                             padding="VALID", name="upsample")(x)
        x = ConvBNAct(self.c_, self.c_, 3, name="cv2")(x, train)
        return ConvBNAct(self.c_, self.nm, 1, name="cv3")(x, train)


class Segment(Detect):
    """Detect + mask-coefficient towers + Proto (reference head.py Segment).

    Returns (det_maps, coeff_maps, protos): per-level (B, H, W, no) detect
    maps, per-level (B, H, W, nm) coefficients, and (B, 2*H0, 2*W0, nm)
    prototypes from the first (highest-res) input level.
    """

    nm: int = 32
    npr: int = 256

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False,
                 active_mask=None):
        det = Detect.__call__(self, xs, train, active_mask)
        protos = Proto(self.ch[0], self.npr, self.nm, name="proto")(xs[0], train)
        c4 = max(self.ch[0] // 4, self.nm)
        coeffs = []
        for i, (x, c1) in enumerate(zip(xs, self.ch)):
            m = ConvBNAct(c1, c4, 3, name=f"cv4_{i}_0")(x, train)
            m = ConvBNAct(c4, c4, 3, name=f"cv4_{i}_1")(m, train)
            m = nn.Conv(self.nm, (1, 1), name=f"cv4_{i}_2")(m)
            coeffs.append(m)
        return det, coeffs, protos


class Pose(Detect):
    """Detect + keypoint towers (reference head.py Pose). kpt_shape = (K, D)
    with D=2 (x, y) or 3 (x, y, visibility)."""

    kpt_shape: Tuple[int, int] = (17, 3)

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False,
                 active_mask=None):
        det = Detect.__call__(self, xs, train, active_mask)
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(self.ch[0] // 4, nk)
        kpts = []
        for i, (x, c1) in enumerate(zip(xs, self.ch)):
            k = ConvBNAct(c1, c4, 3, name=f"cv4_{i}_0")(x, train)
            k = ConvBNAct(c4, c4, 3, name=f"cv4_{i}_1")(k, train)
            k = nn.Conv(nk, (1, 1), name=f"cv4_{i}_2")(k)
            kpts.append(k)
        return det, kpts


class OBB(Detect):
    """Detect + rotation-angle towers (reference head.py OBB). Angle decodes
    to (angle - 0.25) * pi, i.e. [-pi/4, 3pi/4)."""

    ne: int = 1

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False,
                 active_mask=None):
        det = Detect.__call__(self, xs, train, active_mask)
        c4 = max(self.ch[0] // 4, self.ne)
        angles = []
        for i, (x, c1) in enumerate(zip(xs, self.ch)):
            a = ConvBNAct(c1, c4, 3, name=f"cv4_{i}_0")(x, train)
            a = ConvBNAct(c4, c4, 3, name=f"cv4_{i}_1")(a, train)
            a = nn.Conv(self.ne, (1, 1), name=f"cv4_{i}_2")(a)
            angles.append((jax.nn.sigmoid(a) - 0.25) * math.pi)
        return det, angles
