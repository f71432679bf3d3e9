"""Validation helpers (reference utils/checks.py: check_imgsz :xx,
check_version, check_yaml). The reference's AMP probe (checks.py:648 — a real
dual forward comparing fp32 vs AMP) has no TPU analog: bf16 is native with
fp32 MXU accumulation, so there is nothing to probe.
"""

from __future__ import annotations

import re
from pathlib import Path

from yolo_sod_tpu.utils import LOGGER


def check_imgsz(imgsz, stride: int = 32, min_dim: int = 1, floor: int = 0):
    """Round image size(s) up to a stride multiple (reference check_imgsz)."""
    if isinstance(imgsz, (int, float)):
        sizes = [int(imgsz)]
    else:
        sizes = [int(x) for x in imgsz]
    out = [max(((x + stride - 1) // stride) * stride, floor) for x in sizes]
    if out != sizes:
        LOGGER.warning(f"imgsz {sizes} not multiple of stride {stride}; using {out}")
    if min_dim == 2 and len(out) == 1:
        out = out * 2
    return out[0] if (min_dim == 1 and len(out) == 1) else out


def parse_version(v: str):
    return tuple(int(x) for x in re.findall(r"\d+", v)[:3])


def check_version(current: str, required: str = "", name: str = "version",
                  hard: bool = False) -> bool:
    """'>=1.2.3'-style constraint check (reference check_version)."""
    if not required:
        return True
    ok = True
    c = parse_version(current)
    for constraint in required.split(","):
        m = re.match(r"([<>=!]*)\s*([\d.]+)", constraint.strip())
        if not m:
            continue
        op, ver = m.group(1) or ">=", parse_version(m.group(2))
        ok &= {">=": c >= ver, ">": c > ver, "<=": c <= ver, "<": c < ver,
               "==": c == ver, "!=": c != ver}.get(op, True)
    if not ok:
        msg = f"{name} {required} required, found {current}"
        if hard:
            raise ModuleNotFoundError(msg)
        LOGGER.warning(msg)
    return ok


def check_yaml(file, suffix=(".yaml", ".yml")):
    """Verify the file exists and is a YAML (reference check_yaml)."""
    path = Path(file)
    if path.suffix not in suffix:
        raise ValueError(f"{file} is not a YAML file")
    return str(path)


def check_requirements(*args, **kwargs) -> bool:
    """No-op: this image is hermetic — nothing may be pip-installed."""
    return True
