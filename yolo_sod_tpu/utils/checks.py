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


def check_suffix(file, suffix=(".ckpt", ".msgpack"), msg: str = ""):
    """Assert file suffix(es) (reference check_suffix). Accepts a str or a
    list of files; empty suffix disables the check."""
    if not (file and suffix):
        return
    if isinstance(suffix, str):
        suffix = (suffix,)
    for f in file if isinstance(file, (list, tuple)) else [file]:
        s = Path(str(f)).suffix.lower().strip()
        if s and s not in suffix:
            raise ValueError(f"{msg}{f} acceptable suffix is {suffix}, not {s}")


def check_python(minimum: str = "3.10.0", hard: bool = True) -> bool:
    """Current interpreter meets the minimum (reference check_python)."""
    import platform

    return check_version(platform.python_version(), f">={minimum}",
                         name="Python", hard=hard)


def check_file(file, suffix="", hard: bool = True):
    """Resolve a local file: exact path first, then a recursive search under
    the package tree (reference check_file minus the URL-download leg —
    remote assets route through utils/downloads.safe_download explicitly)."""
    from yolo_sod_tpu.utils import ROOT

    if suffix:
        check_suffix(file, suffix)
    file = str(file).strip()
    if not file or Path(file).exists():
        return file
    matches = sorted(ROOT.rglob(Path(file).name))
    if not matches:
        if hard:
            raise FileNotFoundError(f"'{file}' does not exist")
        return None
    return str(matches[0])


def check_is_path_safe(basedir, path) -> bool:
    """True iff `path` resolves inside `basedir` — no traversal/symlink
    escape (reference check_is_path_safe; guards archive extraction)."""
    base, target = Path(basedir).resolve(), Path(path).resolve()
    return target.parts[: len(base.parts)] == base.parts


def check_jax(minimum: str = "0.4.30", hard: bool = False) -> bool:
    """The platform probe this framework actually needs (the reference's
    check_torchvision compat matrix + check_amp have no TPU analog: bf16 is
    native with f32 MXU accumulation). Verifies the jax/jaxlib pair is
    recent enough for the APIs we rely on (Pallas TPU lowering, NamedSharding
    trees, persistent compile cache) and warns when no accelerator backend
    is attached."""
    import jax

    ok = check_version(jax.__version__, f">={minimum}", name="jax", hard=hard)
    try:
        platform = jax.devices()[0].platform
        if platform not in ("tpu", "axon", "gpu"):
            LOGGER.warning(
                f"jax backend is '{platform}' — TPU not attached; compute "
                "will run on CPU (fine for tests, wrong for serving)")
    except Exception as e:
        LOGGER.warning(f"jax backend probe failed: {e}")
        ok = False
    return ok


def collect_system_info() -> dict:
    """Environment summary (reference collect_system_info, TPU-flavored):
    interpreter, key library versions, device inventory with memory."""
    import platform

    import jax

    import yolo_sod_tpu

    info = {
        "yolo-sod-tpu": yolo_sod_tpu.__version__,
        "python": platform.python_version(),
        "platform": platform.platform(),
        "jax": jax.__version__,
    }
    for mod in ("flax", "optax", "numpy"):
        try:
            info[mod] = __import__(mod).__version__
        except Exception:
            info[mod] = None
    try:
        devs = jax.devices()
        info["devices"] = [d.device_kind for d in devs]
    except Exception:
        devs, info["devices"] = [], []
    try:
        # memory_stats raises on some backends — must not wipe the
        # already-collected device list.
        stats = getattr(devs[0], "memory_stats", lambda: None)() if devs else None
        if stats and "bytes_limit" in stats:
            info["hbm_gb"] = round(stats["bytes_limit"] / 2**30, 1)
    except Exception:
        pass
    return info


def check_yolo(verbose: bool = True) -> str:
    """One-line environment banner (reference check_yolo / yolo checks)."""
    import yolo_sod_tpu

    info = collect_system_info()
    devs = ", ".join(info.get("devices") or ["cpu-only"])
    s = (f"yolo-sod-tpu {yolo_sod_tpu.__version__} "
         f"Python-{info['python']} jax-{info['jax']} ({devs})")
    if verbose:
        LOGGER.info(s)
    return s


def print_args(args: dict | None = None):
    """Log a {k: v} namespace compactly (reference print_args)."""
    from yolo_sod_tpu.utils import colorstr

    if not args:
        return
    s = ", ".join(f"{k}={v}" for k, v in sorted(dict(args).items()))
    LOGGER.info(f"{colorstr('args:')} {s}")
