"""Asset download helpers (reference utils/downloads.py:510 — GitHub release
assets, dataset zips). This deployment runs with zero network egress, so
downloads resolve strictly against local caches; the API surface is kept so
calling code ports unchanged."""

from __future__ import annotations

import zipfile
from pathlib import Path

from yolo_sod_tpu.utils import LOGGER

ASSET_DIRS = (Path.cwd(), Path.cwd() / "weights", Path.home() / ".cache" / "yolo_sod_tpu")


def attempt_download_asset(file, repo: str = "", release: str = "") -> str:
    """Resolve an asset from local caches; raises with guidance when absent
    (no egress in this environment)."""
    p = Path(file)
    if p.exists():
        return str(p)
    for d in ASSET_DIRS:
        cand = d / p.name
        if cand.exists():
            return str(cand)
    raise FileNotFoundError(
        f"asset '{file}' not found locally and network egress is disabled; "
        f"place it under one of {[str(d) for d in ASSET_DIRS]}")


def unzip_file(file, path=None, exist_ok: bool = False) -> Path:
    """Extract a zip next to itself (reference unzip_file)."""
    file = Path(file)
    path = Path(path or file.parent)
    dest = path / file.stem
    if dest.exists() and not exist_ok:
        return dest
    with zipfile.ZipFile(file) as z:
        z.extractall(dest)
    LOGGER.info(f"unzipped {file} -> {dest}")
    return dest


def safe_download(url, file=None, **kwargs):
    raise RuntimeError("network egress is disabled in this environment; "
                       "stage files locally instead")
