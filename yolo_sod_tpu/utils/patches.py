"""IO robustness wrappers (reference utils/patches.py: unicode-safe cv2
imread/imwrite, retrying save)."""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np


def imread(filename: str, flags: int | None = None):
    """Unicode-path-safe cv2.imread."""
    import cv2

    flags = cv2.IMREAD_COLOR if flags is None else flags
    return cv2.imdecode(np.fromfile(filename, np.uint8), flags)


def imwrite(filename: str, img, params=None) -> bool:
    """Unicode-path-safe cv2.imwrite."""
    import cv2

    try:
        ok, buf = cv2.imencode(Path(filename).suffix, img, params or [])
        if ok:
            buf.tofile(filename)
        return bool(ok)
    except Exception:
        return False


def save_with_retry(save_fn, *args, retries: int = 3, delay: float = 0.5, **kwargs):
    """Retry a flaky save (reference torch.save retry wrapper)."""
    for i in range(retries + 1):
        try:
            return save_fn(*args, **kwargs)
        except Exception:
            if i == retries:
                raise
            time.sleep(delay * (2 ** i))
