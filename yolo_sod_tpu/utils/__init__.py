"""Runtime utilities: logging, YAML IO, config namespace, paths.

TPU-native analog of the reference's runtime layer (reference:
ultralytics/utils/__init__.py — LOGGER :392, yaml_load/save, colorstr :826,
IterableSimpleNamespace, SettingsManager :1155). Torch-free.
"""

from __future__ import annotations

import json
import logging
import os
import re
import sys
import threading
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import yaml

# ---------------------------------------------------------------------------
# Paths / constants
# ---------------------------------------------------------------------------
FILE = Path(__file__).resolve()
ROOT = FILE.parents[1]  # yolo_sod_tpu package root
DEFAULT_CFG_PATH = ROOT / "cfg" / "default.yaml"
RUNS_DIR = Path(os.getenv("YOLO_RUNS_DIR", "runs"))
USER_CONFIG_DIR = Path(os.getenv("YOLO_CONFIG_DIR", Path.home() / ".config" / "yolo_sod_tpu"))
SETTINGS_FILE = USER_CONFIG_DIR / "settings.json"
NUM_THREADS = min(8, max(1, os.cpu_count() - 1))
VERBOSE = str(os.getenv("YOLO_VERBOSE", True)).lower() == "true"
MACOS, LINUX, WINDOWS = (sys.platform.startswith(x) for x in ("darwin", "linux", "win"))


# ---------------------------------------------------------------------------
# Logging
# ---------------------------------------------------------------------------
def set_logging(name: str = "yolo_sod_tpu", verbose: bool = True) -> logging.Logger:
    """Configure the package logger (stdout stream handler, INFO/ERROR)."""
    level = logging.INFO if verbose else logging.ERROR
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter("%(message)s"))
        handler.setLevel(level)
        logger.addHandler(handler)
    logger.propagate = False
    return logger


LOGGER = set_logging(verbose=VERBOSE)


def colorstr(*input):
    """Colorize a string for terminal output, e.g. colorstr('blue', 'bold', 'hello')."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m", "yellow": "\033[33m",
        "blue": "\033[34m", "magenta": "\033[35m", "cyan": "\033[36m", "white": "\033[37m",
        "bright_black": "\033[90m", "bright_red": "\033[91m", "bright_green": "\033[92m",
        "bright_yellow": "\033[93m", "bright_blue": "\033[94m", "bright_magenta": "\033[95m",
        "bright_cyan": "\033[96m", "bright_white": "\033[97m",
        "end": "\033[0m", "bold": "\033[1m", "underline": "\033[4m",
    }
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


def emojis(string: str = "") -> str:
    """Return a platform-safe version of a string (strip emojis on Windows)."""
    return string.encode().decode("ascii", "ignore") if WINDOWS else string


# ---------------------------------------------------------------------------
# Namespaces & YAML IO
# ---------------------------------------------------------------------------
class IterableSimpleNamespace(SimpleNamespace):
    """SimpleNamespace that supports iteration over (key, value) pairs and dict-like get."""

    def __iter__(self):
        return iter(vars(self).items())

    def __str__(self):
        return "\n".join(f"{k}={v}" for k, v in vars(self).items())

    def get(self, key, default=None):
        return getattr(self, key, default)


def yaml_load(file, append_filename: bool = False) -> dict:
    """Load a YAML file into a dict, tolerating BOM / code fences (reference: train.py:117-202)."""
    path = Path(file)
    text = path.read_text(encoding="utf-8", errors="ignore")
    # Strip code fences and stray 'yaml' header lines that LLM-generated configs carry.
    text = re.sub(r"^\s*```[a-zA-Z]*\s*$", "", text, flags=re.MULTILINE)
    text = text.lstrip("﻿")
    data = yaml.safe_load(text) or {}
    if append_filename:
        data["yaml_file"] = str(file)
    return data


def yaml_save(file, data: dict, header: str = ""):
    """Save a dict to a YAML file."""
    path = Path(file)
    path.parent.mkdir(parents=True, exist_ok=True)
    valid = {k: (str(v) if isinstance(v, Path) else v) for k, v in data.items()}
    with open(path, "w", encoding="utf-8") as f:
        if header:
            f.write(header)
        yaml.safe_dump(valid, f, sort_keys=False, allow_unicode=True)


def yaml_print(file_or_dict):
    """Pretty-print a YAML file or dict."""
    d = yaml_load(file_or_dict) if isinstance(file_or_dict, (str, Path)) else file_or_dict
    LOGGER.info(yaml.safe_dump(d, sort_keys=False, allow_unicode=True))


# ---------------------------------------------------------------------------
# Settings persistence (reference: utils/__init__.py:1062 JSONDict, :1155 SettingsManager)
# ---------------------------------------------------------------------------
class JSONDict(dict):
    """Dict persisted to a JSON file on every mutation, with a lock."""

    def __init__(self, file_path=SETTINGS_FILE):
        super().__init__()
        self.file_path = Path(file_path)
        self.lock = threading.Lock()
        self._load()

    def _load(self):
        if self.file_path.exists():
            try:
                with open(self.file_path) as f:
                    super().update(json.load(f))
            except Exception:
                pass

    def _save(self):
        try:
            self.file_path.parent.mkdir(parents=True, exist_ok=True)
            with open(self.file_path, "w") as f:
                json.dump(dict(self), f, indent=2)
        except Exception as e:
            LOGGER.warning(f"settings save failed: {e}")

    def __setitem__(self, key, value):
        with self.lock:
            super().__setitem__(key, value)
            self._save()

    def update(self, *args, **kwargs):
        with self.lock:
            super().update(*args, **kwargs)
            self._save()


class SettingsManager(JSONDict):
    """Persistent framework settings with defaults (datasets_dir, weights_dir, runs_dir)."""

    def __init__(self, file_path=SETTINGS_FILE):
        self.defaults = {
            "settings_version": "1.0.0",
            "datasets_dir": str(Path.cwd() / "datasets"),
            "weights_dir": str(Path.cwd() / "weights"),
            "runs_dir": str(Path.cwd() / "runs"),
            "sync": False,  # no telemetry
            "tensorboard": True,
            "wandb": False,
        }
        super().__init__(file_path)
        for k, v in self.defaults.items():
            self.setdefault(k, v)


SETTINGS = SettingsManager()


# ---------------------------------------------------------------------------
# Misc helpers
# ---------------------------------------------------------------------------
class TryExcept:
    """Context manager / decorator that logs exceptions instead of raising (reference: utils/__init__.py:897)."""

    def __init__(self, msg="", verbose=True):
        self.msg, self.verbose = msg, verbose

    def __enter__(self):
        return self

    def __exit__(self, exc_type, value, tb):
        if self.verbose and value:
            LOGGER.warning(f"{self.msg}{': ' if self.msg else ''}{value}")
        return True

    def __call__(self, func):
        def wrapper(*a, **kw):
            with self:
                return func(*a, **kw)
        return wrapper


def threaded(func):
    """Run a function in a daemon thread (reference: utils/__init__.py:970)."""
    def wrapper(*args, **kwargs):
        t = threading.Thread(target=func, args=args, kwargs=kwargs, daemon=True)
        t.start()
        return t
    return wrapper


def clean_url(url: str) -> str:
    return str(url).split("?")[0]


def init_seeds(seed: int = 0):
    """Seed numpy + python for reproducible host-side augmentation order."""
    import random
    random.seed(seed)
    np.random.seed(seed)


class Profile:
    """Accumulating wall-clock timer context (reference: utils/ops.py:17-60).

    On TPU the device work is async; callers should block on outputs
    (e.g. jax.block_until_ready) inside the context for honest timings.
    """

    def __init__(self, t: float = 0.0):
        self.t = t
        self.dt = 0.0

    def __enter__(self):
        import time
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        import time
        self.dt = time.perf_counter() - self._start
        self.t += self.dt

    def __str__(self):
        return f"{self.t:.6f}s"


def TQDM(iterable, total=None, desc: str = "", **kwargs):
    """Progress bar (reference utils/__init__.py:122): tqdm when a TTY wants
    it, else a plain passthrough with a no-op set_postfix_str."""
    try:
        from tqdm import tqdm

        return tqdm(iterable, total=total, desc=desc,
                    bar_format="{l_bar}{bar:10}{r_bar}", **kwargs)
    except Exception:
        class _Plain:
            def __init__(self, it):
                self.it = it

            def __iter__(self):
                return iter(self.it)

            def set_postfix_str(self, s):
                pass

        return _Plain(iterable)


def increment_path(path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """runs/exp -> runs/exp2, exp3, ... (reference utils/files.py)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        base, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = Path(f"{base}{sep}{n}{suffix}")
            if not p.exists():
                path = p
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path
