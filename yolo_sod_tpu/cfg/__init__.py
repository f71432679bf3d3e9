"""Config layer: default namespace, override merging, CLI entrypoint.

TPU-native analog of reference ultralytics/cfg/__init__.py (get_cfg :268,
entrypoint :817, check_cfg type validation).
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Any

from yolo_sod_tpu.utils import (
    DEFAULT_CFG_PATH,
    LOGGER,
    IterableSimpleNamespace,
    colorstr,
    yaml_load,
)

MODES = frozenset({"train", "val", "predict", "export", "track", "benchmark"})
TASKS = frozenset({"detect", "segment", "classify", "pose", "obb"})

TASK2DATA = {"detect": "coco8.yaml", "segment": "coco8-seg.yaml", "classify": "imagenet10",
             "pose": "coco8-pose.yaml", "obb": "dota8.yaml"}
TASK2MODEL = {"detect": "yolov12-sod-fusion-v5-simple.yaml", "segment": "yolov12-seg.yaml",
              "classify": "yolov12-cls.yaml", "pose": "yolov12-pose.yaml", "obb": "yolov12-obb.yaml"}
TASK2METRIC = {"detect": "metrics/mAP50-95(B)", "segment": "metrics/mAP50-95(M)",
               "classify": "metrics/accuracy_top1", "pose": "metrics/mAP50-95(P)",
               "obb": "metrics/mAP50-95(B)"}

# Keys validated by type (reference check_cfg); each set lists keys of that kind.
CFG_FLOAT_KEYS = frozenset({"warmup_epochs", "box", "cls", "dfl", "degrees", "shear", "time",
                            "workspace", "batch"})
CFG_FRACTION_KEYS = frozenset({"dropout", "lrf", "momentum", "weight_decay", "warmup_momentum",
                               "warmup_bias_lr", "hsv_h", "hsv_s", "hsv_v", "translate", "scale",
                               "perspective", "flipud", "fliplr", "bgr", "mosaic", "mixup",
                               "copy_paste", "conf", "iou", "fraction", "erasing", "crop_fraction", "lr0"})
CFG_INT_KEYS = frozenset({"epochs", "patience", "workers", "seed", "close_mosaic", "mask_ratio",
                          "max_det", "vid_stride", "line_width", "nbs", "save_period",
                          "spatial"})
CFG_BOOL_KEYS = frozenset({"save", "exist_ok", "verbose", "deterministic", "single_cls", "rect",
                           "cos_lr", "overlap_mask", "val", "save_json", "save_hybrid", "half",
                           "dnn", "plots", "show", "save_txt", "save_conf", "save_crop",
                           "save_frames", "show_labels", "show_conf", "visualize", "augment",
                           "agnostic_nms", "retina_masks", "show_boxes", "keras", "optimize",
                           "int8", "dynamic", "simplify", "nms", "profile", "multi_scale", "ema",
                           "donate"})

DEFAULT_CFG_DICT = yaml_load(DEFAULT_CFG_PATH)
for _k, _v in DEFAULT_CFG_DICT.items():
    if isinstance(_v, str) and _v.lower() == "none":
        DEFAULT_CFG_DICT[_k] = None
DEFAULT_CFG = IterableSimpleNamespace(**DEFAULT_CFG_DICT)


def cfg2dict(cfg) -> dict:
    """Convert a config object (path / dict / namespace) to a dict."""
    if isinstance(cfg, (str, Path)):
        return yaml_load(cfg)
    if isinstance(cfg, IterableSimpleNamespace):
        return vars(cfg)
    return dict(cfg)


def check_cfg(cfg: dict, hard: bool = True):
    """Validate config value types/ranges in place."""
    for k, v in cfg.items():
        if v is None:
            continue
        if k in CFG_FLOAT_KEYS and not isinstance(v, (int, float)):
            if hard:
                raise TypeError(f"'{k}={v}' must be int or float")
            cfg[k] = float(v)
        elif k in CFG_FRACTION_KEYS:
            if not isinstance(v, (int, float)):
                if hard:
                    raise TypeError(f"'{k}={v}' must be int or float")
                cfg[k] = float(v)
            if not 0.0 <= float(cfg[k]) <= 1.0:
                raise ValueError(f"'{k}={v}' must be in [0, 1]")
        elif k in CFG_INT_KEYS and not isinstance(v, int):
            if hard:
                raise TypeError(f"'{k}={v}' must be int")
            cfg[k] = int(v)
        elif k in CFG_BOOL_KEYS and not isinstance(v, bool):
            if hard:
                raise TypeError(f"'{k}={v}' must be bool")
            cfg[k] = bool(v)


def get_cfg(cfg=DEFAULT_CFG_DICT, overrides: dict | None = None) -> IterableSimpleNamespace:
    """Merge a base config with overrides (right-most wins) and validate."""
    cfg = cfg2dict(cfg)
    if overrides:
        overrides = cfg2dict(overrides)
        overrides.pop("save_dir", None)
        cfg = {**cfg, **overrides}
    for k in ("project", "name"):
        if k in cfg and isinstance(cfg[k], (int, float)):
            cfg[k] = str(cfg[k])
    if cfg.get("name") == "model" and cfg.get("model"):
        cfg["name"] = str(cfg["model"]).rpartition(".")[0]
    check_cfg(cfg, hard=False)
    return IterableSimpleNamespace(**cfg)


def parse_key_value_pair(pair: str):
    """Parse a 'key=value' CLI token."""
    k, _, v = pair.partition("=")
    k, v = k.strip(), v.strip()
    if not v:
        raise ValueError(f"missing value for argument '{k}'")
    return k, smart_value(v)


def smart_value(v: str) -> Any:
    """Convert a CLI string to its most natural Python type."""
    lower = v.lower()
    if lower == "none":
        return None
    if lower == "true":
        return True
    if lower == "false":
        return False
    try:
        import ast
        return ast.literal_eval(v)
    except (ValueError, SyntaxError):
        return v


def handle_settings(args: list[str]) -> None:
    """`yolo-sod settings [reset | key=value ...]` (reference
    cfg/__init__.py:579 handle_yolo_settings): no args prints the persisted
    settings; `reset` restores defaults; key=value pairs update them."""
    from yolo_sod_tpu.utils import SETTINGS

    if args and args[0] == "reset":
        SETTINGS.file_path.unlink(missing_ok=True)
        SETTINGS.clear()
        SETTINGS.update(SETTINGS.defaults)
        LOGGER.info("settings reset to defaults")
    else:
        updates = dict(parse_key_value_pair(a) for a in args if "=" in a)
        bad = [k for k in updates if k not in SETTINGS]
        if bad:
            raise KeyError(f"unknown settings key(s) {bad}; valid: {sorted(SETTINGS)}")
        if updates:
            SETTINGS.update(updates)
    LOGGER.info("\n".join(f"{k}={v}" for k, v in sorted(SETTINGS.items())))


def handle_checks(args: list[str]) -> None:
    """`yolo-sod checks`: environment summary (reference `yolo checks` →
    checks.collect_system_info)."""
    from yolo_sod_tpu.utils.checks import check_jax, collect_system_info

    info = collect_system_info()
    check_jax()
    lines = [f"{k:<12} {v}" for k, v in info.items()]
    LOGGER.info("\n".join(lines + [f"{'default cfg':<12} {DEFAULT_CFG_PATH}"]))


def handle_cfg(args: list[str]) -> None:
    """`yolo-sod cfg`: print the resolved default configuration."""
    LOGGER.info("\n".join(f"{k}={v}" for k, v in DEFAULT_CFG_DICT.items()))


def handle_copy_cfg(args: list[str]) -> None:
    """`yolo-sod copy-cfg`: copy default.yaml into cwd for editing
    (reference copy_default_cfg, cfg/__init__.py:547)."""
    import shutil

    dst = Path.cwd() / (DEFAULT_CFG_PATH.stem + "_copy.yaml")
    shutil.copy2(DEFAULT_CFG_PATH, dst)
    LOGGER.info(f"{DEFAULT_CFG_PATH} copied to {dst}\n"
                f"usage: yolo-sod cfg={dst} ...")


SPECIAL = {"settings": handle_settings, "checks": handle_checks,
           "cfg": handle_cfg, "copy-cfg": handle_copy_cfg}


def entrypoint(debug: str = ""):
    """CLI: `yolo-sod <task> <mode> key=value ...` (reference cfg/__init__.py:817)."""
    argv = (debug.split() if debug else sys.argv)[1:]
    if not argv:
        LOGGER.info("usage: yolo-sod <task> <mode> key=value ...\n"
                    f"  tasks: {sorted(TASKS)}\n  modes: {sorted(MODES)}")
        return

    overrides: dict[str, Any] = {}
    task, mode = None, None
    for a in argv:
        if "=" in a:
            k, v = parse_key_value_pair(a)
            overrides[k] = v
        elif a in TASKS:
            task = a
        elif a in MODES:
            mode = a
        elif a in ("help", "-h", "--help"):
            return entrypoint("yolo-sod")
        elif a == "version":
            from yolo_sod_tpu import __version__
            LOGGER.info(__version__)
            return
        elif a in SPECIAL:
            return SPECIAL[a]([x for x in argv if x != a])
        else:
            raise SyntaxError(f"'{a}' is not a valid argument (expected task, mode, or key=value)")

    mode = mode or overrides.pop("mode", None) or "predict"
    if mode not in MODES:
        raise ValueError(f"invalid mode '{mode}', valid modes are {sorted(MODES)}")
    task = task or overrides.pop("task", None)
    model = overrides.pop("model", None) or TASK2MODEL.get(task or "detect")

    from yolo_sod_tpu import YOLO
    yolo = YOLO(model, task=task)
    if mode in ("train", "val") and "data" not in overrides:
        overrides["data"] = TASK2DATA.get(task or "detect")
    if mode in ("predict", "track"):
        # CLI predictions save by default (reference is_cli semantics).
        overrides.setdefault("save", True)
    LOGGER.info(f"{colorstr('yolo-sod:')} task={task or yolo.task} mode={mode} model={model}")
    return getattr(yolo, mode)(**overrides)


def get_save_dir(args, name: str | None = None) -> Path:
    """Resolve runs/{task}/{name} with auto-increment (reference cfg get_save_dir)."""
    from yolo_sod_tpu.utils import increment_path

    project = getattr(args, "project", None) or Path("runs") / getattr(args, "task", "detect")
    name = name or getattr(args, "name", None) or getattr(args, "mode", "exp")
    return increment_path(Path(project) / name, exist_ok=getattr(args, "exist_ok", False))
