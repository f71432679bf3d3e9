"""AutoBatch: pick the largest batch size fitting device memory.

TPU-native analog of reference utils/autobatch.py:14-106 (binary-search to
60% CUDA memory via profiling). Here nothing needs to run: XLA's
memory_analysis on the lowered computation reports exact peak usage per
candidate batch, so the search is a handful of compiles with zero OOM risk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yolo_sod_tpu.utils import LOGGER, colorstr

# Per-chip HBM if the backend doesn't report it (v5e = 16 GB).
DEFAULT_HBM_BYTES = 16 * 1024 ** 3


def device_memory_bytes() -> int:
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return DEFAULT_HBM_BYTES


def compiled_peak_bytes(fn, *example_args) -> int:
    """Peak memory of the compiled computation from XLA's memory analysis."""
    compiled = jax.jit(fn).lower(*example_args).compile()
    ma = compiled.memory_analysis()
    if ma is None:
        raise RuntimeError("memory_analysis unavailable")
    total = (ma.temp_size_in_bytes + ma.argument_size_in_bytes +
             ma.output_size_in_bytes + ma.alias_size_in_bytes)
    return int(total)


def check_train_batch_size(model, imgsz: int = 640, fraction: float = 0.8,
                           max_boxes: int = 64, candidates=(4, 8, 16, 32, 64, 128)) -> int:
    """Largest candidate whose compiled train step fits `fraction` of HBM."""
    from yolo_sod_tpu.engine.train_step import build_optimizer, init_train_state, make_train_step
    from yolo_sod_tpu.utils.loss import DetectionLoss

    if model.variables is None:
        model.init(imgsz=imgsz)
    budget = device_memory_bytes() * fraction
    tx = build_optimizer(model.variables["params"], name="SGD")
    criterion = DetectionLoss(nc=model.nc, strides=model.graph.detect_strides)
    step = make_train_step(model, criterion, tx)
    state = init_train_state(model, tx)

    best = candidates[0]
    for b in candidates:
        batch = {
            "img": jnp.zeros((b, imgsz, imgsz, 3), jnp.float32),
            "cls": jnp.zeros((b, max_boxes), jnp.float32),
            "bboxes": jnp.zeros((b, max_boxes, 4), jnp.float32),
            "mask_gt": jnp.zeros((b, max_boxes), jnp.float32),
        }
        try:
            peak = compiled_peak_bytes(step, state, batch)
        except Exception as e:
            LOGGER.warning(f"autobatch: analysis failed at batch {b}: {e}")
            break
        LOGGER.info(f"autobatch: batch {b} -> {peak / 1e9:.2f} GB "
                    f"(budget {budget / 1e9:.1f} GB)")
        if peak > budget:
            break
        best = b
    LOGGER.info(f"{colorstr('autobatch:')} selected batch={best}")
    return best
