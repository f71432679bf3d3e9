"""Training-step throughput on the current device.

Times the full jitted training step — bf16 forward, v8 criterion with TAL
assignment, backward, grad-clip + SGD update, EMA — on synthetic batches at
the reference's VisDrone configuration (640², flagship model). This is the
apples-to-apples number against the reference's ~67 img/s single-GPU
training rate (BASELINE.md).

Usage: python tools/profile_train.py [imgsz] [batch] [iters]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# Persistent compile cache: enabled library-wide under the user cache dir
# (yolo_sod_tpu/__init__.py) — shared with bench.py and fresh checkouts.
import yolo_sod_tpu  # noqa: F401  (cache side effect)

import jax.numpy as jnp
import numpy as np


def main(imgsz: int = 640, batch: int = 16, iters: int = 30, max_boxes: int = 64):
    from yolo_sod_tpu.engine.train_step import (build_optimizer,
                                                init_train_state,
                                                make_train_step)
    from yolo_sod_tpu.nn.tasks import DetectionModel
    from yolo_sod_tpu.utils.loss import DetectionLoss

    import os
    per_level = os.environ.get("YS_PER_LEVEL", "0") == "1"   # A/B the criterion form
    model = DetectionModel("yolov12-sod-fusion-v5-simple.yaml")
    model.init(imgsz=imgsz)
    criterion = DetectionLoss(nc=model.nc, strides=model.graph.detect_strides,
                              per_level=per_level)
    print(f"criterion per_level={per_level}")
    tx = build_optimizer(model.variables["params"], name="SGD", lr=0.01,
                         momentum=0.937, nc=model.nc)
    state = init_train_state(model, tx)
    step = make_train_step(model, criterion, tx)

    rng = np.random.default_rng(0)
    n_gt = max_boxes // 2
    batch_d = {
        "img": jnp.asarray(rng.random((batch, imgsz, imgsz, 3), np.float32)),
        "cls": jnp.asarray(rng.integers(0, 10, (batch, max_boxes)), jnp.float32),
        "bboxes": jnp.asarray(
            np.clip(rng.random((batch, max_boxes, 4)), 0.05, 0.95), jnp.float32),
        "mask_gt": jnp.asarray(
            (np.arange(max_boxes)[None] < n_gt).repeat(batch, 0), jnp.float32),
    }

    t0 = time.perf_counter()
    state, out = step(state, batch_d)
    l0 = float(out["loss"])                    # real device->host fetch
    print(f"compile+first step: {time.perf_counter() - t0:.1f} s  loss={l0:.4f}")

    # Timing methodology (axon-tunnel safe): chain `iters` steps through the
    # donated state, then FETCH the final loss. block_until_ready alone can
    # return before the backward/optimizer finish on this platform
    # (under-reporting the step ~40x — see PERF.md); a value fetch of the
    # last step's loss transitively forces the whole chain. The single
    # ~30 ms tunnel RTT amortizes over `iters`.
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = step(state, batch_d)
    lN = float(out["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"train step: {dt * 1e3:8.2f} ms/batch  {batch / dt:8.1f} img/s  "
          f"loss {l0:.4f}->{lN:.4f}  (device: {jax.devices()[0].device_kind})")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)
