"""Per-op device trace of the compiled training step (jax.profiler).

Microbenchmarks are untrustworthy on the axon tunnel (PERF.md "Negative/
unreliable result"); this is the ground-truth path: run the real pipelined
step under jax.profiler, parse the xspace in-process with
jax.profiler.ProfileData, and aggregate device-plane event durations by op.
Used for (a) finding where the backward's 60 ms actually goes and (b) the
int8-boundary-conv decision (VERDICT r2 items 2-3).

Usage: python tools/trace_train.py [imgsz] [batch] [steps]
"""

from __future__ import annotations

import glob
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# Persistent compile cache: enabled library-wide under the user cache dir
# (yolo_sod_tpu/__init__.py) — shared with bench.py and fresh checkouts.
import yolo_sod_tpu  # noqa: F401  (cache side effect)

import jax.numpy as jnp
import numpy as np


def build(imgsz: int, batch: int, max_boxes: int = 64):
    from yolo_sod_tpu.engine.train_step import (build_optimizer,
                                                init_train_state,
                                                make_train_step)
    from yolo_sod_tpu.nn.tasks import DetectionModel
    from yolo_sod_tpu.utils.loss import DetectionLoss

    model = DetectionModel("yolov12-sod-fusion-v5-simple.yaml")
    model.init(imgsz=imgsz)
    criterion = DetectionLoss(nc=model.nc, strides=model.graph.detect_strides)
    tx = build_optimizer(model.variables["params"], name="SGD", lr=0.01,
                         momentum=0.937, nc=model.nc)
    state = init_train_state(model, tx)
    step = make_train_step(model, criterion, tx)

    rng = np.random.default_rng(0)
    batch_d = {
        "img": jnp.asarray(rng.random((batch, imgsz, imgsz, 3), np.float32)),
        "cls": jnp.asarray(rng.integers(0, 10, (batch, max_boxes)), jnp.float32),
        "bboxes": jnp.asarray(
            np.clip(rng.random((batch, max_boxes, 4)), 0.05, 0.95), np.float32),
        "mask_gt": jnp.asarray(
            (np.arange(max_boxes)[None] < max_boxes // 2).repeat(batch, 0),
            jnp.float32),
    }
    return step, state, batch_d


def summarize(trace_dir: str, steps: int, top: int = 50):
    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not files:
        print("NO XPLANE FILES FOUND under", trace_dir)
        return
    data = jax.profiler.ProfileData.from_file(max(files))
    for plane in data.planes:
        total_by_name = defaultdict(float)
        count_by_name = defaultdict(int)
        n_events = 0
        for line in plane.lines:
            for ev in line.events:
                ns = ev.duration_ns
                name = ev.name
                total_by_name[name] += ns
                count_by_name[name] += 1
                n_events += 1
        if n_events == 0:
            continue
        total_ms = sum(total_by_name.values()) / 1e6
        print(f"\n=== plane: {plane.name}  events={n_events} "
              f"sum={total_ms:.1f} ms ({total_ms / steps:.2f} ms/step) ===")
        rows = sorted(total_by_name.items(), key=lambda kv: -kv[1])[:top]
        for name, ns in rows:
            print(f"  {ns / 1e6 / steps:9.3f} ms/step  x{count_by_name[name]:<5d} {name[:130]}")


def main(imgsz: int = 640, batch: int = 16, steps: int = 5):
    import time
    step, state, batch_d = build(imgsz, batch)
    t0 = time.perf_counter()
    state, out = step(state, batch_d)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s loss={float(out['loss']):.4f}")
    for _ in range(3):                       # warmup, fetch-forced
        state, out = step(state, batch_d)
    _ = float(out["loss"])

    trace_dir = "/tmp/jax_trace_train"
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        state, out = step(state, batch_d)
    final = float(out["loss"])               # force the chain inside the trace
    jax.profiler.stop_trace()
    print(f"traced {steps} steps, final loss {final:.4f}")
    summarize(trace_dir, steps)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)
