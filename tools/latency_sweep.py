"""Trace-derived on-device latency sweep + validator throughput.

BENCH p50 numbers measured as host wall-clock include ~30 ms of axon-tunnel
RTT (PERF.md); the honest device-side number comes from the profiler trace:
each jit invocation appears as one event on the 'XLA Modules' line of the
TPU plane, so p50/p99 over those events is pure device time.

Reports, per batch in {1, 4, 8, 16, 32}: device p50 / p99 per invocation and
img/s. Then runs the standard DetectionValidator over a synthetic 640x640
val set for an end-to-end validator img/s (the number that gates real
400-epoch training wall time — VERDICT r2 weak #8).

Usage: python tools/latency_sweep.py [imgsz] [n_iters]
"""

from __future__ import annotations

import glob
import shutil
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


def module_times_ms(trace_dir: str) -> list[float]:
    """Per-invocation device durations from the trace's XLA Modules line."""
    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not files:
        return []
    data = jax.profiler.ProfileData.from_file(max(files))
    out = []
    for plane in data.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            out += [ev.duration_ns / 1e6 for ev in line.events]
    return out


def sweep(imgsz: int = 640, iters: int = 30,
          batches=(1, 4, 8, 16, 32)) -> list[dict]:
    from yolo_sod_tpu.nn.tasks import DetectionModel
    from yolo_sod_tpu.ops.nms import non_max_suppression

    model = DetectionModel("yolov12-sod-fusion-v5-simple.yaml")
    model.init(imgsz=imgsz)
    variables = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
        model.variables)

    # variables is a jit ARGUMENT (closure constants cost a device->host
    # fetch per leaf at trace time; see bench.py).
    @jax.jit
    def pipeline(variables, x):
        preds = model.predict(variables, x.astype(jnp.bfloat16))
        return non_max_suppression(preds, conf_thres=0.25, iou_thres=0.45,
                                   max_det=300)

    rows = []
    for b in batches:
        x = jnp.asarray(np.random.default_rng(0).random(
            (b, imgsz, imgsz, 3), np.float32))
        det, n = pipeline(variables, x)           # compile
        _ = float(n[0])
        for _ in range(3):                        # warmup
            det, n = pipeline(variables, x)
        _ = float(n[0])

        trace_dir = f"/tmp/jax_trace_lat_b{b}"
        shutil.rmtree(trace_dir, ignore_errors=True)
        jax.profiler.start_trace(trace_dir)
        for _ in range(iters):
            det, n = pipeline(variables, x)
        _ = float(n[0])                           # force the chain in-trace
        jax.profiler.stop_trace()

        times = module_times_ms(trace_dir)
        times = sorted(times)[-iters:]            # drop stray warmup modules
        if not times:
            rows.append({"batch": b, "error": "no trace events"})
            continue
        p50 = float(np.percentile(times, 50))
        p99 = float(np.percentile(times, 99))
        rows.append({"batch": b, "device_p50_ms": round(p50, 3),
                     "device_p99_ms": round(p99, 3),
                     "imgs_per_sec": round(b / (p50 / 1e3), 1)})
        print(f"batch {b:>2}: device p50 {p50:7.2f} ms  p99 {p99:7.2f} ms  "
              f"{b / (p50 / 1e3):7.1f} img/s", flush=True)
    return rows


def validator_throughput(imgsz: int = 640, n_images: int = 64,
                         batch: int = 16) -> float:
    """End-to-end validator img/s on a synthetic VisDrone-sized val set."""
    import cv2

    from yolo_sod_tpu.cfg import DEFAULT_CFG_DICT, get_cfg
    from yolo_sod_tpu.engine.validator import DetectionValidator
    from yolo_sod_tpu.nn.tasks import DetectionModel

    root = Path("/tmp/lat_val_synth")
    shutil.rmtree(root, ignore_errors=True)
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        n = 2 if split == "train" else n_images
        for i in range(n):
            img = rng.integers(0, 255, (imgsz, imgsz, 3), np.uint8)
            cv2.imwrite(str(root / "images" / split / f"{i}.jpg"), img)
            rows = [f"{rng.integers(0, 10)} {rng.uniform(.2, .8):.3f} "
                    f"{rng.uniform(.2, .8):.3f} 0.05 0.05" for _ in range(20)]
            (root / "labels" / split / f"{i}.txt").write_text("\n".join(rows))
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: images/train\nval: images/val\nnames:\n"
        + "\n".join(f"  {i}: c{i}" for i in range(10)))

    model = DetectionModel("yolov12-sod-fusion-v5-simple.yaml")
    model.init(imgsz=imgsz)
    vargs = get_cfg(DEFAULT_CFG_DICT, {
        "data": str(root / "data.yaml"), "imgsz": imgsz, "batch": batch,
        "conf": 0.001, "iou": 0.7, "half": True, "mode": "val",
        "plots": False, "verbose": False})
    v = DetectionValidator(args=vargs)
    v(model=model)                                 # compile + first pass
    t0 = time.perf_counter()
    v.dataloader = None                            # rebuild loader, reuse jit
    v(model=model)
    dt = time.perf_counter() - t0
    print(f"validator: {n_images} imgs in {dt:.2f} s = "
          f"{n_images / dt:.1f} img/s (batch {batch}, rect)", flush=True)
    return n_images / dt


if __name__ == "__main__":
    imgsz = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    rows = sweep(imgsz, iters)
    print(rows)
    validator_throughput(imgsz)
