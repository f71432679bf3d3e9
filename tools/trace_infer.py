"""Per-op device trace of the compiled full inference graph (jax.profiler).

Mirror of tools/trace_train.py for the predict path: runs the pipelined
forward+decode+NMS graph under jax.profiler and aggregates device-plane
event durations by op. Used to find where forward time sits above the
HBM-traffic floor (hlo_bytes.py gives bytes; this gives nanoseconds).

Usage: python tools/trace_infer.py [imgsz] [batch] [steps]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# Persistent compile cache: enabled library-wide under the user cache dir
# (yolo_sod_tpu/__init__.py) — shared with bench.py and fresh checkouts.
import yolo_sod_tpu  # noqa: F401  (cache side effect)

import jax.numpy as jnp
import numpy as np

from trace_train import summarize


def build(imgsz: int, batch: int, mode: str = "full"):
    from yolo_sod_tpu.nn.tasks import DetectionModel
    from yolo_sod_tpu.ops.decode import decode_detections
    from yolo_sod_tpu.ops.nms import non_max_suppression

    model = DetectionModel("yolov12-sod-fusion-v5-simple.yaml")
    model.init(imgsz=imgsz)
    variables = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
        model.variables)

    # `fwd` mirrors tools/hlo_bytes.py exactly so the persistent compile
    # cache is shared between the bytes view and the time view.
    # variables is a jit ARGUMENT (closure constants cost a device->host
    # fetch per leaf at trace time; see bench.py).
    def fwd(v, x):
        return model.apply(v, x.astype(jnp.bfloat16), train=False)

    def full(v, x):
        feats = fwd(v, x)
        preds = decode_detections(feats, model.graph.detect_strides, model.nc)
        return non_max_suppression(preds)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, imgsz, imgsz, 3), np.float32))
    fn = jax.jit(fwd if mode == "fwd" else full)
    return (lambda x: fn(variables, x)), x


def main(imgsz: int = 640, batch: int = 16, steps: int = 10,
         mode: str = "full"):
    import time
    full, x = build(imgsz, batch, mode)
    t0 = time.perf_counter()
    out = jax.block_until_ready(full(x))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s")
    for _ in range(5):
        out = full(x)
    jax.block_until_ready(out)

    trace_dir = "/tmp/jax_trace_infer"
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        out = full(x)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print(f"traced {steps} iters")
    summarize(trace_dir, steps)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    mode = sys.argv[4] if len(sys.argv) > 4 else "full"
    main(*args, mode=mode)
