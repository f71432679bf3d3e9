"""Stage-split timing of the 640px inference pipeline on the current device.

Times three compiled variants back-to-back (pipelined, last-result fetch):
  forward-only        — backbone/MAFN/head raw maps
  forward+decode      — + DFL decode / dist2bbox / sigmoid
  full (decode+NMS)   — + fixed-shape class-aware NMS

The deltas attribute wall-clock to decode and NMS; XLA fuses aggressively so
this is the honest way to split a single graph. Also prints per-variant XLA
cost analysis (flops / bytes accessed) when available.

Usage: python tools/profile_pipeline.py [imgsz] [batch] [iters]
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


def timed(fn, v, x, iters: int) -> float:
    # Fetch a VALUE, not block_until_ready: on the axon tunnel the latter can
    # return before dispatched work completes. Calls on one device execute in
    # dispatch order, so fetching the last call's output forces the loop.
    def force(out):
        # Scalar element fetch: forces the producer chain without paying a
        # multi-MB tunnel transfer of the whole output (which would dominate
        # the measurement for the decode stage's (B, A, 4+nc) tensor).
        leaf = jax.tree_util.tree_leaves(out)[-1]
        _ = np.asarray(leaf[(0,) * leaf.ndim])

    force(fn(v, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(v, x)
    force(out)
    return (time.perf_counter() - t0) / iters


def main(imgsz: int = 640, batch: int = 16, iters: int = 30):
    from yolo_sod_tpu.nn.tasks import DetectionModel
    from yolo_sod_tpu.ops.decode import decode_detections
    from yolo_sod_tpu.ops.nms import non_max_suppression

    model = DetectionModel("yolov12-sod-fusion-v5-simple.yaml")
    model.init(imgsz=imgsz)
    variables = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
        model.variables)

    # variables is a jit ARGUMENT (closure constants cost a device->host
    # fetch per leaf at trace time; see bench.py).
    def fwd(variables, x):
        return model.apply(variables, x.astype(jnp.bfloat16), train=False)

    def fwd_decode(variables, x):
        feats = model.apply(variables, x.astype(jnp.bfloat16), train=False)
        return decode_detections(feats, model.graph.detect_strides, model.nc)

    def full(variables, x):
        preds = fwd_decode(variables, x)
        return non_max_suppression(preds, conf_thres=0.25, iou_thres=0.45,
                                   max_det=300, max_nms=1024)

    x = jnp.asarray(np.random.default_rng(0).random(
        (batch, imgsz, imgsz, 3), np.float32))

    rows = []
    for name, fn in (("forward", fwd), ("forward+decode", fwd_decode),
                     ("full(+NMS)", full)):
        jfn = jax.jit(fn)
        compiled = jfn.lower(variables, x).compile()
        dt = timed(compiled, variables, x, iters)
        cost = {}
        try:
            c = compiled.cost_analysis()
            c = c[0] if isinstance(c, (list, tuple)) else c
            cost = {"gflops": c.get("flops", 0) / 1e9,
                    "gbytes": c.get("bytes accessed", 0) / 1e9}
        except Exception:
            pass
        rows.append((name, dt, cost))
        print(f"{name:>16}: {dt * 1e3:8.2f} ms/batch  "
              f"{batch / dt:8.1f} img/s  "
              f"{cost.get('gflops', 0):8.1f} GF  {cost.get('gbytes', 0):6.2f} GB")

    base = rows[0][1]
    print(f"\n{'decode overhead':>16}: {(rows[1][1] - base) * 1e3:8.2f} ms/batch")
    print(f"{'NMS overhead':>16}: {(rows[2][1] - rows[1][1]) * 1e3:8.2f} ms/batch")
    print(f"{'device':>16}: {jax.devices()[0].device_kind}")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)
