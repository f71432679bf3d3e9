"""A/B the fused inference pipeline across model variants on the chip.

Full-model pipelined loops are the only trustworthy timing on the axon
tunnel (PERF.md "Negative/unreliable result") — this A/Bs the complete
forward+decode+NMS graph per variant:

    baseline       — bf16 everywhere (current production path)
    act_int8_p2    — int8-quantized stride-4 boundary activations
                     (YOLO_SOD_ACT_INT8 / act_int8_strides=(4,)) — the open
                     int8 question (VERDICT r2 item 3): the model is at 89%
                     of the bf16 HBM roofline and the P2 maps are the bytes.

Usage: python tools/ab_infer.py [imgsz] [batch] [iters]
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
    # return before dispatched work completes (PERF.md). Calls on one device
    # execute in dispatch order, so fetching the last call's output forces
    # the whole pipelined loop.
    out = fn(v, x)
    _ = np.asarray(out[1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(v, x)
    _ = np.asarray(out[1])
    return (time.perf_counter() - t0) / iters


def build(act_int8, imgsz, variables=None):
    from yolo_sod_tpu.nn.tasks import DetectionModel
    from yolo_sod_tpu.ops.nms import non_max_suppression

    model = DetectionModel("yolov12-sod-fusion-v5-simple.yaml",
                           act_int8_strides=act_int8)
    if variables is None:
        model.init(imgsz=imgsz)
        variables = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
            model.variables)
    model.variables = variables

    # variables is a jit ARGUMENT (closure constants cost a device->host
    # fetch per leaf at trace time; see bench.py).
    def full(variables, x):
        preds = model.predict(variables, x.astype(jnp.bfloat16))
        return non_max_suppression(preds, conf_thres=0.25, iou_thres=0.45,
                                   max_det=300, max_nms=1024)

    return full, variables


def main(imgsz: int = 640, batch: int = 16, iters: int = 30):
    x = jnp.asarray(np.random.default_rng(0).random(
        (batch, imgsz, imgsz, 3), np.float32))

    variables = None
    results = {}
    for name, strides in (("baseline", ()), ("act_int8_p2", (4,))):
        fn, variables = build(strides, imgsz, variables)
        jfn = jax.jit(fn)
        compiled = jfn.lower(variables, x).compile()
        cost = {}
        try:
            c = compiled.cost_analysis()
            c = c[0] if isinstance(c, (list, tuple)) else c
            cost = {"GF": c.get("flops", 0) / 1e9,
                    "GB": c.get("bytes accessed", 0) / 1e9}
        except Exception:
            pass
        dt = timed(compiled, variables, x, iters)
        results[name] = dt
        print(f"{name:>12}: {dt * 1e3:8.2f} ms/batch  {batch / dt:8.1f} img/s  "
              f"{cost.get('GF', 0):7.1f} GF  {cost.get('GB', 0):6.2f} GB",
              flush=True)
    base, q = results["baseline"], results["act_int8_p2"]
    print(f"\nint8-P2 boundary speedup: {base / q:.3f}x "
          f"({(base - q) * 1e3:+.2f} ms/batch)")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)
