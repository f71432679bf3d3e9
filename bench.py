"""Benchmark: flagship end-to-end inference throughput on one chip.

Measures the full fused pipeline — bf16 forward through the MAFN backbone/neck,
P2-P5 Detect decode, and fixed-shape class-aware Cluster-NMS — as ONE jitted
XLA graph at 640x640, the reference's VisDrone configuration (BASELINE.md).

Timing is pipelined (dispatch N batches back-to-back, fetch the last result):
the steady-state serving rate. Per-call blocking timings over the axon tunnel
include a ~30 ms host round trip that is not device time.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no inference throughput; the only
throughput recoverable from its repo is the training-loop rate of the same
model on its single GPU — 6471 images / ~96 s/epoch = 67.4 img/s
(BASELINE.md, exp3 results.csv time deltas). We report images/sec/chip
divided by that proxy.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_IMGS_PER_SEC = 67.4  # reference training throughput proxy (BASELINE.md)


def main(imgsz: int = 640, batch: int = 16, iters: int = 50):
    from yolo_sod_tpu.nn.tasks import DetectionModel
    from yolo_sod_tpu.ops.nms import non_max_suppression

    model = DetectionModel("yolov12-sod-fusion-v5-simple.yaml")
    model.init(imgsz=imgsz)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        model.variables)

    @jax.jit
    def pipeline(x):
        preds = model.predict(variables, x.astype(jnp.bfloat16))
        return non_max_suppression(preds, conf_thres=0.25, iou_thres=0.45,
                                   max_det=300, max_nms=1024)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, imgsz, imgsz, 3), np.float32))

    # Warmup / compile; force full completion with a host fetch.
    det, n = pipeline(x)
    np.asarray(n)

    t0 = time.perf_counter()
    for _ in range(iters):
        det, n = pipeline(x)
    np.asarray(n)   # fetch the last result -> all prior batches completed
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "visdrone640_e2e_infer_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / REF_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
