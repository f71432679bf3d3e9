"""Benchmark harness: export-all-formats x inference sweep + model profiling.

TPU-native analog of reference utils/benchmarks.py (benchmark() :50,
ProfileModels :315): exports the model to every supported format, runs the
same input through each backend, and reports latency/throughput per format.
"""

from __future__ import annotations

import time

import numpy as np

from yolo_sod_tpu.utils import LOGGER, colorstr


def benchmark(model=None, imgsz: int = 640, batch: int = 1, half: bool = True,
              formats=("ckpt", "stablehlo"), iters: int = 10, verbose: bool = True,
              data=None, conf: float = 0.001):
    """Export + re-run the fused pipeline per format; returns rows of results.

    With `data` (a dataset yaml), each exported artifact is additionally
    re-validated through the standard DetectionValidator — the reference
    benchmark() doctrine (utils/benchmarks.py:50: export every format, val
    each, report mAP + speed)."""
    from yolo_sod_tpu.cfg import DEFAULT_CFG_DICT, get_cfg
    from yolo_sod_tpu.engine.exporter import Exporter
    from yolo_sod_tpu.nn.autobackend import AutoBackend

    results = []
    rng = np.random.default_rng(0)
    x = rng.random((batch, imgsz, imgsz, 3), np.float32)
    for fmt in formats:
        try:
            # "tflite-int8" rows sweep the calibrated INT8 quantization
            # (reference benchmark() exports int8 variants too).
            base_fmt, int8 = (fmt[:-5], True) if fmt.endswith("-int8") else (fmt, False)
            args = get_cfg(DEFAULT_CFG_DICT, {"imgsz": imgsz, "batch": batch,
                                              "half": half, "format": base_fmt,
                                              "conf": conf, "int8": int8,
                                              "mode": "export"})
            path = Exporter(args=args)(model=model.model if hasattr(model, "model") else model,
                                       fmt=base_fmt)
            backend = AutoBackend(path).warmup((batch, imgsz, imgsz, 3))
            times = []
            for _ in range(iters):
                t0 = time.perf_counter()
                backend.forward(x)
                times.append(time.perf_counter() - t0)
            p50 = float(np.median(times)) * 1000
            row = {"format": fmt, "status": "ok",
                   "latency_ms": round(p50, 2),
                   "imgs_per_sec": round(batch / (p50 / 1000), 1),
                   "file": path}
            if data is not None:
                from yolo_sod_tpu.engine.validator import DetectionValidator

                vargs = get_cfg(DEFAULT_CFG_DICT, {
                    "data": str(data), "imgsz": imgsz, "batch": batch,
                    "conf": conf, "mode": "val", "plots": False,
                    "verbose": False})
                metrics = DetectionValidator(args=vargs)(model=backend)
                mp, mr, map50, map5095 = metrics.mean_results()
                row.update({"mAP50": round(float(map50), 4),
                            "mAP50-95": round(float(map5095), 4)})
            results.append(row)
        except Exception as e:
            results.append({"format": fmt, "status": f"fail: {e}"})
    if verbose:
        LOGGER.info(f"{colorstr('benchmark:')} imgsz={imgsz} batch={batch}")
        for r in results:
            extra = f"  mAP50-95={r['mAP50-95']}" if "mAP50-95" in r else ""
            LOGGER.info(f"  {r['format']:<12} {r.get('latency_ms', '-'):>8} ms  "
                        f"{r.get('imgs_per_sec', '-'):>8} img/s  {r['status']}{extra}")
    return results


def profile_model(model, imgsz: int = 640, batch: int = 1, iters: int = 10):
    """Params + FLOPs estimate + compiled-step latency (reference
    torch_utils.profile :639 / model_info :299)."""
    import jax
    import jax.numpy as jnp

    m = model.model if hasattr(model, "model") else model
    if m.variables is None:
        m.init(imgsz=imgsz)
    n_params = m.num_params()

    fn = jax.jit(lambda x: m.predict(m.variables, x))
    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    # FLOPs from XLA's cost analysis of the lowered computation.
    try:
        compiled = fn.lower(x).compile()
        flops = compiled.cost_analysis().get("flops", float("nan"))
    except Exception:
        flops = float("nan")
    out = fn(x)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times)) * 1000
    gflops = flops / 1e9 / batch if flops == flops else None
    gf = f"{gflops:.1f} GFLOPs/img, " if gflops else ""
    LOGGER.info(f"{colorstr('profile:')} {n_params / 1e6:.2f}M params, "
                f"{gf}{p50:.2f} ms p50 @ {imgsz}")
    return {"params": n_params, "gflops_per_img": gflops, "p50_ms": p50}
