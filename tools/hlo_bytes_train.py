"""Static HBM-traffic breakdown of the compiled TRAINING step.

Same accounting as tools/hlo_bytes.py (ENTRY-computation writes only — fusion
bodies live in VMEM) but over the full jitted train step: bf16 forward, v8
criterion + TAL, backward, clip + SGD update, EMA. The backward is ~60 of the
112 ms step and has never been looked at with this tool; the forward/criterion
layout pathologies it found (last-axis gathers, 2-lane-wide concats — PERF.md
item 3b) plausibly have gradient twins.

Usage: python tools/hlo_bytes_train.py [imgsz] [batch]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from hlo_bytes import analyze  # noqa: E402  (tools/ sibling)


def main(imgsz: int = 640, batch: int = 16, max_boxes: int = 64):
    import jax
    # Persistent compile cache: enabled library-wide under the user cache
    # dir (yolo_sod_tpu/__init__.py) — shared with bench.py.
    import yolo_sod_tpu  # noqa: F401  (cache side effect)
    import jax.numpy as jnp
    import numpy as np

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
            np.clip(rng.random((batch, max_boxes, 4)), 0.05, 0.95), jnp.float32),
        "mask_gt": jnp.asarray(
            (np.arange(max_boxes)[None] < max_boxes // 2).repeat(batch, 0),
            jnp.float32),
    }

    lowered = step.lower(state, batch_d)
    compiled = lowered.compile()
    text = compiled.as_text()
    out = Path("/tmp/train_hlo.txt")
    out.write_text(text)
    print(f"[hlo saved to {out}, {len(text)/1e6:.1f} MB]")
    analyze(text, top=40)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
