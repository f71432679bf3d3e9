"""Segment Anything (SAM / MobileSAM) — TPU-native re-design.

Reference: ultralytics/models/sam/ (build.py:23-66 model matrix, predict.py:37
Predictor, modules/{encoders,decoders,transformer,blocks}.py). The compute
path is flax/jit with *static* prompt shapes (points pad with label -1, which
the reference's own prompt encoder already defines as "not a point" —
encoders.py:283-289 — so padding is semantically exact, not an approximation).
"""

from yolo_sod_tpu.models.sam.build import SAM, build_sam
from yolo_sod_tpu.models.sam.predict import SAMPredictor


def __getattr__(name):
    # lazy: the video stack pulls in the full SAM2 module tree
    if name == "SAM2VideoPredictor":
        from yolo_sod_tpu.models.sam.video import SAM2VideoPredictor

        return SAM2VideoPredictor
    raise AttributeError(
        f"module 'yolo_sod_tpu.models.sam' has no attribute {name!r}")


__all__ = ["SAM", "build_sam", "SAMPredictor", "SAM2VideoPredictor"]
