from yolo_sod_tpu.solutions.solutions import (
    BaseSolution,
    Heatmap,
    ObjectCounter,
    SpeedEstimator,
)

__all__ = ["BaseSolution", "ObjectCounter", "Heatmap", "SpeedEstimator"]
