from yolo_sod_tpu.solutions.solutions import (
    AIGym,
    BaseSolution,
    DistanceCalculation,
    Heatmap,
    ObjectCounter,
    QueueManager,
    RegionCounter,
    SpeedEstimator,
)

__all__ = ["BaseSolution", "ObjectCounter", "Heatmap", "SpeedEstimator",
           "RegionCounter", "QueueManager", "DistanceCalculation", "AIGym"]
