from yolo_sod_tpu.solutions.solutions import (
    AIGym,
    Analytics,
    BaseSolution,
    DistanceCalculation,
    Heatmap,
    ObjectCounter,
    ParkingManagement,
    QueueManager,
    RegionCounter,
    SecurityAlarm,
    SpeedEstimator,
    TrackZone,
    streamlit_inference,
)

__all__ = ["BaseSolution", "ObjectCounter", "Heatmap", "SpeedEstimator",
           "RegionCounter", "QueueManager", "DistanceCalculation", "AIGym",
           "Analytics", "ParkingManagement", "SecurityAlarm", "TrackZone",
           "streamlit_inference"]
