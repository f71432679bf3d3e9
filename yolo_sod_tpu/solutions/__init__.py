from yolo_sod_tpu.solutions.solutions import (
    AIGym,
    Analytics,
    BaseSolution,
    DistanceCalculation,
    Heatmap,
    ObjectCounter,
    ParkingManagement,
    ParkingPtsSelection,
    ParkingZoneEditor,
    QueueManager,
    RegionCounter,
    SecurityAlarm,
    SpeedEstimator,
    TrackZone,
    streamlit_inference,
)

__all__ = ["BaseSolution", "ObjectCounter", "Heatmap", "SpeedEstimator",
           "RegionCounter", "QueueManager", "DistanceCalculation", "AIGym",
           "Analytics", "ParkingManagement", "ParkingPtsSelection",
           "ParkingZoneEditor", "SecurityAlarm", "TrackZone",
           "streamlit_inference"]
