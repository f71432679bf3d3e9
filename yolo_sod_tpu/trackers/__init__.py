from yolo_sod_tpu.trackers.bot_sort import BOTSORT
from yolo_sod_tpu.trackers.byte_tracker import BYTETracker
from yolo_sod_tpu.trackers.track import register_tracker

__all__ = ["BYTETracker", "BOTSORT", "register_tracker"]
