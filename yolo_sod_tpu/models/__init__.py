"""Model-family facades beyond plain YOLO (reference ultralytics/models/).

Lazy imports keep `import yolo_sod_tpu` light; each family lives in its own
module: world (YOLO-World), fastsam (FastSAM), rtdetr (engine/rtdetr.py).
"""

__all__ = ["YOLOWorld", "WorldTrainer", "WorldTrainerFromScratch", "FastSAM",
           "FastSAMPredictor", "NAS", "NASPredictor", "NASValidator", "SAM"]


def __getattr__(name):
    if name in ("YOLOWorld", "WorldTrainer", "WorldTrainerFromScratch"):
        from yolo_sod_tpu.models import world

        return getattr(world, name)
    if name in ("FastSAM", "FastSAMPredictor", "FastSAMValidator"):
        from yolo_sod_tpu.models import fastsam

        return getattr(fastsam, name)
    if name in ("NAS", "NASPredictor", "NASValidator"):
        from yolo_sod_tpu.models import nas

        return getattr(nas, name)
    if name == "SAM":
        from yolo_sod_tpu.models.sam import SAM

        return SAM
    raise AttributeError(f"module 'yolo_sod_tpu.models' has no attribute {name!r}")
