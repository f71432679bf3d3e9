"""YOLO-World: open-vocabulary detection facade + closed-set fine-tuning.

Capability parity with the reference's World route:
- `YOLOWorld` facade — reference models/yolo/model.py:62-119 (YOLOWorld).
- `WorldTrainer` closed-set fine-tune — reference models/yolo/world/train.py:24
  (vocabulary = the dataset's class names, embedded once and shipped with
  every batch as the `txt_feats` guide).

TPU-native differences: the text guide is a plain (1, K, D) array folded into
the jitted train step / predict graph (no CLIP module living inside the
detector), and embeddings come from utils/text_embed.py — real CLIP when a
local checkpoint is provisioned, the deterministic hash embedder otherwise
(this environment is zero-egress).
"""

from __future__ import annotations

import jax.numpy as jnp

from yolo_sod_tpu.engine.model import Model
from yolo_sod_tpu.engine.trainer import DetectionTrainer
from yolo_sod_tpu.nn.tasks import WorldModel

__all__ = ["YOLOWorld", "WorldTrainer"]


class WorldTrainer(DetectionTrainer):
    """Fine-tune a World model on a closed-set detection dataset
    (reference world/train.py:24). The vocabulary is the dataset's class
    names; their embeddings are constant across the run, so the guide is
    attached per batch and replicated over the mesh."""

    task = "detect"

    def model_class(self):
        return WorldModel

    def default_model(self) -> str:
        return "yolov8s-world.yaml"

    def build_criterion(self, nc: int):
        # Vocabulary = dataset names; "person/human" style multi-prompts keep
        # their first variant (reference world/train.py:16).
        names = [str(n).split("/")[0] for n in self.data["names"].values()]
        self.model.set_classes(names)
        self._txt_feats = jnp.asarray(self.model.txt_feats)     # (1, K, D)
        return super().build_criterion(nc)

    def preprocess_batch(self, batch: dict) -> dict:
        batch["txt_feats"] = self._txt_feats
        return batch


class YOLOWorld(Model):
    """Open-vocabulary YOLO facade (reference model.py:62-119).

    Example:
        model = YOLOWorld("yolov8s-world.yaml")
        model.set_classes(["person", "bus"])
        results = model.predict(img)
    """

    def __init__(self, model: str = "yolov8s-world.yaml", verbose: bool = False):
        super().__init__(model=model, task="detect", verbose=verbose)

    @property
    def task_map(self) -> dict:
        from yolo_sod_tpu.engine.predictor import DetectionPredictor
        from yolo_sod_tpu.engine.validator import DetectionValidator

        return {"detect": {"model": WorldModel, "trainer": WorldTrainer,
                           "validator": DetectionValidator,
                           "predictor": DetectionPredictor}}

    def set_classes(self, classes, embedder=None):
        """Swap the detection vocabulary (reference model.py:89-107).
        Drops any trailing " " padding and resets the cached predictor so
        the next predict() compiles against the new class count."""
        self.model.set_classes(classes, embedder=embedder)
        self.predictor = None       # nc changed → stale compiled pipelines
