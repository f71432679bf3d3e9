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
import numpy as np

from yolo_sod_tpu.engine.model import Model
from yolo_sod_tpu.engine.trainer import DetectionTrainer
from yolo_sod_tpu.nn.tasks import WorldModel

__all__ = ["YOLOWorld", "WorldTrainer", "WorldTrainerFromScratch"]


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


class WorldTrainerFromScratch(WorldTrainer):
    """Open-set training over multiple detection + grounding datasets
    (reference models/yolo/world/train_world.py:10). `args.data` is a DICT:

        data = dict(
            train=dict(yolo_data=["objects365.yaml"],
                       grounding_data=[dict(img_path="images/",
                                            json_file="grounding.json")]),
            val=dict(yolo_data=["lvis.yaml"]))

    Each batch's vocabulary comes from the items themselves — grounding
    images contribute their caption phrases, yolo-data images their class
    names — embedded host-side (cached per unique string) and padded to the
    FIXED data["nc"] guide slots the criterion compiles against (the
    reference's own nc-capping doctrine, world/train.py:55-59)."""

    def get_dataset(self) -> dict:
        from yolo_sod_tpu.data import check_det_dataset

        spec = self.args.data
        assert isinstance(spec, dict) and spec.get("train") and \
            spec.get("val"), "data must be the train/val dict spec"
        resolved = {k: [check_det_dataset(d) for d in v.get("yolo_data", [])]
                    for k, v in spec.items()}
        assert len(resolved["val"]) == 1, \
            "only one val dataset is supported (reference train_world.py:77)"
        val = resolved["val"][0]
        train_specs = [d["train"] for d in resolved["train"]]
        grounding = spec["train"].get("grounding_data") or []
        grounding = grounding if isinstance(grounding, list) else [grounding]
        for g in grounding:
            assert isinstance(g, dict) and "img_path" in g and \
                "json_file" in g, f"bad grounding spec: {g}"
        return {"train": train_specs + grounding, "val": val["val"],
                "nc": val["nc"], "names": val["names"]}

    def build_dataset(self, img_path, mode: str = "train", batch=None):
        if mode != "train":
            return super().build_dataset(img_path, mode=mode, batch=batch)
        from yolo_sod_tpu.data import (YOLOConcatDataset, build_grounding,
                                       build_yolo_dataset)

        stride = int(max(self.model.stride))
        batch = batch or self.args.batch
        specs = img_path if isinstance(img_path, list) else [img_path]
        sets = [
            build_grounding(vars(self.args), s["img_path"], s["json_file"],
                            batch, stride=stride, seed=self.args.seed)
            if isinstance(s, dict) else
            build_yolo_dataset(vars(self.args), s, batch, self.data,
                               mode="train", stride=stride,
                               seed=self.args.seed, multi_modal=True)
            for s in specs
        ]
        return YOLOConcatDataset(sets) if len(sets) > 1 else sets[0]

    def build_criterion(self, nc: int):
        from yolo_sod_tpu.utils.text_embed import get_text_embedder

        self._embedder = get_text_embedder(self.model.embed_dim)
        self._text_cache: dict = {}
        # closed-set guide (val names) for evaluation; training batches
        # override it per item below
        return super().build_criterion(nc)

    def _embed(self, text: str) -> np.ndarray:
        e = self._text_cache.get(text)
        if e is None:
            e = np.asarray(self._embedder([text]), np.float32)[0]
            e = e / max(float(np.linalg.norm(e)), 1e-12)
            self._text_cache[text] = e
        return e

    host_batch_keys = ("texts",)

    def preprocess_batch(self, batch: dict) -> dict:
        # "texts" is a host-side list of per-image phrase vocabularies; it is
        # consumed here and MUST NOT reach the jitted train step.
        texts = batch.pop("texts", None)
        if not texts:
            return super().preprocess_batch(batch)
        K, D = int(self.data["nc"]), self.model.embed_dim
        B = len(texts)
        feats = np.zeros((B, K, D), np.float32)
        for b, vocab in enumerate(texts):
            for k, t in enumerate(vocab[:K]):
                feats[b, k] = self._embed(str(t))
        batch["txt_feats"] = jnp.asarray(feats)
        # GT whose phrase index overflows the fixed guide slots cannot be
        # scored — mask it out instead of mis-supervising slot K-1
        over = batch["cls"] >= K
        if over.any():
            batch["mask_gt"] = np.where(over, 0.0, batch["mask_gt"])
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
