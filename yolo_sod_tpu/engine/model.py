"""Model facade: the `YOLO` public API.

TPU-native analog of reference engine/model.py (Model :84, _new :231,
_load :266, predict :501, val :609, train :742, export :694, task_map :1106).
Holds overrides + a DetectionModel; lazily instantiates per-task
trainer/validator/predictor.
"""

from __future__ import annotations

from typing import Any, Optional

from yolo_sod_tpu.cfg import DEFAULT_CFG_DICT, get_cfg
from yolo_sod_tpu.nn.tasks import DetectionModel


class Model:
    """Unified facade over train/val/predict/export for a detection model."""

    def __init__(self, model: str | dict = "yolov12-sod-fusion-v5-simple.yaml",
                 task: Optional[str] = None, verbose: bool = False):
        self.overrides: dict[str, Any] = {}
        self.callbacks: dict[str, list] = {}
        self._task_forced = task
        self.task = task or "detect"
        self.trainer = None
        self.predictor = None
        self.ckpt = None
        self.metrics = None
        model_str = str(model)
        if isinstance(model, dict) or model_str.endswith((".yaml", ".yml")):
            self._new(model, verbose=verbose)
        else:
            self._load(model_str)

    @property
    def task_map(self) -> dict:
        """task -> {model, trainer, validator, predictor} routing for all
        5 tasks (reference model.py:1106). Lazily imported to keep
        construction light."""
        from yolo_sod_tpu.engine.classify import (ClassificationTrainer,
                                                  ClassificationValidator)
        from yolo_sod_tpu.engine.predict_tasks import (ClassificationPredictor,
                                                       OBBPredictor,
                                                       PosePredictor,
                                                       SegmentationPredictor)
        from yolo_sod_tpu.engine.predictor import DetectionPredictor
        from yolo_sod_tpu.engine.trainer import DetectionTrainer
        from yolo_sod_tpu.engine.trainer_tasks import (OBBTrainer, PoseTrainer,
                                                       SegmentationTrainer)
        from yolo_sod_tpu.engine.validator import DetectionValidator
        from yolo_sod_tpu.engine.validator_tasks import (OBBValidator,
                                                         PoseValidator,
                                                         SegmentationValidator)
        from yolo_sod_tpu.nn.tasks import (ClassificationModel, DetectionModel,
                                           OBBModel, PoseModel,
                                           SegmentationModel)

        return {
            "detect": {"model": DetectionModel, "trainer": DetectionTrainer,
                       "validator": DetectionValidator,
                       "predictor": DetectionPredictor},
            "classify": {"model": ClassificationModel,
                         "trainer": ClassificationTrainer,
                         "validator": ClassificationValidator,
                         "predictor": ClassificationPredictor},
            "segment": {"model": SegmentationModel,
                        "trainer": SegmentationTrainer,
                        "validator": SegmentationValidator,
                        "predictor": SegmentationPredictor},
            "pose": {"model": PoseModel, "trainer": PoseTrainer,
                     "validator": PoseValidator, "predictor": PosePredictor},
            "obb": {"model": OBBModel, "trainer": OBBTrainer,
                    "validator": OBBValidator, "predictor": OBBPredictor},
        }

    # -- construction --------------------------------------------------------
    def _new(self, cfg, verbose: bool = False):
        """Build a fresh model from a YAML graph config; the task comes from
        the config's head row (nn/tasks.guess_model_task) unless forced."""
        from yolo_sod_tpu.nn.tasks import guess_model_task

        self.cfg = cfg
        if self._task_forced is None:
            self.task = guess_model_task(cfg)
        model_cls = self.task_map[self.task]["model"]
        self.model = model_cls(cfg, verbose=verbose)
        self.overrides["model"] = cfg if isinstance(cfg, str) else "<dict>"
        self.overrides["task"] = self.task

    def _load(self, weights: str):
        """Load a model + params from a checkpoint file (.ckpt/.msgpack)."""
        from yolo_sod_tpu.nn.tasks import guess_model_task
        from yolo_sod_tpu.utils.checkpoint import load_checkpoint

        ckpt = load_checkpoint(weights)
        self.ckpt = ckpt
        if self._task_forced is None:
            self.task = (ckpt.get("train_args") or {}).get("task") \
                or guess_model_task(ckpt["model_yaml"])
        model_cls = self.task_map.get(self.task, {}).get("model", DetectionModel)
        self.model = model_cls(ckpt["model_yaml"])
        self.model.variables = ckpt["variables"]
        if "names" in ckpt:
            self.model.names = ckpt["names"]
        self.overrides["model"] = weights
        self.overrides["task"] = self.task
        train_args = ckpt.get("train_args") or {}
        for k in ("imgsz", "data"):
            if k in train_args:
                self.overrides.setdefault(k, train_args[k])

    # -- modes ---------------------------------------------------------------
    def predict(self, source=None, stream: bool = False, **kwargs):
        """Run inference on a source (array, path, dir, list). Returns Results
        list. The predictor class routes per task (classify returns top-k
        probs and never touches NMS — reference classify/predict.py)."""
        # save defaults OFF for the Python API; the CLI opts in explicitly
        # (reference model.py:508 custom["save"] = is_cli).
        args = {**self.overrides, "conf": kwargs.pop("conf", 0.25),
                "save": False, "mode": "predict", **kwargs}
        if self.predictor is None:
            predictor_cls = self.task_map[self.task]["predictor"]
            self.predictor = predictor_cls(overrides=args)
            for event, funcs in self.callbacks.items():
                self.predictor.callbacks.setdefault(event, []).extend(funcs)
            self.predictor.setup_model(self.model)
        else:
            self.predictor.args = get_cfg(self.predictor.args, args)
        return self.predictor(source=source, stream=stream)

    def __call__(self, source=None, **kwargs):
        return self.predict(source, **kwargs)

    def embed(self, source=None, embed=None, **kwargs):
        """Image embeddings (reference Model.embed engine/model.py:467):
        GAP'd feature vectors of the given layer indices (default
        second-to-last layer), one (D,) array per image."""
        import jax
        import numpy as np

        from yolo_sod_tpu.data.augment import letterbox_np
        from yolo_sod_tpu.engine.predictor import load_source

        if self.model.variables is None:
            self.model.init(imgsz=int(kwargs.get("imgsz", 640)))
        imgsz = int(kwargs.get("imgsz") or self.overrides.get("imgsz") or 640)
        indices = tuple(int(i) for i in (embed or ()))
        fn = jax.jit(lambda v, x: self.model.embed(v, x, indices))
        out = []
        for _, im0 in load_source(source, vid_stride=1):
            im, _, _ = letterbox_np(im0, (imgsz, imgsz), scaleup=False)
            x = np.ascontiguousarray(im[..., ::-1]).astype(np.float32)[None] / 255.0
            out.append(np.asarray(fn(self.model.variables, x))[0])
        return out

    # -- callbacks -------------------------------------------------------
    def add_callback(self, event: str, func) -> None:
        """Register a user callback for a bus event; it is forwarded to every
        trainer/predictor this facade creates (reference Model.add_callback,
        engine/model.py:831)."""
        self.callbacks.setdefault(event, []).append(func)
        if self.predictor is not None:
            self.predictor.callbacks.setdefault(event, []).append(func)

    def clear_callback(self, event: str) -> None:
        """Drop all user callbacks for one event (reference :845)."""
        self.callbacks[event] = []

    def reset_callbacks(self) -> None:
        """Drop all user callbacks (reference :854)."""
        self.callbacks = {}

    def _forward_callbacks(self, target) -> None:
        for event, funcs in self.callbacks.items():
            for f in funcs:
                target.add_callback(event, f)

    def train(self, **kwargs):
        """Train the model; returns metrics."""
        trainer_cls = self.task_map[self.task]["trainer"]
        args = {**self.overrides, **kwargs, "mode": "train"}
        self.trainer = trainer_cls(overrides=args, model=self.model)
        self._forward_callbacks(self.trainer)
        self.trainer.train()
        # The trainer may rebuild the head for the dataset's nc
        # (trainer.py:151-153); adopt its model so later val()/predict()
        # run the trained architecture (reference model.py train() does
        # the same: self.model = self.trainer.model).
        if getattr(self.trainer, "model", None) is not None:
            self.model = self.trainer.model
        best = getattr(self.trainer, "best_variables", None)
        if best:
            self.model.variables = best
        self.metrics = getattr(self.trainer, "metrics", None)
        return self.metrics

    def val(self, **kwargs):
        """Validate on a dataset; returns DetMetrics (detect) / accuracy (classify)."""
        validator_cls = self.task_map[self.task]["validator"]
        args = {**self.overrides, "mode": "val", **kwargs}
        validator = validator_cls(args=get_cfg(DEFAULT_CFG_DICT, args))
        self.metrics = validator(model=self.model)
        return self.metrics

    def export(self, **kwargs):
        """Export to a serialized AOT-compiled form."""
        from yolo_sod_tpu.engine.exporter import Exporter

        args = {**self.overrides, "mode": "export", **kwargs}
        # Export batch defaults to 1 (the reference exporter's default), not
        # the training default — exported graphs are fixed-batch.
        args.setdefault("batch", 1)
        return Exporter(args=get_cfg(DEFAULT_CFG_DICT, args))(model=self.model)

    def track(self, source=None, persist: bool = False, **kwargs):
        """Predict + multi-object tracking (reference model.py:562)."""
        from yolo_sod_tpu.engine.predictor import DetectionPredictor
        from yolo_sod_tpu.trackers.track import register_tracker

        kwargs.setdefault("conf", 0.1)
        kwargs["mode"] = "track"
        if self.predictor is None:
            args = {**self.overrides, **kwargs}
            self.predictor = DetectionPredictor(overrides=args)
            self.predictor.setup_model(self.model)
        if not getattr(self.predictor, "_tracker_registered", False):
            register_tracker(self, persist=persist)
            self.predictor._tracker_registered = True
        return self.predict(source, **kwargs)

    def tune(self, iterations: int = 10, **kwargs):
        """Genetic hyperparameter search (reference model.py:817)."""
        from yolo_sod_tpu.engine.tuner import Tuner

        args = get_cfg(DEFAULT_CFG_DICT, {**self.overrides, **kwargs, "mode": "train"})
        return Tuner(args=args)(model=self, iterations=iterations)

    def benchmark(self, **kwargs):
        from yolo_sod_tpu.utils.benchmarks import benchmark

        return benchmark(model=self, **kwargs)

    # -- introspection -------------------------------------------------------
    @property
    def names(self):
        return getattr(self.model, "names", None)

    @property
    def stride(self):
        return getattr(self.model, "stride", None)

    def info(self, **kwargs):
        return self.model.info(**kwargs)

    def save(self, path: str):
        from yolo_sod_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(path, model=self.model, train_args=self.overrides)


class YOLO(Model):
    """YOLO entry class (reference models/yolo/model.py:11). A '-world'
    model name reroutes to the YOLOWorld facade (reference :15-20) so the
    text-guided graph gets its World task map instead of the plain one."""

    def __init__(self, model="yolov12-sod-fusion-v5-simple.yaml",
                 task=None, verbose: bool = False):
        from pathlib import Path

        stem = Path(str(model)).stem
        if "-world" in stem:
            from yolo_sod_tpu.models.world import YOLOWorld

            new = YOLOWorld(str(model), verbose=verbose)
            self.__class__ = type(new)
            self.__dict__ = new.__dict__
        else:
            super().__init__(model=model, task=task, verbose=verbose)
