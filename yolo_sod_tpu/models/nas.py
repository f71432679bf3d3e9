"""YOLO-NAS family: facade + predictor + validator.

Capability parity with reference models/nas/ (model.py:26 NAS, predict.py:10
NASPredictor, val.py:11 NASValidator). The reference is a thin adapter around
super-gradients checkpoints whose forward emits decoded (xyxy boxes, class
scores); its predictor/validator convert xyxy->xywh and run the standard NMS.

TPU-native differences: the architecture is a first-class YAML graph
(`cfg/models/yolo-nas-s.yaml`, RepConv stages + DFL head) rather than an
opaque vendored net — so NAS here additionally supports init-from-yaml and
deploy-time reparameterization via `fuse()`; super_gradients (a GPU-stack
dependency) is not required. The family's output contract is honored
exactly: `NASModel.predict` emits xyxy and the predictor converts before the
fused on-device NMS, mirroring reference predict.py:37-48.
"""

from __future__ import annotations

from yolo_sod_tpu.engine.model import Model
from yolo_sod_tpu.engine.predictor import DetectionPredictor
from yolo_sod_tpu.engine.validator import DetectionValidator
from yolo_sod_tpu.nn.tasks import NASModel
from yolo_sod_tpu.ops.boxes import xyxy2xywh

__all__ = ["NAS", "NASPredictor", "NASValidator"]


class NASPredictor(DetectionPredictor):
    """Adapts the NAS xyxy output convention into the shared fused pipeline
    (reference nas/predict.py:35-48 does xyxy2xywh + cat + NMS)."""

    @staticmethod
    def adapt_raw(preds):
        import jax.numpy as jnp

        return jnp.concatenate([xyxy2xywh(preds[..., :4]), preds[..., 4:]], -1)


class NASValidator(DetectionValidator):
    """Validation over NAS raw outputs (reference nas/val.py:38-50: the same
    xyxy adaptation ahead of the standard detect metrics)."""

    @staticmethod
    def postprocess_raw(preds):
        import jax.numpy as jnp

        return jnp.concatenate([xyxy2xywh(preds[..., :4]), preds[..., 4:]], -1)


class NAS(Model):
    """YOLO-NAS facade (reference nas/model.py:26).

    Example:
        model = NAS("yolo-nas-s.yaml")
        results = model.predict(img)
        model.fuse()            # reparameterize RepConv stages for deploy
        results = model.predict(img)   # same outputs, one conv per block
    """

    def __init__(self, model: str = "yolo-nas-s.yaml", verbose: bool = False):
        # Reference asserts pretrained-only; here YAML graphs are first-class,
        # so both `.yaml` construction and `.ckpt` loading are accepted.
        super().__init__(model=model, task="detect", verbose=verbose)

    @property
    def task_map(self) -> dict:
        from yolo_sod_tpu.engine.trainer import DetectionTrainer

        return {"detect": {"model": NASModel, "trainer": DetectionTrainer,
                           "validator": NASValidator,
                           "predictor": NASPredictor}}

    def fuse(self):
        """Deploy-time reparameterization: every RepConv becomes one biased
        3x3 (utils/reparam.fuse_rep_variables). Drops cached compiled
        pipelines — the fused graph must be retraced."""
        self.model.fuse()
        self.predictor = None
        return self

    def info(self, **kwargs):
        return self.model.info(**kwargs)
