"""Segment / Pose / OBB training engines.

TPU-native analogs of reference models/yolo/segment/train.py, pose/train.py
and obb/train.py: each is the detection trainer with a task criterion
(utils/loss_tasks.py), a task validator, and the extra GT tensors the
criterion consumes routed through the jitted step. The SPMD step machinery
(engine/train_step.py) is shared — the criterion receives the head's full
output tuple and the batch dict, nothing else changes.
"""

from __future__ import annotations

from yolo_sod_tpu.engine.trainer import DetectionTrainer
from yolo_sod_tpu.utils.loss_tasks import OBBLoss, PoseLoss, SegmentationLoss


class SegmentationTrainer(DetectionTrainer):
    """Train a Segment-head model (reference segment/train.py)."""

    task = "segment"
    loss_names = ("box_loss", "seg_loss", "cls_loss", "dfl_loss")
    batch_extra_keys = ("masks",)

    def model_class(self):
        from yolo_sod_tpu.nn.tasks import SegmentationModel

        return SegmentationModel

    def default_model(self) -> str:
        return "yolov12-seg.yaml"

    def build_criterion(self, nc: int):
        args = self.args
        return SegmentationLoss(nc=nc, strides=self.model.graph.detect_strides,
                                box_gain=args.box, cls_gain=args.cls,
                                dfl_gain=args.dfl)

    def get_validator(self, vargs):
        from yolo_sod_tpu.engine.validator_tasks import SegmentationValidator

        return SegmentationValidator(args=vargs)


class PoseTrainer(DetectionTrainer):
    """Train a Pose-head model (reference pose/train.py). kpt_shape comes
    from the dataset yaml (coco-pose contract) and must match the head's."""

    task = "pose"
    loss_names = ("box_loss", "pose_loss", "kobj_loss", "cls_loss", "dfl_loss")
    batch_extra_keys = ("keypoints",)

    def model_class(self):
        from yolo_sod_tpu.nn.tasks import PoseModel

        return PoseModel

    def default_model(self) -> str:
        return "yolov12-pose.yaml"

    def _model_head_mismatch(self) -> bool:
        ks = self.data.get("kpt_shape")
        return ks is not None and tuple(ks) != tuple(self.model.kpt_shape)

    def _rebuild_model(self, nc: int):
        from yolo_sod_tpu.nn.tasks import PoseModel

        return PoseModel(self.model.yaml, nc=nc,
                         data_kpt_shape=self.data.get("kpt_shape"))

    def build_criterion(self, nc: int):
        args = self.args
        kpt_shape = tuple(self.data.get("kpt_shape", (17, 3)))
        return PoseLoss(nc=nc, strides=self.model.graph.detect_strides,
                        box_gain=args.box, cls_gain=args.cls,
                        dfl_gain=args.dfl, kpt_shape=kpt_shape,
                        pose_gain=getattr(args, "pose", 12.0),
                        kobj_gain=getattr(args, "kobj", 1.0))

    def get_validator(self, vargs):
        from yolo_sod_tpu.engine.validator_tasks import PoseValidator

        return PoseValidator(args=vargs)


class OBBTrainer(DetectionTrainer):
    """Train an OBB-head model (reference obb/train.py). Batch contract:
    `bboxes` carry the ROTATED rect (cx, cy, w, h) normalized + `angles`
    radians (data/dataset.py obb task)."""

    task = "obb"
    loss_names = ("box_loss", "cls_loss", "dfl_loss")
    batch_extra_keys = ("angles",)

    def model_class(self):
        from yolo_sod_tpu.nn.tasks import OBBModel

        return OBBModel

    def default_model(self) -> str:
        return "yolov12-obb.yaml"

    def build_criterion(self, nc: int):
        args = self.args
        return OBBLoss(nc=nc, strides=self.model.graph.detect_strides,
                       box_gain=args.box, cls_gain=args.cls,
                       dfl_gain=args.dfl)

    def get_validator(self, vargs):
        from yolo_sod_tpu.engine.validator_tasks import OBBValidator

        return OBBValidator(args=vargs)
