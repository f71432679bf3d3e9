"""Host-side data pipeline.

The reference's `ultralytics.data` directory is absent from its snapshot; this
package is rebuilt from the call-site contract (SURVEY.md §1.1): YOLODataset
batches {"img", "batch_idx", "cls", "bboxes", "im_file", "ori_shape",
"ratio_pad"}, mosaic/mixup/copy-paste/HSV/affine augmentation driven by the
default.yaml keys, LetterBox collate, InfiniteDataLoader with reset().

TPU-specific deltas: images collate to NHWC float32 and labels pad to a
STATIC per-dataset max-boxes M (the TAL assigner compiles on (B, M, A) — a
per-batch dynamic M would retrace every step).
"""

from yolo_sod_tpu.data.annotator import auto_annotate
from yolo_sod_tpu.data.build import (YOLOConcatDataset, build_dataloader,
                                     build_grounding, build_yolo_dataset)
from yolo_sod_tpu.data.dataset import YOLODataset
from yolo_sod_tpu.data.grounding import GroundingDataset
from yolo_sod_tpu.data.utils import check_det_dataset

__all__ = ["YOLODataset", "GroundingDataset", "YOLOConcatDataset",
           "auto_annotate", "build_dataloader", "build_grounding",
           "build_yolo_dataset", "check_det_dataset"]
