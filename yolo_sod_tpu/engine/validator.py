"""Validator: batched on-device inference + host-side mAP.

TPU-native analog of reference engine/validator.py (:107-220) +
models/yolo/detect/val.py: the forward, decode, and multi-label NMS
(conf=0.001, iou=0.7) run as ONE jitted graph over the full batch; only the
(B, max_det, 6) result tensor comes back to the host for the 10-IoU TP
matching (match_predictions) and DetMetrics. The last partial batch pads to
the compiled batch size instead of retracing.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolo_sod_tpu.cfg import DEFAULT_CFG_DICT, get_cfg
from yolo_sod_tpu.data import build_dataloader, build_yolo_dataset, check_det_dataset
from yolo_sod_tpu.data.augment import xywhn2xyxy
from yolo_sod_tpu.ops.nms import non_max_suppression
from yolo_sod_tpu.ops.numerics import image_to_compute
from yolo_sod_tpu.utils import LOGGER, colorstr
from yolo_sod_tpu.utils.metrics import ConfusionMatrix, DetMetrics, box_iou, match_predictions


def pipelined_batches(dataloader, dispatch):
    """One-batch-deep async val pipeline, shared by all four box tasks.

    Dispatches batch i+1 before fetching batch i's outputs, so device
    compute and the host->device image upload overlap the host-side metric
    matching of the previous batch. Yields
    (fetched_outputs_tuple, batch, nb, h_im, w_im); the final partial batch
    is padded to the compiled bucket shape instead of retracing.
    """
    B = dataloader.batch_size
    pending = None

    def fetch(entry):
        outs, batch, nb, h_im, w_im = entry
        return tuple(np.asarray(jax.device_get(o)) for o in outs), \
            batch, nb, h_im, w_im

    for batch in dataloader:
        img = batch["img"]
        nb = img.shape[0]
        if nb < B:
            img = np.concatenate([img, np.repeat(img[-1:], B - nb, 0)], 0)
        h_im, w_im = img.shape[1:3]   # rect buckets: per-batch canvas
        outs = dispatch(jnp.asarray(img))
        entry = (outs, batch, nb, h_im, w_im)
        if pending is not None:
            yield fetch(pending)
        pending = entry
    if pending is not None:
        yield fetch(pending)


def scale_boxes_np(boxes: np.ndarray, ratio_pad, ori_shape) -> np.ndarray:
    """Un-letterbox xyxy boxes to original-image pixels (reference ops.py:92)."""
    r, (dw, dh) = ratio_pad
    out = boxes.copy()
    out[:, [0, 2]] = (out[:, [0, 2]] - dw) / r
    out[:, [1, 3]] = (out[:, [1, 3]] - dh) / r
    h, w = ori_shape
    out[:, [0, 2]] = out[:, [0, 2]].clip(0, w)
    out[:, [1, 3]] = out[:, [1, 3]].clip(0, h)
    return out


class DetectionValidator:
    """Evaluate a DetectionModel on a dataset; returns DetMetrics."""

    def __init__(self, args=None, dataloader=None, save_dir: Optional[Path] = None):
        self.args = args if args is not None else get_cfg(DEFAULT_CFG_DICT, {})
        self.dataloader = dataloader
        self.save_dir = Path(save_dir) if save_dir else None
        self.speed = {"preprocess": 0.0, "inference": 0.0, "loss": 0.0, "postprocess": 0.0}
        self._jit_fn = None

    def _build_fn(self, model, conf: float, iou: float, max_det: int):
        """Jit once per validator; variables are an ARGUMENT so per-epoch EMA
        weights never retrigger compilation."""
        if self._jit_fn is None:
            half = self.args.half

            @jax.jit
            def fn(variables, x):
                preds = model.predict(variables, image_to_compute(
                    x, jnp.bfloat16 if half else jnp.float32))
                preds = self.postprocess_raw(preds)
                return non_max_suppression(preds, conf_thres=conf, iou_thres=iou,
                                           multi_label=True, max_det=max_det)
            self._jit_fn = fn
        return self._jit_fn

    @staticmethod
    def postprocess_raw(preds):
        """Hook for families whose raw output convention differs from the
        decode default (NAS emits xyxy — models/nas.NASValidator). Runs
        inside the jitted val fn; must be trace-compatible."""
        return preds

    def __call__(self, model=None, variables=None, data: Optional[dict] = None):
        args = self.args
        # An AutoBackend (exported artifact / remote server) vals through its
        # uniform forward(); its conf/iou/NMS mode are baked into the artifact
        # (reference benchmark() re-vals every export format the same way).
        backend = model if (model is not None and hasattr(model, "forward")
                            and hasattr(model, "format")) else None
        if backend is None:
            variables = variables if variables is not None else model.variables
            if args.half:
                variables = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
                    variables)

        if data is None:
            data = check_det_dataset(args.data)
        if backend is None:
            names = data.get("names", getattr(model, "names", {}))
            nc = data.get("nc", model.nc)
        else:
            names = backend.names or data.get("names", {})
            nc = data.get("nc", len(names))

        if self.dataloader is None:
            cfg = dict(vars(args) if not isinstance(args, dict) else args)
            if backend is not None:
                cfg["rect"] = False   # exported graphs are fixed-shape
            dataset = build_yolo_dataset(cfg, data["val"], args.batch, data,
                                         mode="val",
                                         stride=32 if backend is not None
                                         else int(max(model.stride)))
            if backend is not None:
                dataset.rect_shapes = None
            self.dataloader = build_dataloader(dataset, args.batch,
                                               workers=getattr(args, "workers", None),
                                               shuffle=False)

        imgsz = args.imgsz
        conf = args.conf if args.conf not in (None, 0) else 0.001
        if backend is not None:
            fn = lambda v, x: backend.forward(np.asarray(x))  # noqa: E731
            dev_variables = variables
        else:
            fn = self._build_fn(model, conf, args.iou, args.max_det)
            # Push the weights to the device ONCE. Passing host arrays into
            # the jitted fn re-transfers all ~27 MB of bf16 params per batch
            # (measured 114 ms/img over the axon tunnel vs 1.6 ms/img of
            # actual compute).
            dev_variables = jax.device_put(variables)

        metrics = DetMetrics(names=names)
        confusion = ConfusionMatrix(nc=nc, conf=conf)
        stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        self.jdict = []    # COCO-format predictions when save_json
        # COCO evaluation uses the sparse 91-id category space
        # (reference detect/val.py:66-68 + data/converter).
        self.is_coco = (Path(str(args.data or "")).stem.startswith("coco")
                        and "8" not in Path(str(args.data or "")).stem
                        and nc == 80)
        if self.is_coco:
            from yolo_sod_tpu.data.converter import coco80_to_coco91_class
            self.class_map = coco80_to_coco91_class()
        else:
            self.class_map = list(range(1000))
        n_images = 0

        # One-batch-deep software pipeline (pipelined_batches, shared with
        # the segment/pose/OBB validators): dispatch batch i+1 before
        # fetching batch i. Per-stage attribution under overlap is fuzzy, so
        # "inference" = wall - host-side matching.
        t_post = 0.0
        t_wall0 = time.perf_counter()
        for (det, n_valid), batch, nb, h_im, w_im in pipelined_batches(
                self.dataloader, lambda img: fn(dev_variables, img)):
            n_images += nb
            t0 = time.perf_counter()
            self._accumulate(det, n_valid, batch, nb, h_im, w_im, stats,
                             confusion, args)
            t_post += time.perf_counter() - t0
        t_inf = max(time.perf_counter() - t_wall0 - t_post, 0.0)

        if stats["tp"]:
            tp = np.concatenate(stats["tp"], 0)
            conf_arr = np.concatenate(stats["conf"], 0)
            pred_cls = np.concatenate(stats["pred_cls"], 0)
            target_cls = np.concatenate(stats["target_cls"], 0)
            if len(tp) and len(target_cls):
                metrics.process(tp, conf_arr, pred_cls, target_cls)

        self.speed["inference"] = t_inf / max(n_images, 1) * 1000
        self.speed["postprocess"] = t_post / max(n_images, 1) * 1000
        metrics.speed = self.speed

        mp, mr, map50, map5095 = metrics.mean_results()
        LOGGER.info(f"{colorstr('val:')} {n_images} images  "
                    f"P={mp:.3f} R={mr:.3f} mAP50={map50:.4f} mAP50-95={map5095:.4f}  "
                    f"({self.speed['inference']:.1f}ms inference/img)")
        if args.verbose and len(metrics.ap_class_index):
            for i, c in enumerate(metrics.ap_class_index):
                p, r, ap50, ap = metrics.class_result(i)
                LOGGER.info(f"  {names.get(int(c), c):<20} P={p:.3f} R={r:.3f} "
                            f"AP50={ap50:.4f} AP={ap:.4f}")
        self.confusion_matrix = confusion
        if getattr(args, "save_json", False) and self.jdict:
            self.save_json_file()
        return metrics

    def _accumulate(self, det, n_valid, batch, nb, h_im, w_im, stats,
                    confusion, args):
        """Per-image host-side TP matching for one fetched batch
        (reference detect/val.py:125-173 update_metrics)."""
        for bi in range(nb):
            d = det[bi][: n_valid[bi]]
            # GT in letterboxed pixels.
            m = batch["mask_gt"][bi] > 0
            gt_cls = batch["cls"][bi][m]
            gt_xywhn = np.concatenate([gt_cls[:, None], batch["bboxes"][bi][m]], axis=1)
            gt_xyxy = xywhn2xyxy(gt_xywhn, w_im, h_im)[:, 1:]
            stats["target_cls"].append(gt_cls)
            if len(d) == 0:
                if len(gt_cls):
                    stats["tp"].append(np.zeros((0, 10), bool))
                    stats["conf"].append(np.zeros(0))
                    stats["pred_cls"].append(np.zeros(0))
                    confusion.process_batch(None, gt_xyxy, gt_cls)
                continue
            if getattr(args, "save_json", False):
                self.pred_to_json(d, batch["im_file"][bi],
                                  batch["ratio_pad"][bi], batch["ori_shape"][bi])
            iou = box_iou(gt_xyxy, d[:, :4])
            tp = match_predictions(d[:, 5], gt_cls, iou)
            stats["tp"].append(tp)
            stats["conf"].append(d[:, 4])
            stats["pred_cls"].append(d[:, 5])
            if args.plots:
                confusion.process_batch(d, gt_xyxy, gt_cls)

    # -- COCO json ------------------------------------------------------------
    def pred_to_json(self, det: np.ndarray, im_file: str, ratio_pad, ori_shape):
        """Append COCO-format rows for one image's detections
        (reference detect/val.py:282 pred_to_json)."""
        stem = Path(im_file).stem
        image_id = int(stem) if stem.isnumeric() else stem
        boxes = scale_boxes_np(det[:, :4], ratio_pad, ori_shape)
        for (x1, y1, x2, y2), conf, cls in zip(boxes, det[:, 4], det[:, 5]):
            self.jdict.append({
                "image_id": image_id,
                "category_id": getattr(self, "class_map",
                                       list(range(1000)))[int(cls)],
                "bbox": [round(float(x1), 3), round(float(y1), 3),
                         round(float(x2 - x1), 3), round(float(y2 - y1), 3)],
                "score": round(float(conf), 5),
            })

    def save_json_file(self, path: Optional[Path] = None):
        import json

        path = path or (self.save_dir / "predictions.json" if self.save_dir
                        else Path("predictions.json"))
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.jdict, f)
        LOGGER.info(f"val: saved {len(self.jdict)} predictions to {path}")
        return path

    def eval_json(self, anno_json, pred_json=None):
        """COCOeval mAP when pycocotools is available
        (reference detect/val.py:297-337); raises with guidance otherwise."""
        try:
            from pycocotools.coco import COCO
            from pycocotools.cocoeval import COCOeval
        except ImportError as e:
            raise ImportError(
                "pycocotools is not installed in this image; the built-in "
                "DetMetrics mAP (101-pt interpolation) is the supported "
                "evaluator here") from e
        anno = COCO(str(anno_json))
        pred = anno.loadRes(str(pred_json or self.save_json_file()))
        ev = COCOeval(anno, pred, "bbox")
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        return {"mAP50-95": ev.stats[0], "mAP50": ev.stats[1]}
