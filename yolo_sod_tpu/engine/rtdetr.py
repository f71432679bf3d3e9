"""RT-DETR training route (reference models/rtdetr/train.py:10-60).

The set-prediction loss needs a Hungarian assignment, which is a tiny
O(Q·M) host-side problem per image (the reference solves it with scipy on
CPU too). The step therefore splits in three:

1. a jitted PREVIEW forward producing the per-layer query predictions;
2. host Hungarian matching -> dense (L+1, B, Q) targets (per decoder layer
   + the encoder proposal layer, each matched independently like the
   reference's aux-loss loop);
3. a jitted grad step that re-runs the forward and evaluates the
   focal + L1 + GIoU loss against those FIXED targets (jit-friendly: the
   dynamic assignment became data).

Everything else — optimizer, EMA, state, the trainer epoch loop — is the
shared SPMD machinery: RTDETRTrainer only overrides _compile_step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from yolo_sod_tpu.ops.numerics import image_to_compute
from yolo_sod_tpu.engine.trainer import DetectionTrainer
from yolo_sod_tpu.engine.train_step import TrainState
from yolo_sod_tpu.models.utils.loss import HungarianMatcher
from yolo_sod_tpu.ops.boxes import bbox_iou, xywh2xyxy
from yolo_sod_tpu.utils.ema import ema_update


class RTDETRValidator:
    """NMS-free evaluation (reference models/rtdetr/val.py:96-114): RT-DETR's
    Q queries ARE the final predictions — keep them all (no conf threshold,
    no NMS), best class per query, confidence-sorted, pixel xyxy. Built as a
    DetectionValidator with only the jitted postprocess swapped."""

    def __new__(cls, args=None, **kwargs):
        from yolo_sod_tpu.engine.validator import DetectionValidator

        class _Impl(DetectionValidator):
            def _build_fn(self, model, conf, iou, max_det):
                if self._jit_fn is None:
                    half = self.args.half

                    @jax.jit
                    def fn(variables, x):
                        preds = model.predict(variables, image_to_compute(
                            x, jnp.bfloat16 if half else jnp.float32))
                        preds = self.postprocess_raw(preds)
                        boxes = xywh2xyxy(preds[..., :4].astype(jnp.float32))
                        scores = preds[..., 4:].astype(jnp.float32)
                        confs = scores.max(-1)
                        c = jnp.argmax(scores, -1).astype(jnp.float32)
                        k = min(max_det, confs.shape[1])
                        top_c, idx = jax.lax.top_k(confs, k)
                        det = jnp.concatenate(
                            [jnp.take_along_axis(boxes, idx[..., None], 1),
                             top_c[..., None],
                             jnp.take_along_axis(c, idx, 1)[..., None]], -1)
                        n = jnp.full((det.shape[0],), k, jnp.int32)
                        return det, n
                    self._jit_fn = fn
                return self._jit_fn

        return _Impl(args=args, **kwargs)


class RTDETRTrainer(DetectionTrainer):
    """Train an RTDETRDecoder-head model end to end."""

    task = "detect"
    loss_names = ("giou_loss", "cls_loss", "l1_loss")

    def __init__(self, *args, loss_gain=None, use_fl: bool = True,
                 alpha: float = 0.25, gamma: float = 2.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.loss_gain = loss_gain or {"class": 1.0, "bbox": 5.0, "giou": 2.0}
        self.use_fl = use_fl
        self.alpha = alpha
        self.gamma = gamma

    def default_model(self) -> str:
        return "rtdetr-l.yaml"

    def build_criterion(self, nc: int):
        return HungarianMatcher(cost_gain=self.loss_gain, use_fl=self.use_fl,
                                alpha=self.alpha, gamma=self.gamma)

    def get_validator(self, vargs):
        return RTDETRValidator(args=vargs)

    def _compile_step(self):
        model, tx = self.model, self.tx
        nc = self.model.nc
        gains = self.loss_gain
        alpha, gamma, use_fl = self.alpha, self.gamma, self.use_fl
        accumulate = self.accumulate
        compute_dtype = jnp.bfloat16 if self.args.amp else jnp.float32
        matcher = self.criterion

        @jax.jit
        def preview(params, batch_stats, img):
            out = model.net.apply({"params": params, "batch_stats": batch_stats},
                                  image_to_compute(img, compute_dtype), train=True,
                                  mutable=["batch_stats"])[0]
            pred_b = jnp.concatenate(
                [out["dec_bboxes"], out["enc_bboxes"][None]], 0)
            pred_s = jnp.concatenate(
                [out["dec_scores"], out["enc_scores"][None]], 0)
            return pred_b.astype(jnp.float32), pred_s.astype(jnp.float32)

        def loss_fn(params, batch_stats, img, tgt_cls, tgt_box, tgt_mask, n_gt):
            out, mutated = model.net.apply(
                {"params": params, "batch_stats": batch_stats},
                image_to_compute(img, compute_dtype), train=True, mutable=["batch_stats"])
            pred_b = jnp.concatenate(
                [out["dec_bboxes"], out["enc_bboxes"][None]], 0).astype(jnp.float32)
            pred_s = jnp.concatenate(
                [out["dec_scores"], out["enc_scores"][None]], 0).astype(jnp.float32)

            one_hot = jax.nn.one_hot(tgt_cls, nc + 1)[..., :nc]   # (L,B,Q,nc)
            if use_fl:
                p = jax.nn.sigmoid(pred_s)
                ce = jnp.clip(pred_s, 0, None) - pred_s * one_hot + \
                    jnp.log1p(jnp.exp(-jnp.abs(pred_s)))
                p_t = jnp.where(one_hot == 1, p, 1 - p)
                a_t = jnp.where(one_hot == 1, alpha, 1 - alpha)
                loss_cls = (a_t * (1 - p_t) ** gamma * ce).sum((1, 2, 3)) / n_gt
            else:
                ce = jnp.clip(pred_s, 0, None) - pred_s * one_hot + \
                    jnp.log1p(jnp.exp(-jnp.abs(pred_s)))
                loss_cls = ce.mean(-1).sum((1, 2)) / n_gt

            m = tgt_mask[..., None]
            loss_l1 = (jnp.abs(pred_b - tgt_box) * m).sum((1, 2, 3)) / n_gt
            giou = bbox_iou(xywh2xyxy(pred_b), xywh2xyxy(tgt_box),
                            xywh=False, GIoU=True)[..., 0]
            loss_giou = (((1.0 - giou) * tgt_mask).sum((1, 2))) / n_gt

            total = (gains["class"] * loss_cls.sum() +
                     gains["bbox"] * loss_l1.sum() +
                     gains["giou"] * loss_giou.sum())
            # Items report the LAST decoder layer (index -2: layers are
            # [dec_0..dec_{L-1}, enc]), matching the reference's loss naming.
            items = jnp.stack([gains["giou"] * loss_giou[-2],
                               gains["class"] * loss_cls[-2],
                               gains["bbox"] * loss_l1[-2]])
            return total, (items, mutated.get("batch_stats", batch_stats))

        @jax.jit
        def grad_step(state: TrainState, img, tgt_cls, tgt_box, tgt_mask, n_gt):
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (loss, (items, new_bs)), grads = grad_fn(
                state.params, state.batch_stats, img, tgt_cls, tgt_box,
                tgt_mask, n_gt)
            step = state.step + 1
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            if accumulate > 1:
                applied = (step % accumulate) == 0
                n_applied = step // accumulate
                new_ema = ema_update(state.ema_params, params, n_applied)
                ema = jax.tree_util.tree_map(
                    lambda e, n: jnp.where(applied, n, e),
                    state.ema_params, new_ema)
            else:
                ema = ema_update(state.ema_params, params, step)
            return TrainState(params=params, batch_stats=new_bs,
                              opt_state=opt_state, ema_params=ema, step=step), \
                {"loss": loss, "items": items}

        def step(state: TrainState, batch):
            img = jnp.asarray(batch["img"])
            pred_b, pred_s = preview(state.params, state.batch_stats, img)
            tgt_cls, tgt_box, tgt_mask, n_gt = self._match_targets(
                np.asarray(pred_b), np.asarray(pred_s), batch, matcher)
            return grad_step(state, img, jnp.asarray(tgt_cls),
                             jnp.asarray(tgt_box), jnp.asarray(tgt_mask),
                             jnp.asarray(n_gt, jnp.float32))

        self.train_step = step

    @staticmethod
    def _match_targets(pred_b, pred_s, batch, matcher):
        """Hungarian-match every layer's predictions -> dense targets.

        batch carries the padded (B, M) GT contract; flatten to the matcher's
        concatenated form (reference collate's gt_groups key)."""
        L, B, Q, nc = pred_s.shape
        mask_gt = np.asarray(batch["mask_gt"]) > 0
        gt_groups = mask_gt.sum(1).astype(int).tolist()
        gt_cls = np.concatenate([np.asarray(batch["cls"])[b][mask_gt[b]]
                                 for b in range(B)]) if sum(gt_groups) else \
            np.zeros(0, np.float32)
        gt_box = np.concatenate([np.asarray(batch["bboxes"])[b][mask_gt[b]]
                                 for b in range(B)]) if sum(gt_groups) else \
            np.zeros((0, 4), np.float32)

        tgt_cls = np.full((L, B, Q), nc, np.int32)      # background = nc
        tgt_box = np.zeros((L, B, Q, 4), np.float32)
        tgt_mask = np.zeros((L, B, Q), np.float32)
        for li in range(L):
            match = matcher(pred_b[li], pred_s[li], gt_box, gt_cls, gt_groups)
            start = 0
            for b, (pi, gi) in enumerate(match):
                if gt_groups[b]:
                    tgt_cls[li, b, pi] = gt_cls[start + gi].astype(np.int32)
                    tgt_box[li, b, pi] = gt_box[start + gi]
                    tgt_mask[li, b, pi] = 1.0
                start += gt_groups[b]
        return tgt_cls, tgt_box, tgt_mask, float(max(sum(gt_groups), 1))


class RTDETR:
    """RT-DETR facade (reference models/rtdetr/model.py): the Model class
    with the trainer routed to RTDETRTrainer. Import-cycle-free thin shim."""

    def __new__(cls, model: str = "rtdetr-l.yaml", **kwargs):
        from yolo_sod_tpu.engine.model import Model

        class _RTDETRModel(Model):
            @property
            def task_map(self):
                tm = super().task_map
                tm["detect"] = dict(tm["detect"], trainer=RTDETRTrainer,
                                    validator=RTDETRValidator)
                return tm

        return _RTDETRModel(model, **kwargs)
