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
    """Train an RTDETRDecoder-head model end to end.

    Criterion parity with the reference RTDETRDetectionModel
    (models/rtdetr/train.py + models/utils/loss.py:291): VFL class loss with
    IoU-weighted targets, L1 + GIoU over matched pairs, per-layer aux losses
    with the encoder proposals as aux layer 0, and contrastive-denoising
    (CDN) reconstruction over a fixed-capacity dn slot axis so the whole
    step stays one compiled graph."""

    task = "detect"
    loss_names = ("giou_loss", "cls_loss", "l1_loss")

    def __init__(self, *args, loss_gain=None, use_fl: bool = True,
                 use_vfl: bool = True, alpha: float = 0.25,
                 gamma: float = 2.0, num_dn: int = 100,
                 cls_noise_ratio: float = 0.5, box_noise_scale: float = 1.0,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.loss_gain = loss_gain or {"class": 1.0, "bbox": 5.0, "giou": 2.0}
        self.use_fl = use_fl
        self.use_vfl = use_vfl
        self.alpha = alpha
        self.gamma = gamma
        self.num_dn = num_dn
        self.cls_noise_ratio = cls_noise_ratio
        self.box_noise_scale = box_noise_scale

    def default_model(self) -> str:
        return "rtdetr-l.yaml"

    def build_criterion(self, nc: int):
        return HungarianMatcher(cost_gain=self.loss_gain, use_fl=self.use_fl,
                                alpha=self.alpha, gamma=self.gamma)

    def get_validator(self, vargs):
        return RTDETRValidator(args=vargs)

    def _compile_step(self):
        from yolo_sod_tpu.models.utils.loss import detr_loss_terms

        model, tx = self.model, self.tx
        nc = self.model.nc
        gains = self.loss_gain
        use_vfl = self.use_vfl and self.use_fl
        accumulate = self.accumulate
        compute_dtype = jnp.bfloat16 if self.args.amp else jnp.float32
        matcher = self.criterion
        num_dn = self.num_dn
        cdn_rng = np.random.default_rng(getattr(self.args, "seed", 0) or 0)

        def forward(params, batch_stats, img, dn):
            return model.net.apply(
                {"params": params, "batch_stats": batch_stats},
                image_to_compute(img, compute_dtype), train=True, dn=dn,
                mutable=["batch_stats"])

        def split_match(out, D):
            """(enc-first) match-part layer stack (L+1, B, nq, ...)."""
            dec_b = out["dec_bboxes"].astype(jnp.float32)
            dec_s = out["dec_scores"].astype(jnp.float32)
            pred_b = jnp.concatenate(
                [out["enc_bboxes"][None].astype(jnp.float32), dec_b[:, :, D:]], 0)
            pred_s = jnp.concatenate(
                [out["enc_scores"][None].astype(jnp.float32), dec_s[:, :, D:]], 0)
            return pred_b, pred_s, dec_b[:, :, :D], dec_s[:, :, :D]

        @jax.jit
        def preview(params, batch_stats, img, dn_cls, dn_bbox, attn):
            dn = (dn_cls, dn_bbox, attn) if num_dn > 0 else None
            out = forward(params, batch_stats, img, dn)[0]
            D = dn_cls.shape[1] if num_dn > 0 else 0
            pred_b, pred_s, _, _ = split_match(out, D)
            return pred_b, pred_s

        def loss_fn(params, batch_stats, img, dn_cls, dn_bbox, attn,
                    tgt_cls, tgt_box, tgt_mask, n_gt,
                    dn_tgt_cls, dn_tgt_box, dn_tgt_mask, n_dn_gt):
            dn = (dn_cls, dn_bbox, attn) if num_dn > 0 else None
            out, mutated = forward(params, batch_stats, img, dn)
            D = dn_cls.shape[1] if num_dn > 0 else 0
            pred_b, pred_s, dn_b, dn_s = split_match(out, D)

            # Match part: per-layer VFL/L1/GIoU terms, layer 0 = encoder
            # proposals, last = final decoder layer (reference ordering).
            zero = jnp.zeros(())
            total = zero
            items = None
            L1 = pred_b.shape[0]
            for li in range(L1):
                d = detr_loss_terms(pred_b[li], pred_s[li], tgt_cls[li],
                                    tgt_box[li], tgt_mask[li], n_gt, nc,
                                    use_vfl, n_gt > 0, gains)
                total = total + d["loss_class"] + d["loss_bbox"] + d["loss_giou"]
                if li == L1 - 1:      # main layer -> reported items
                    items = jnp.stack([d["loss_giou"], d["loss_class"],
                                       d["loss_bbox"]])
            # Denoising reconstruction: same targets for every decoder layer
            # (reference RTDETRDetectionLoss dn aux loop).
            if num_dn > 0:
                for li in range(dn_b.shape[0]):
                    d = detr_loss_terms(dn_b[li], dn_s[li], dn_tgt_cls,
                                        dn_tgt_box, dn_tgt_mask, n_dn_gt, nc,
                                        use_vfl, n_dn_gt > 0, gains)
                    total = total + d["loss_class"] + d["loss_bbox"] + d["loss_giou"]
            return total, (items, mutated.get("batch_stats", batch_stats))

        @jax.jit
        def grad_step(state: TrainState, img, dn_cls, dn_bbox, attn,
                      tgt_cls, tgt_box, tgt_mask, n_gt,
                      dn_tgt_cls, dn_tgt_box, dn_tgt_mask, n_dn_gt):
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (loss, (items, new_bs)), grads = grad_fn(
                state.params, state.batch_stats, img, dn_cls, dn_bbox, attn,
                tgt_cls, tgt_box, tgt_mask, n_gt,
                dn_tgt_cls, dn_tgt_box, dn_tgt_mask, n_dn_gt)
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
            B = img.shape[0]
            nq = min(dict(model.net.graph.specs[-1].kwargs).get("nq", 300),
                     self._num_tokens(img.shape))
            dn = self._build_cdn(batch, nq, cdn_rng)
            pred_b, pred_s = preview(state.params, state.batch_stats, img,
                                     dn["dn_cls"], dn["dn_bbox"], dn["attn"])
            tgt_cls, tgt_box, tgt_mask, n_gt = self._match_targets(
                np.asarray(pred_b), np.asarray(pred_s), batch, matcher)
            return grad_step(state, img, dn["dn_cls"], dn["dn_bbox"],
                             dn["attn"], jnp.asarray(tgt_cls),
                             jnp.asarray(tgt_box), jnp.asarray(tgt_mask),
                             jnp.asarray(n_gt, jnp.float32),
                             dn["tgt_cls"], dn["tgt_box"], dn["tgt_mask"],
                             dn["n_dn_gt"])

        self.train_step = step

    def _num_tokens(self, img_shape) -> int:
        """Total multi-level token count for this image size (the decoder
        clamps nq to it on tiny eval shapes — keep the mask size in sync)."""
        H, W = img_shape[1], img_shape[2]
        strides = self.model.net.graph.detect_strides or (8, 16, 32)
        return sum((H // s) * (W // s) for s in strides)

    def _build_cdn(self, batch, nq: int, rng):
        """Fixed-capacity CDN inputs + reconstruction targets for one batch.
        Empty-GT batches produce fully-masked dead slots so the compiled
        shapes never change."""
        from yolo_sod_tpu.models.utils.loss import get_cdn_group

        mask_gt = np.asarray(batch["mask_gt"]) > 0
        B, M = mask_gt.shape
        D = 2 * max(self.num_dn, M)
        if self.num_dn <= 0:
            z = jnp.zeros((B, 0), jnp.int32)
            return {"dn_cls": z, "dn_bbox": jnp.zeros((B, 0, 4), jnp.float32),
                    "attn": jnp.ones((nq, nq), bool),
                    "tgt_cls": z, "tgt_box": jnp.zeros((B, 0, 4), jnp.float32),
                    "tgt_mask": jnp.zeros((B, 0), jnp.float32),
                    "n_dn_gt": jnp.asarray(0.0, jnp.float32)}
        gt_groups = mask_gt.sum(1).astype(int).tolist()
        cls_all = np.asarray(batch["cls"]).reshape(B, M)
        box_all = np.asarray(batch["bboxes"], np.float32).reshape(B, M, 4)
        flat = {"cls": np.concatenate([cls_all[b][mask_gt[b]] for b in range(B)])
                if sum(gt_groups) else np.zeros(0, np.float32),
                "bboxes": np.concatenate([box_all[b][mask_gt[b]] for b in range(B)])
                if sum(gt_groups) else np.zeros((0, 4), np.float32),
                "gt_groups": gt_groups}
        cdn = get_cdn_group(flat, self.model.nc, nq, None, num_dn=self.num_dn,
                            cls_noise_ratio=self.cls_noise_ratio,
                            box_noise_scale=self.box_noise_scale,
                            training=True, capacity=D, rng=rng)
        if cdn[0] is None:                     # no GT in batch: inert slots
            T = D + nq
            attn = np.zeros((T, T), bool)
            attn[:, :D] = True
            np.fill_diagonal(attn, False)
            return {"dn_cls": jnp.full((B, D), -1, jnp.int32),
                    "dn_bbox": jnp.zeros((B, D, 4), jnp.float32),
                    "attn": jnp.asarray(~attn),
                    "tgt_cls": jnp.full((B, D), self.model.nc, jnp.int32),
                    "tgt_box": jnp.zeros((B, D, 4), jnp.float32),
                    "tgt_mask": jnp.zeros((B, D), jnp.float32),
                    "n_dn_gt": jnp.asarray(0.0, jnp.float32)}
        dn_cls, dn_bbox, attn_blocked, meta = cdn
        return {"dn_cls": jnp.asarray(dn_cls),
                "dn_bbox": jnp.asarray(dn_bbox),
                "attn": jnp.asarray(~attn_blocked),   # flax: True = attend
                "tgt_cls": jnp.asarray(meta["tgt_cls"]),
                "tgt_box": jnp.asarray(meta["tgt_box"]),
                "tgt_mask": jnp.asarray(meta["tgt_mask"]),
                "n_dn_gt": jnp.asarray(meta["num_dn_gts"], jnp.float32)}

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
