"""Classification task: dataset, loss, trainer, validator.

Task-map parity with reference models/yolo/classify/ (train.py, val.py,
predict.py) + v8ClassificationLoss (utils/loss.py). Same jitted-step engine
as detection — only the criterion and the batch contract change.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolo_sod_tpu.cfg import DEFAULT_CFG_DICT, get_cfg, get_save_dir
from yolo_sod_tpu.data.augment import letterbox_np
from yolo_sod_tpu.data.utils import IMG_FORMATS
from yolo_sod_tpu.engine.train_step import (
    build_optimizer, init_train_state, make_train_step, set_hyperparams)
from yolo_sod_tpu.utils import LOGGER, TQDM, colorstr


class ClassificationDataset:
    """Folder-per-class image dataset (torchvision-ImageFolder layout)."""

    def __init__(self, root, imgsz: int = 224, augment: bool = True, seed: int = 0):
        import cv2  # noqa: F401 — fail fast when unavailable

        self.root = Path(root)
        self.imgsz = imgsz
        self.augment = augment
        self.seed = seed
        classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        self.names = dict(enumerate(classes))
        self.samples = []
        for ci, cname in enumerate(classes):
            for f in sorted((self.root / cname).rglob("*")):
                if f.suffix.lower().lstrip(".") in IMG_FORMATS:
                    self.samples.append((str(f), ci))
        if not self.samples:
            raise FileNotFoundError(f"no class images under {root}")
        LOGGER.info(f"cls dataset: {len(self.samples)} images, "
                    f"{len(classes)} classes ({root})")

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        import cv2

        path, ci = self.samples[i]
        im = cv2.imread(path)
        rng = np.random.default_rng((self.seed, i))
        im, _, _ = letterbox_np(im, (self.imgsz, self.imgsz))
        if self.augment and rng.random() < 0.5:
            im = np.fliplr(im)
        x = np.ascontiguousarray(im[..., ::-1]).astype(np.float32) / 255.0
        return x, ci


def classification_loss(logits, batch, label_smoothing: float = 0.0):
    """Softmax cross-entropy (v8ClassificationLoss)."""
    nc = logits.shape[-1]
    onehot = jax.nn.one_hot(batch["cls"].astype(jnp.int32), nc)
    if label_smoothing:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / nc
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -(onehot * logp).sum(-1).mean()
    top1_err = 1.0 - (logits.argmax(-1) == batch["cls"].astype(jnp.int32)).mean()
    items = jnp.stack([ce, top1_err, jnp.zeros(())])
    return ce * logits.shape[0], jax.lax.stop_gradient(items)


class ClassificationTrainer:
    """Minimal classify trainer on the shared jitted step."""

    def __init__(self, overrides: Optional[dict] = None, model=None):
        self.args = get_cfg(DEFAULT_CFG_DICT, {**(overrides or {}), "task": "classify"})
        self.model = model
        self.save_dir = get_save_dir(self.args)
        self.metrics = None

    def train(self):
        args = self.args
        ds = ClassificationDataset(Path(args.data) / "train", imgsz=args.imgsz,
                                   augment=True, seed=args.seed)
        nc = len(ds.names)
        if self.model is None:
            from yolo_sod_tpu.nn.tasks import ClassificationModel

            self.model = ClassificationModel(args.model or "yolov12-cls.yaml", nc=nc)
        if self.model.variables is None:
            self.model.init(imgsz=args.imgsz)
        self.model.names = ds.names

        tx = build_optimizer(self.model.variables["params"], name="AdamW",
                             lr=args.lr0 or 0.001)
        criterion = lambda logits, batch: classification_loss(
            logits, batch, getattr(args, "label_smoothing", 0.0) or 0.0)
        step = make_train_step(self.model, criterion, tx,
                               compute_dtype=jnp.bfloat16 if args.amp else jnp.float32)
        state = init_train_state(self.model, tx)

        B = int(args.batch)
        n = len(ds)
        order = np.arange(n)
        for epoch in range(args.epochs):
            np.random.default_rng(args.seed + epoch).shuffle(order)
            tloss = None
            nb = n // B
            for bi in TQDM(range(nb), total=nb, desc=f"epoch {epoch + 1}/{args.epochs}"):
                sel = order[bi * B:(bi + 1) * B]
                imgs, cls = zip(*(ds[int(i)] for i in sel))
                batch = {"img": jnp.asarray(np.stack(imgs)),
                         "cls": jnp.asarray(np.asarray(cls, np.int32))}
                set_hyperparams(state.opt_state, (args.lr0 or 0.001) *
                                max(1 - epoch / args.epochs, args.lrf))
                state, out = step(state, batch)
                items = np.asarray(jax.device_get(out["items"]))
                tloss = items if tloss is None else (tloss * bi + items) / (bi + 1)
            LOGGER.info(f"epoch {epoch + 1}: loss {tloss[0]:.4f} "
                        f"top1_err {tloss[1]:.4f}")
        self.state = state
        self.model.variables = {"params": jax.device_get(state.ema_params),
                                **({"batch_stats": jax.device_get(state.batch_stats)}
                                   if state.batch_stats else {})}
        self.metrics = self.validate()
        return self.metrics

    def validate(self):
        return ClassificationValidator(args=self.args)(model=self.model)


class ClassificationValidator:
    """Top-1/top-5 accuracy (reference classify/val.py)."""

    def __init__(self, args=None):
        self.args = args if args is not None else get_cfg(DEFAULT_CFG_DICT, {})

    def __call__(self, model=None):
        args = self.args
        val_dir = Path(args.data) / "val"
        if not val_dir.exists():
            val_dir = Path(args.data) / "test"
        ds = ClassificationDataset(val_dir, imgsz=args.imgsz, augment=False)

        @jax.jit
        def fwd(x):
            return model.apply(model.variables, x, train=False)

        B = int(args.batch)
        top1 = top5 = total = 0
        for bi in range(0, len(ds), B):
            pairs = [ds[i] for i in range(bi, min(bi + B, len(ds)))]
            imgs, cls = zip(*pairs)
            x = np.stack(imgs)
            if len(pairs) < B:
                x = np.concatenate([x, np.repeat(x[-1:], B - len(pairs), 0)])
            logits = np.asarray(jax.device_get(fwd(jnp.asarray(x))))[: len(pairs)]
            order = np.argsort(-logits, axis=-1)
            cls = np.asarray(cls)
            top1 += (order[:, 0] == cls).sum()
            top5 += (order[:, :5] == cls[:, None]).any(-1).sum()
            total += len(pairs)
        metrics = {"metrics/accuracy_top1": top1 / total,
                   "metrics/accuracy_top5": top5 / total}
        LOGGER.info(f"{colorstr('val:')} top1 {metrics['metrics/accuracy_top1']:.4f} "
                    f"top5 {metrics['metrics/accuracy_top5']:.4f}")
        return metrics
