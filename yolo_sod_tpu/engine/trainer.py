"""Trainer: the full training loop, TPU-native.

Re-expression of reference engine/trainer.py (BaseTrainer.train :170,
_setup_train :230-317, _do_train :319-475, save_model :513-546,
build_optimizer :759-821, resume :692-758) around one jitted SPMD step:

- forward+backward+clip+update+EMA is a single compiled function
  (engine/train_step.py); the per-batch Python body only computes warmup
  schedules and feeds data;
- no AMP scaler / DDP wrap / world-size loss scaling — bf16 is native and the
  gradient all-reduce is an XLA collective implied by batch sharding;
- warmup lr/momentum interpolation (trainer.py:367-376) writes injected optax
  hyperparams host-side — zero retraces;
- checkpoints are msgpack pytrees with the same last/best/periodic policy.
"""

from __future__ import annotations

import math
import time
from datetime import datetime
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from yolo_sod_tpu.cfg import DEFAULT_CFG_DICT, get_cfg, get_save_dir
from yolo_sod_tpu.data import build_dataloader, build_yolo_dataset, check_det_dataset
from yolo_sod_tpu.engine.train_step import (
    TrainState,
    build_optimizer,
    init_train_state,
    make_train_step,
    set_hyperparams,
    shard_state,
)
from yolo_sod_tpu.parallel.mesh import build_mesh, shard_batch, shard_batch_sp
from yolo_sod_tpu.utils import LOGGER, TQDM, colorstr
from yolo_sod_tpu.utils.callbacks import add_integration_callbacks, get_default_callbacks
from yolo_sod_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from yolo_sod_tpu.utils.loss import DetectionLoss


def _accel_backend() -> bool:
    """amp=True means bf16 on accelerators only — on CPU, bf16 is emulated
    and slower, so training stays f32 there (reference check_amp contract:
    AMP is a GPU feature, checks.py disables it on CPU)."""
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


class EarlyStopping:
    """Fitness-plateau stopper (reference torch_utils.py:713)."""

    def __init__(self, patience: int = 50):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch: int, fitness: Optional[float]):
        if fitness is None:
            return False
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        stop = (epoch - self.best_epoch) >= self.patience
        if stop:
            LOGGER.info(f"EarlyStopping: no improvement in last {self.patience} epochs "
                        f"(best fitness={self.best_fitness:.5f} @ epoch {self.best_epoch}).")
        return stop


class DetectionTrainer:
    """Detection training engine (reference BaseTrainer + DetectionTrainer).

    Task subclasses (engine/trainer_tasks.py — the reference's
    models/yolo/{segment,pose,obb}/train.py) override the four hooks:
    `task`, `model_class()`, `build_criterion()`, `get_validator()`, plus
    `loss_names` and `batch_extra_keys` for the extra GT tensors their
    criterion consumes.
    """

    task = "detect"
    loss_names = ("box_loss", "cls_loss", "dfl_loss")
    batch_extra_keys: tuple = ()
    # Host-side batch keys preprocess_batch consumes and must POP before the
    # batch ships to the jitted step (e.g. the grounding per-image "texts").
    host_batch_keys: tuple = ()

    def __init__(self, overrides: Optional[dict] = None, model=None, _callbacks=None):
        self.args = get_cfg(DEFAULT_CFG_DICT, overrides or {})
        self.model = model
        self.save_dir = get_save_dir(self.args)
        self.wdir = self.save_dir / "weights"
        self.last, self.best = self.wdir / "last.ckpt", self.wdir / "best.ckpt"
        self.best_fitness = 0.0
        self.best_variables = None
        self.metrics = None
        self.tloss = None
        self.epoch = 0
        self.start_epoch = 0
        self.epoch_time = None
        self.callbacks = _callbacks or get_default_callbacks()
        self.csv = self.save_dir / "results.csv"
        add_integration_callbacks(self)

    # -- task hooks (overridden by trainer_tasks.py subclasses) ---------------
    def model_class(self):
        from yolo_sod_tpu.nn.tasks import DetectionModel

        return DetectionModel

    def default_model(self) -> str:
        return "yolov12-sod-fusion-v5-simple.yaml"

    def _model_head_mismatch(self) -> bool:
        """Task hook: does the model head disagree with the dataset contract
        beyond nc (e.g. pose kpt_shape, reference pose/train.py get_model)?"""
        return False

    def _rebuild_model(self, nc: int):
        return type(self.model)(self.model.yaml, nc=nc)

    def build_criterion(self, nc: int):
        args = self.args
        return DetectionLoss(nc=nc, strides=self.model.graph.detect_strides,
                             box_gain=args.box, cls_gain=args.cls,
                             dfl_gain=args.dfl)

    def get_validator(self, vargs):
        from yolo_sod_tpu.engine.validator import DetectionValidator

        return DetectionValidator(args=vargs)

    def get_dataset(self) -> dict:
        """Resolve args.data into the data dict (reference BaseTrainer
        get_dataset hook; WorldTrainerFromScratch overrides with the
        multi-dataset open-vocab spec)."""
        return check_det_dataset(self.args.data)

    def build_dataset(self, img_path, mode: str = "train", batch=None):
        """Build the training dataset for one resolved path (reference
        DetectionTrainer.build_dataset hook)."""
        stride = int(max(self.model.stride))
        return build_yolo_dataset(vars(self.args), img_path, batch or
                                  self.args.batch, self.data, mode=mode,
                                  stride=stride, seed=self.args.seed,
                                  task=self.task)

    def preprocess_batch(self, batch: dict) -> dict:
        """Last hook before the device batch ships (reference
        BaseTrainer.preprocess_batch). WorldTrainer attaches the
        text-embedding guide here."""
        return batch

    # -- callbacks ------------------------------------------------------------
    def add_callback(self, event: str, callback):
        self.callbacks[event].append(callback)

    def run_callbacks(self, event: str):
        for cb in self.callbacks.get(event, []):
            cb(self)

    # -- setup ----------------------------------------------------------------
    def _setup_train(self):
        args = self.args
        self._check_resume()
        self.run_callbacks("on_pretrain_routine_start")
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.wdir.mkdir(parents=True, exist_ok=True)

        # Model.
        if self.model is None:
            self.model = self.model_class()(args.model or self.default_model())
        self.data = self.get_dataset()
        nc = self.data["nc"]
        if nc != self.model.nc or self._model_head_mismatch():
            LOGGER.info(f"rebuilding model head for nc={nc}")
            self.model = self._rebuild_model(nc)
        self.model.names = self.data["names"]
        if self.model.variables is None:
            self.model.init(rng=jax.random.PRNGKey(args.seed), imgsz=args.imgsz)

        # Data.
        self.trainset = self.build_dataset(self.data["train"], mode="train",
                                           batch=args.batch)
        self.train_loader = build_dataloader(self.trainset, int(args.batch),
                                             workers=getattr(args, "workers", None),
                                             shuffle=True, seed=args.seed)
        self.nb = len(self.train_loader)  # batches per epoch

        # Optimizer + accumulation (reference trainer.py:301, 759-821).
        self.accumulate = max(round(args.nbs / args.batch), 1)
        weight_decay = args.weight_decay * args.batch * self.accumulate / args.nbs
        iterations = math.ceil(self.nb / self.accumulate) * args.epochs
        name, lr0, momentum = args.optimizer, args.lr0, args.momentum
        if name == "auto":
            if iterations > 10000:
                name, lr0, momentum = "SGD", 0.01, 0.9
            else:
                name, lr0, momentum = "AdamW", round(0.002 * 5 / (4 + nc), 6), 0.9
            LOGGER.info(f"{colorstr('optimizer:')} auto -> {name}(lr={lr0}, momentum={momentum})")
        self.lr0, self.momentum, self.opt_name = lr0, momentum, name
        tx = build_optimizer(self.model.variables["params"], name=name, lr=lr0,
                             momentum=momentum, weight_decay=weight_decay,
                             iterations=iterations, nc=nc)
        # Layer freezing (reference trainer.py:246 freeze list; the reference
        # also always freezes .dfl — our DFL is closed-form, nothing to freeze).
        if args.freeze not in (None, 0):
            freeze = list(range(args.freeze)) if isinstance(args.freeze, int) \
                else [int(i) for i in args.freeze]
            frozen_names = {f"model_{i}" for i in freeze}

            def is_frozen(path_key: str) -> bool:
                # model_{i} or model_{i}_{rep}
                parts = path_key.split("_")
                return len(parts) >= 2 and f"model_{parts[1]}" in frozen_names

            mask = {k: jax.tree_util.tree_map(lambda _: is_frozen(k), v)
                    for k, v in self.model.variables["params"].items()}
            # Zero the FINAL updates of frozen leaves (zeroing only the grads
            # would still let weight decay move them).
            tx = optax.chain(tx, optax.masked(optax.set_to_zero(), mask))
            LOGGER.info(f"freeze: layers {sorted(frozen_names)}")
        if self.accumulate > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=self.accumulate)
        self.tx = tx

        # LR schedule (reference _setup_scheduler trainer.py:209-215).
        lrf = args.lrf
        if args.cos_lr:
            self.lf = lambda e: max((1 - math.cos(e * math.pi / args.epochs)) / 2, 0) * (lrf - 1) + 1
        else:
            self.lf = lambda e: max(1 - e / args.epochs, 0) * (1.0 - lrf) + lrf

        # Mesh: data-parallel over all local devices that divide the batch.
        # args.spatial > 1 adds a 'spatial' axis sharding image HEIGHT across
        # chips (parallel/mesh.py shard_batch_sp) — per-device activation
        # memory scales 1/spatial, the lever for 1280²+ SOD inputs; GSPMD
        # inserts the conv halo exchanges.
        n_sp = int(getattr(args, "spatial", 1) or 1)
        n_dev = len(jax.devices())
        if n_sp > 1:
            if n_dev % n_sp:
                raise ValueError(f"spatial={n_sp} must divide the "
                                 f"{n_dev} available devices")
            n_dp = n_dev // n_sp
            while n_dp > 1 and args.batch % n_dp:
                n_dp -= 1
            self.mesh = build_mesh(shape=(n_dp, n_sp),
                                   axes=("data", "spatial"),
                                   devices=jax.devices()[: n_dp * n_sp])
            LOGGER.info(f"{colorstr('mesh:')} {n_dp}-way data x "
                        f"{n_sp}-way spatial over {n_dp * n_sp} devices")
        else:
            while n_dev > 1 and args.batch % n_dev:
                n_dev -= 1
            self.mesh = build_mesh(devices=jax.devices()[:n_dev]) if n_dev > 1 else None
            if self.mesh is not None:
                LOGGER.info(f"{colorstr('mesh:')} data-parallel over {n_dev} devices")

        # Criterion + step.
        self.criterion = self.build_criterion(nc)
        self.active_mask = None
        self._compile_step()

        self.state = init_train_state(self.model, self.tx)
        if self.mesh is not None:
            self.state = shard_state(self.state, self.mesh)

        # Validator (reuses val split).
        self.validator = None
        if self.args.val and self.data.get("val"):
            vargs = get_cfg(vars(self.args), {"mode": "val", "conf": 0.001, "iou": 0.7,
                                             "plots": False, "verbose": False})
            self.validator = self.get_validator(vargs)

        self.stopper = EarlyStopping(patience=args.patience)
        self.warmup_iters = max(round(args.warmup_epochs * self.nb), 100) \
            if args.warmup_epochs > 0 else 0

        self._maybe_resume()
        self.run_callbacks("on_pretrain_routine_end")

    def _compile_step(self):
        """(Re)build the jitted train step; called at stage boundaries when the
        DetectStable active mask changes (one retrace per stage, not per step)."""
        self.train_step = make_train_step(
            self.model, self.criterion, self.tx, mesh=self.mesh,
            accumulate=self.accumulate,
            compute_dtype=jnp.bfloat16 if (self.args.amp and _accel_backend())
            else jnp.float32,
            active_mask=self.active_mask)

    def set_active_mask(self, mask):
        """P2-curriculum gate (reference DetectStable.set_active_mask)."""
        if tuple(mask) != (tuple(self.active_mask) if self.active_mask else None):
            self.active_mask = tuple(mask)
            self._compile_step()

    def set_loss_gains(self, box=None, cls=None, dfl=None):
        """Mutate criterion gains mid-run (reference
        callbacks/early_phase_tweaks.py lowers args.cls on anomalous early
        loss). Gains are trace-time constants of the jitted step, so this
        rebuilds criterion + step — ONE retrace per change, like the P2
        mask flip, never per step."""
        changed = False
        for k, v in (("box", box), ("cls", cls), ("dfl", dfl)):
            if v is not None and getattr(self.args, k) != v:
                setattr(self.args, k, v)
                changed = True
        if changed:
            self.criterion = self.build_criterion(self.criterion.nc)
            self._compile_step()

    # -- resume ---------------------------------------------------------------
    def _check_resume(self):
        """Pre-setup: reload the original run's train args from the checkpoint
        (reference check_resume, trainer.py:692-722) so the optimizer/loader
        rebuild identically; run-identity keys keep their new values."""
        self._resume_ckpt = None
        resume = self.args.resume
        if not resume:
            return
        path = self.last if resume in (True, "True", "true") else Path(resume)
        if not path.exists():
            LOGGER.warning(f"resume checkpoint not found: {path}")
            return
        self._resume_ckpt = load_checkpoint(path)
        keep = {"resume", "epochs", "data", "project", "name", "exist_ok",
                "save", "val", "device", "workers", "model", "plots", "mode"}
        for k, v in (self._resume_ckpt.get("train_args") or {}).items():
            if k not in keep and hasattr(self.args, k):
                setattr(self.args, k, v)

    def _maybe_resume(self):
        ckpt = self._resume_ckpt
        if ckpt is None:
            return
        self.state = TrainState(
            params=ckpt["variables"]["params"],
            batch_stats=ckpt["variables"].get("batch_stats", {}),
            opt_state=serialization.from_state_dict(self.state.opt_state, ckpt["opt_state"])
            if ckpt.get("opt_state") else self.state.opt_state,
            ema_params=(ckpt.get("ema") or {}).get("params", ckpt["variables"]["params"]),
            step=jnp.asarray(ckpt.get("step", 0), jnp.int32),
        )
        if self.mesh is not None:
            self.state = shard_state(self.state, self.mesh)
        self.start_epoch = ckpt.get("epoch", -1) + 1
        self.best_fitness = ckpt.get("best_fitness", 0.0)
        LOGGER.info(f"resumed at epoch {self.start_epoch} "
                    f"(best_fitness={self.best_fitness:.5f})")

    # -- loop -----------------------------------------------------------------
    def train(self):
        self._setup_train()
        args = self.args
        LOGGER.info(f"{colorstr('train:')} {args.epochs} epochs, batch {args.batch}, "
                    f"imgsz {args.imgsz}, accumulate x{self.accumulate}, "
                    f"{self.nb} batches/epoch")
        self.run_callbacks("on_train_start")
        t_train = time.time()
        self._t_train0 = t_train
        epoch = self.start_epoch
        for epoch in range(self.start_epoch, args.epochs):
            self.epoch = epoch
            t_epoch0 = time.time()
            self.run_callbacks("on_train_epoch_start")
            if epoch == args.epochs - args.close_mosaic:
                self.trainset.close_mosaic()
                self.train_loader.reset()

            self.tloss = None
            self._seen = 0
            device_items: list = []
            pbar = TQDM(enumerate(self.train_loader), total=self.nb,
                        desc=f"epoch {epoch + 1}/{args.epochs}")
            for i, batch in pbar:
                self.run_callbacks("on_train_batch_start")
                ni = i + self.nb * epoch
                # Profiler window (reference per-layer profiling analog,
                # tasks.py:202 — here per-op detail comes from an XLA trace
                # viewable in TensorBoard/Perfetto).
                if args.profile and ni == 2:
                    jax.profiler.start_trace(str(self.save_dir / "profile"))
                elif args.profile and ni == 5:
                    jax.profiler.stop_trace()
                    LOGGER.info(f"profiler: trace written to {self.save_dir}/profile")
                self._warmup(ni, epoch)
                dev_batch = {k: batch[k]
                             for k in ("img", "cls", "bboxes", "mask_gt",
                                       *self.batch_extra_keys,
                                       *self.host_batch_keys) if k in batch}
                dev_batch = self.preprocess_batch(dev_batch)
                if self.mesh is not None:
                    if "spatial" in self.mesh.axis_names:
                        dev_batch = shard_batch_sp(dev_batch, self.mesh)
                    else:
                        dev_batch = shard_batch(dev_batch, self.mesh)
                self.state, out = self.train_step(self.state, dev_batch)
                # Keep the dispatch queue full: loss items stay on device and
                # only sync to the host every few steps / at epoch end.
                device_items.append(out["items"])
                if i % 8 == 7 or i == self.nb - 1:
                    fetched = np.stack([np.asarray(jax.device_get(d))
                                        for d in device_items])
                    device_items.clear()
                    mean = fetched.mean(0)
                    n_new = fetched.shape[0]
                    self.tloss = mean if self.tloss is None else \
                        (self.tloss * self._seen + mean * n_new) / (self._seen + n_new)
                    self._seen += n_new
                    if hasattr(pbar, "set_postfix_str"):
                        self.tloss = np.asarray(self.tloss)
                        pbar.set_postfix_str(" ".join(
                            f"{n.removesuffix('_loss')} {v:.3f}" for n, v in
                            zip(self.loss_names, np.atleast_1d(self.tloss))))
                self.run_callbacks("on_train_batch_end")
            self.run_callbacks("on_train_epoch_end")

            # Validation with EMA params (reference trainer.py:432-435).
            # val_period thins the cadence (extension over the reference,
            # which vals every epoch): per-epoch val of a small-image set is
            # host/transfer-bound on a remote-tunnel chip and can exceed the
            # train phase itself. EarlyStopping sees fitness only on val
            # epochs (None elsewhere is ignored); the final epoch always
            # validates.
            fitness = None
            final_epoch = epoch + 1 >= args.epochs
            vp = max(int(getattr(args, "val_period", 1) or 1), 1)
            do_val = bool(args.val) and ((epoch + 1) % vp == 0)
            if self.validator is not None and (do_val or final_epoch):
                self.metrics = self._validate()
                fitness = self.metrics.fitness
                if fitness >= self.best_fitness:
                    self.best_fitness = fitness
                    self.best_variables = self._ema_variables()
            self._write_csv(epoch, fitness)
            self.run_callbacks("on_fit_epoch_end")

            if args.save:
                self._save_ckpt(epoch, fitness)
                self.run_callbacks("on_model_save")

            stop = self.stopper(epoch, fitness)
            if args.time and (time.time() - t_train) > args.time * 3600:
                LOGGER.info("time budget reached, stopping")
                stop = True
            if stop:
                break
        LOGGER.info(f"{epoch - self.start_epoch + 1} epochs in "
                    f"{(time.time() - t_train) / 3600:.3f} h")
        if self.best_variables is None:
            self.best_variables = self._ema_variables()
        # Adopt the final weights on the model object: the jitted step DONATES
        # the state, so the init-time model.variables leaves are deleted
        # buffers by now — any direct consumer (validator, predict, export)
        # must see the trained EMA weights instead (the facade mirrors this,
        # engine/model.py train()).
        self.model.variables = self.best_variables
        # Final artifacts (reference final_eval trainer.py:676-689): halve the
        # kept checkpoints by dropping optimizer state; training curves.
        # (Deliberate divergence from the reference, which strips last.pt
        # too: last.ckpt keeps its optimizer state so --resume always works.)
        if args.save and self.best.exists():
            from yolo_sod_tpu.utils.checkpoint import strip_optimizer

            strip_optimizer(self.best)
        if args.plots and self.csv.exists():
            from yolo_sod_tpu.utils.plotting import plot_results

            plot_results(self.csv)
        self.run_callbacks("on_train_end")
        self.run_callbacks("teardown")
        return self.metrics

    def _warmup(self, ni: int, epoch: int):
        """Linear warmup then schedule (reference trainer.py:367-376)."""
        args = self.args
        if ni < self.warmup_iters:
            xi = [0, self.warmup_iters]
            lr = float(np.interp(ni, xi, [0.0, self.lr0 * self.lf(epoch)]))
            mom = float(np.interp(ni, xi, [args.warmup_momentum, self.momentum]))
        else:
            lr = self.lr0 * self.lf(epoch)
            mom = self.momentum
        self.lr = lr
        set_hyperparams(self.state.opt_state, lr, mom)

    def _ema_variables(self):
        ema = jax.device_get(self.state.ema_params)
        bs = jax.device_get(self.state.batch_stats)
        return {"params": ema, "batch_stats": bs} if bs else {"params": ema}

    def _validate(self):
        self.run_callbacks("on_val_start")
        metrics = self.validator(model=self.model, variables=self._ema_variables(),
                                 data=self.data)
        self.run_callbacks("on_val_end")
        return metrics

    def label_loss_items(self, items=None, prefix: str = "train"):
        keys = [f"{prefix}/{n}" for n in self.loss_names]
        if items is None:
            return keys
        return dict(zip(keys, [float(x) for x in items]))

    def _write_csv(self, epoch: int, fitness):
        """Append one results.csv row, rewriting the whole file under the
        union header. With val_period > 1 the metric columns only exist
        after the first validated epoch — a fixed append-only header written
        at epoch 1 would misalign every later row (and stale metrics must
        not repeat on non-val epochs: their cells stay empty)."""
        fresh = fitness is not None       # this epoch ran validation
        vals = {"epoch": epoch + 1,
                "time": round(time.time() - getattr(self, "_t_train0", time.time()), 2),
                **self.label_loss_items(self.tloss),
                **({k: v for k, v in zip(self.metrics.keys, self.metrics.mean_results())}
                   if (self.metrics and fresh) else {}),
                "fitness": fitness if fresh else "",
                "lr/pg0": self.lr}
        rows = getattr(self, "_csv_rows", None)
        if rows is None:
            rows = self._csv_rows = []
            if self.csv.exists():        # resume: keep the earlier rows
                import csv as _csv

                with open(self.csv) as f:
                    rows.extend(dict(r) for r in _csv.DictReader(f))
        rows.append(vals)
        cols = list(dict.fromkeys(k for r in rows for k in r))
        with open(self.csv, "w") as f:
            f.write(",".join(cols) + "\n")
            for r in rows:
                f.write(",".join(str(r.get(c, "")) for c in cols) + "\n")

    def _save_ckpt(self, epoch: int, fitness):
        variables = {"params": jax.device_get(self.state.params)}
        bs = jax.device_get(self.state.batch_stats)
        if bs:
            variables["batch_stats"] = bs
        common = dict(
            variables=variables,
            ema_variables=self._ema_variables(),
            opt_state=jax.device_get(self.state.opt_state),
            epoch=epoch,
            best_fitness=self.best_fitness,
            train_args={k: v for k, v in vars(self.args).items()
                        if isinstance(v, (int, float, str, bool, type(None)))},
            names=self.model.names,
            model_yaml=self.model.yaml,
            step=int(jax.device_get(self.state.step)),
        )
        save_checkpoint(self.last, **common)
        if fitness is not None and fitness >= self.best_fitness:
            save_checkpoint(self.best, **common)
        if self.args.save_period > 0 and (epoch + 1) % self.args.save_period == 0:
            save_checkpoint(self.wdir / f"epoch{epoch + 1}.ckpt", **common)
