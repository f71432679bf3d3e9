"""HCP-400 staged curriculum training (reference train_yolov12_staged.py:81-218).

Four stages mutate learning rate + augmentation strengths at epochs 50/150/350,
and the P2 detection scale stays masked (DetectStable) until `close_p2_until`.
All mutation is host-side state: augmentation keys are read by the dataset at
__getitem__ time and lr feeds the injected optax hyperparams, so NOTHING
retraces except the single recompile when the P2 mask flips.
"""

from __future__ import annotations

from yolo_sod_tpu.utils import LOGGER


def create_hcp_400_config() -> dict:
    """The 4-stage hyperparameter schedule (reference :81-161)."""
    base = dict(lrf=0.01, momentum=0.937, weight_decay=0.0005, flipud=0.0, fliplr=0.5)
    return {
        "stage1": {  # epochs 1-50: module preheating
            **base, "lr0": 0.002, "mosaic": 1.0, "mixup": 0.1, "copy_paste": 0.1,
            "degrees": 10.0, "translate": 0.1, "scale": 0.5, "shear": 2.0,
            "perspective": 0.0001, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
        },
        "stage2": {  # epochs 51-150: collaborative fine-tuning
            **base, "lr0": 0.001, "mosaic": 1.0, "mixup": 0.1, "copy_paste": 0.1,
            "degrees": 10.0, "translate": 0.1, "scale": 0.5, "shear": 2.0,
            "perspective": 0.0001, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
        },
        "stage3": {  # epochs 151-350: deep refinement, reduced aug
            **base, "lr0": 0.0006, "mosaic": 0.8, "mixup": 0.05, "copy_paste": 0.05,
            "degrees": 8.0, "translate": 0.08, "scale": 0.4, "shear": 1.5,
            "perspective": 0.0001, "hsv_h": 0.01, "hsv_s": 0.6, "hsv_v": 0.3,
        },
        "stage4": {  # epochs 351-400: clean-data polishing
            **base, "lr0": 0.0003, "mosaic": 0.0, "mixup": 0.0, "copy_paste": 0.0,
            "degrees": 5.0, "translate": 0.05, "scale": 0.3, "shear": 1.0,
            "perspective": 0.0, "hsv_h": 0.005, "hsv_s": 0.5, "hsv_v": 0.2,
        },
    }

STAGE_BOUNDARIES = {50: "stage2", 150: "stage3", 350: "stage4"}


def create_staged_training_callback(hcp_stages: dict, boundaries: dict = None):
    """on_train_epoch_start handler: switch hyps at stage boundaries
    (reference :164-197). Mutates trainer.args (shared with the dataset's hyp
    view) and trainer.lr0 (feeds the injected optimizer hyperparams)."""
    boundaries = boundaries or STAGE_BOUNDARIES

    def on_train_epoch_start(trainer):
        stage = boundaries.get(trainer.epoch)
        if not stage or stage not in hcp_stages:
            return
        LOGGER.info(f"HCP: switching to {stage}")
        for k, v in hcp_stages[stage].items():
            if hasattr(trainer.args, k):
                setattr(trainer.args, k, v)
        if "lr0" in hcp_stages[stage]:
            trainer.lr0 = hcp_stages[stage]["lr0"]

    return on_train_epoch_start


def create_p2_toggle_callback(close_p2_until: int = 30):
    """on_train_epoch_start handler: keep the P2 scale masked until epoch N
    (reference :199-218). Works on any trainer whose model head is
    DetectStable; triggers exactly ONE retrace when the mask flips."""

    def on_train_epoch_start(trainer):
        if trainer.model.graph.specs[trainer.model.graph.detect_index].name != "DetectStable":
            return
        n_scales = len(trainer.model.graph.detect_strides)
        active = [trainer.epoch >= close_p2_until] + [True] * (n_scales - 1)
        trainer.set_active_mask([float(a) for a in active])
        if trainer.epoch == close_p2_until:
            LOGGER.info(f"P2 detection scale activated at epoch {close_p2_until}")

    return on_train_epoch_start


def create_early_phase_callback(max_epoch: int = 10,
                                loss_threshold: float = 1000.0):
    """on_train_epoch_end handler: if the early-epoch running loss is
    anomalously large, halve the learning rate and decay the cls gain
    toward a 0.2 floor (reference callbacks/early_phase_tweaks.py). lr
    feeds the injected optax hyperparams (no retrace); the cls-gain change
    goes through trainer.set_loss_gains (one retrace per change)."""
    import numpy as np

    def on_train_epoch_end(trainer):
        if trainer.epoch >= max_epoch:
            return
        tloss = getattr(trainer, "tloss", None)
        if tloss is None:
            return
        est = float(np.mean(np.atleast_1d(np.asarray(tloss, dtype=float))))
        if est > loss_threshold:
            trainer.lr0 *= 0.5
            new_cls = max(0.2, float(trainer.args.cls) * 0.8)
            LOGGER.info(f"early-phase guard: loss {est:.1f} > "
                        f"{loss_threshold:.0f}; lr0 -> {trainer.lr0:.2e}, "
                        f"cls gain -> {new_cls:.3f}")
            trainer.set_loss_gains(cls=new_cls)

    return on_train_epoch_end


def train_staged(cfg: str = "yolov12-sod-fusion-v5.yaml",
                 data: str = "visdrone.yaml", epochs: int = 400,
                 batch: int = 16, imgsz: int = 640, close_p2_until: int = 30,
                 **overrides):
    """Run the full staged protocol (reference main(), :225-340)."""
    from yolo_sod_tpu import YOLO

    model = YOLO(cfg)
    stages = create_hcp_400_config()
    args = dict(data=data, epochs=epochs, batch=batch, imgsz=imgsz,
                lr0=stages["stage1"]["lr0"], optimizer="SGD", **overrides)

    from yolo_sod_tpu.engine.trainer import DetectionTrainer

    trainer = DetectionTrainer(overrides={**model.overrides, **args, "mode": "train"},
                               model=model.model)
    trainer.add_callback("on_train_epoch_start", create_staged_training_callback(stages))
    trainer.add_callback("on_train_epoch_start", create_p2_toggle_callback(close_p2_until))
    trainer.train()
    model.model.variables = trainer.best_variables or model.model.variables
    return trainer.metrics
