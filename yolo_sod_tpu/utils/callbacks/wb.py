"""Weights & Biases logger integration (reference utils/callbacks/wb.py).

Import-guarded: attaches only when `wandb` is importable AND logged in
(same contract as the reference's SETTINGS["wandb"] gate). Logs the train
loss items, val metrics, and final artifacts.
"""

from __future__ import annotations

try:
    import wandb

    assert hasattr(wandb, "__version__")
except (ImportError, AssertionError):
    wandb = None

RUN = None


def on_pretrain_routine_start(trainer) -> None:
    global RUN
    if wandb is None:
        return
    try:
        RUN = wandb.run or wandb.init(
            project=str(getattr(trainer.args, "project", None) or "yolo-sod-tpu"),
            name=str(getattr(trainer.args, "name", None) or "train"),
            config={k: v for k, v in vars(trainer.args).items()
                    if isinstance(v, (int, float, str, bool, type(None)))})
    except Exception:
        RUN = None


def on_train_epoch_end(trainer) -> None:
    if RUN:
        RUN.log(trainer.label_loss_items(trainer.tloss, prefix="train"),
                step=trainer.epoch + 1)
        RUN.log({"lr/pg0": trainer.lr}, step=trainer.epoch + 1)


def on_fit_epoch_end(trainer) -> None:
    if RUN and trainer.metrics is not None:
        m = trainer.metrics
        RUN.log(dict(zip(m.keys, m.mean_results())), step=trainer.epoch + 1)


def on_train_end(trainer) -> None:
    if RUN:
        if trainer.best.exists():
            art = wandb.Artifact(type="model", name=f"run_{RUN.id}_model")
            art.add_file(str(trainer.best))
            RUN.log_artifact(art, aliases=["best"])
        RUN.finish()


callbacks = {
    "on_pretrain_routine_start": on_pretrain_routine_start,
    "on_train_epoch_end": on_train_epoch_end,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
} if wandb else {}
