"""Neptune.ai logger integration (reference utils/callbacks/neptune.py).

Import-guarded. Mirrors the reference behavior: scalar series per epoch,
config at start, plots + best weights at train end.
"""

from __future__ import annotations

try:
    import neptune

    assert hasattr(neptune, "__version__")
except (ImportError, AssertionError):
    neptune = None

RUN = None


def _log_scalars(scalars: dict, step: int) -> None:
    if RUN:
        for k, v in scalars.items():
            RUN[k].append(value=float(v), step=step)


def on_pretrain_routine_start(trainer) -> None:
    global RUN
    if neptune is None:
        return
    try:
        RUN = neptune.init_run(
            name=str(getattr(trainer.args, "name", None) or "train"),
            tags=["yolo-sod-tpu"])
        RUN["Configuration/Hyperparameters"] = {
            k: str(v) for k, v in vars(trainer.args).items()}
    except Exception:
        RUN = None


def on_train_epoch_end(trainer) -> None:
    _log_scalars(trainer.label_loss_items(trainer.tloss, prefix="train"),
                 trainer.epoch + 1)
    _log_scalars({"lr/pg0": trainer.lr}, trainer.epoch + 1)


def on_fit_epoch_end(trainer) -> None:
    if trainer.metrics is not None:
        m = trainer.metrics
        _log_scalars(dict(zip(m.keys, m.mean_results())), trainer.epoch + 1)


def on_train_end(trainer) -> None:
    if RUN is None:
        return
    for name in ("results.png", "confusion_matrix.png"):
        f = trainer.save_dir / name
        if f.exists():
            RUN[f"Plots/{name}"].upload(str(f))
    if trainer.best.exists():
        RUN[f"Weights/{trainer.best.name}"].upload(str(trainer.best))
    RUN.stop()


callbacks = {
    "on_pretrain_routine_start": on_pretrain_routine_start,
    "on_train_epoch_end": on_train_epoch_end,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
} if neptune else {}
