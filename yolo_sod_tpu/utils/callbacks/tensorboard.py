"""TensorBoard logger integration (reference utils/callbacks/tensorboard.py)."""

from __future__ import annotations

WRITER = None


def _log_scalars(scalars: dict, step: int = 0) -> None:
    if WRITER:
        for k, v in scalars.items():
            WRITER.add_scalar(k, float(v), step)


def on_pretrain_routine_start(trainer) -> None:
    global WRITER
    try:
        from torch.utils.tensorboard import SummaryWriter

        WRITER = SummaryWriter(str(trainer.save_dir))
    except Exception:
        WRITER = None


def on_train_epoch_end(trainer) -> None:
    _log_scalars(trainer.label_loss_items(trainer.tloss, prefix="train"), trainer.epoch + 1)


def on_fit_epoch_end(trainer) -> None:
    m = trainer.metrics
    scalars = m.results_dict if hasattr(m, "results_dict") else (m or {})
    _log_scalars(scalars, trainer.epoch + 1)


callbacks = {
    "on_pretrain_routine_start": on_pretrain_routine_start,
    "on_train_epoch_end": on_train_epoch_end,
    "on_fit_epoch_end": on_fit_epoch_end,
}
