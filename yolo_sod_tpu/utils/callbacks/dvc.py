"""DVCLive logger integration (reference utils/callbacks/dvc.py).

Import-guarded. Steps the DVCLive run once per fit epoch with train loss
items, val metrics, and lr; logs plot artifacts and the best checkpoint
at train end.
"""

from __future__ import annotations

try:
    import dvclive

    assert hasattr(dvclive, "__version__")
except (ImportError, AssertionError):
    dvclive = None

LIVE = None


def on_pretrain_routine_start(trainer) -> None:
    global LIVE
    if dvclive is None:
        return
    try:
        LIVE = dvclive.Live(save_dvc_exp=True, cache_images=True)
    except Exception:
        LIVE = None


def on_fit_epoch_end(trainer) -> None:
    if LIVE is None:
        return
    metrics = dict(trainer.label_loss_items(trainer.tloss, prefix="train"))
    metrics["lr/pg0"] = float(trainer.lr)
    if trainer.metrics is not None:
        m = trainer.metrics
        metrics.update(zip(m.keys, map(float, m.mean_results())))
    for k, v in metrics.items():
        LIVE.log_metric(k, float(v))
    LIVE.next_step()


def on_train_end(trainer) -> None:
    if LIVE is None:
        return
    for name in ("results.png", "confusion_matrix.png"):
        f = trainer.save_dir / name
        if f.exists():
            LIVE.log_image(name, str(f))
    if trainer.best.exists():
        LIVE.log_artifact(str(trainer.best), type="model", copy=True)
    LIVE.end()


callbacks = {
    "on_pretrain_routine_start": on_pretrain_routine_start,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
} if dvclive else {}
