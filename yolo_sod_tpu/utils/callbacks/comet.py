"""Comet ML logger integration (reference utils/callbacks/comet.py).

Import-guarded. Logs config + per-epoch train/val scalars, curves/plots
when present, and uploads the best checkpoint as a model asset. The
reference module additionally re-renders prediction debug images; that
visual-debug path is host-side matplotlib work already covered by our
plotting utils, so here we log the produced artifacts instead.
"""

from __future__ import annotations

try:
    import comet_ml

    assert hasattr(comet_ml, "__version__")
except (ImportError, AssertionError):
    comet_ml = None

EXPERIMENT = None


def on_pretrain_routine_start(trainer) -> None:
    global EXPERIMENT
    if comet_ml is None:
        return
    try:
        EXPERIMENT = comet_ml.Experiment(
            project_name=str(getattr(trainer.args, "project", None) or "yolo-sod-tpu"))
        EXPERIMENT.set_name(str(getattr(trainer.args, "name", None) or "train"))
        EXPERIMENT.log_parameters(
            {k: v for k, v in vars(trainer.args).items()
             if isinstance(v, (int, float, str, bool, type(None)))})
        EXPERIMENT.log_other("Created from", "yolo-sod-tpu")
    except Exception:
        EXPERIMENT = None


def on_train_epoch_end(trainer) -> None:
    if EXPERIMENT is None:
        return
    step = trainer.epoch + 1
    EXPERIMENT.log_metrics(trainer.label_loss_items(trainer.tloss, prefix="train"),
                           step=step, epoch=step)
    EXPERIMENT.log_metric("lr/pg0", float(trainer.lr), step=step, epoch=step)


def on_fit_epoch_end(trainer) -> None:
    if EXPERIMENT is None or trainer.metrics is None:
        return
    step = trainer.epoch + 1
    m = trainer.metrics
    EXPERIMENT.log_metrics(dict(zip(m.keys, map(float, m.mean_results()))),
                           step=step, epoch=step)


def on_train_end(trainer) -> None:
    if EXPERIMENT is None:
        return
    for name in ("results.png", "confusion_matrix.png"):
        f = trainer.save_dir / name
        if f.exists():
            EXPERIMENT.log_image(str(f), name=name)
    if trainer.best.exists():
        EXPERIMENT.log_model("best", str(trainer.best))
    EXPERIMENT.end()


callbacks = {
    "on_pretrain_routine_start": on_pretrain_routine_start,
    "on_train_epoch_end": on_train_epoch_end,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
} if comet_ml else {}
