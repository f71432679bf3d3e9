"""MLflow logger integration (reference utils/callbacks/mlflow.py).

Import-guarded: attaches only when `mlflow` is importable. Tracking URI from
MLFLOW_TRACKING_URI (defaults to a local ./mlruns store, the mlflow default);
experiment/run names from MLFLOW_EXPERIMENT_NAME / MLFLOW_RUN or the
trainer's project/name.
"""

from __future__ import annotations

import os

try:
    import mlflow

    assert hasattr(mlflow, "__version__")
except (ImportError, AssertionError):
    mlflow = None


def _sanitize(d: dict) -> dict:
    return {k.replace("(", "").replace(")", ""): float(v)
            for k, v in d.items() if isinstance(v, (int, float))}


def on_pretrain_routine_end(trainer) -> None:
    if mlflow is None:
        return
    try:
        uri = os.environ.get("MLFLOW_TRACKING_URI")
        if uri:
            mlflow.set_tracking_uri(uri)
        exp = os.environ.get("MLFLOW_EXPERIMENT_NAME") \
            or str(getattr(trainer.args, "project", None) or "yolo-sod-tpu")
        mlflow.set_experiment(exp)
        mlflow.start_run(run_name=os.environ.get("MLFLOW_RUN")
                         or str(getattr(trainer.args, "name", None) or "train"))
        mlflow.log_params({k: v for k, v in vars(trainer.args).items()
                           if isinstance(v, (int, float, str, bool))})
    except Exception:
        pass


def on_fit_epoch_end(trainer) -> None:
    if mlflow is None or mlflow.active_run() is None:
        return
    metrics = _sanitize(trainer.label_loss_items(trainer.tloss, prefix="train"))
    if trainer.metrics is not None:
        m = trainer.metrics
        metrics.update(_sanitize(dict(zip(m.keys, m.mean_results()))))
    mlflow.log_metrics(metrics, step=trainer.epoch + 1)


def on_train_end(trainer) -> None:
    if mlflow is None or mlflow.active_run() is None:
        return
    try:
        if trainer.best.exists():
            mlflow.log_artifact(str(trainer.best))
        if trainer.csv.exists():
            mlflow.log_artifact(str(trainer.csv))
    finally:
        mlflow.end_run()


callbacks = {
    "on_pretrain_routine_end": on_pretrain_routine_end,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
} if mlflow else {}
