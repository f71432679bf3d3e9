"""ClearML logger integration (reference utils/callbacks/clearml.py).

Import-guarded: a missing `clearml` package yields an empty `callbacks`
dict so attaching is a no-op. Logs scalars per epoch, the config at start,
result plots as debug samples, and the best checkpoint at train end.
"""

from __future__ import annotations

try:
    import clearml
    from clearml import Task

    assert hasattr(clearml, "__version__")
except (ImportError, AssertionError):
    clearml = None


def _task():
    return Task.current_task() if clearml else None


def on_pretrain_routine_start(trainer) -> None:
    if clearml is None:
        return
    try:
        task = _task() or Task.init(
            project_name=str(getattr(trainer.args, "project", None) or "yolo-sod-tpu"),
            task_name=str(getattr(trainer.args, "name", None) or "train"),
            output_uri=True,
            auto_connect_frameworks={"pytorch": False, "matplotlib": False},
        )
        task.connect(
            {k: v for k, v in vars(trainer.args).items()
             if isinstance(v, (int, float, str, bool, type(None)))},
            name="General",
        )
    except Exception:
        pass


def on_train_epoch_end(trainer) -> None:
    task = _task()
    if task is None:
        return
    it = trainer.epoch + 1
    for k, v in trainer.label_loss_items(trainer.tloss, prefix="train").items():
        task.get_logger().report_scalar("train", k, float(v), iteration=it)
    task.get_logger().report_scalar("lr", "pg0", float(trainer.lr), iteration=it)


def on_fit_epoch_end(trainer) -> None:
    task = _task()
    if task is None or trainer.metrics is None:
        return
    it = trainer.epoch + 1
    m = trainer.metrics
    for k, v in zip(m.keys, m.mean_results()):
        task.get_logger().report_scalar("val", k, float(v), iteration=it)


def on_train_end(trainer) -> None:
    task = _task()
    if task is None:
        return
    for name in ("results.png", "confusion_matrix.png"):
        f = trainer.save_dir / name
        if f.exists():
            task.get_logger().report_image("plots", name, local_path=str(f))
    if trainer.best.exists():
        task.update_output_model(model_path=str(trainer.best),
                                 model_name=str(getattr(trainer.args, "name", "best")),
                                 auto_delete_file=False)


callbacks = {
    "on_pretrain_routine_start": on_pretrain_routine_start,
    "on_train_epoch_end": on_train_epoch_end,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
} if clearml else {}
