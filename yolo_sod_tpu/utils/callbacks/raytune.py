"""Ray Tune integration (reference utils/callbacks/raytune.py).

Import-guarded. Reports val metrics to the enclosing Ray Tune session at
each fit-epoch end so population-based schedulers can act on them.
"""

from __future__ import annotations

try:
    import ray
    from ray import tune

    assert hasattr(ray, "__version__")
except (ImportError, AssertionError):
    tune = None


def on_fit_epoch_end(trainer) -> None:
    try:
        in_session = ray.train._internal.session.get_session()
    except Exception:
        in_session = False
    if not in_session or trainer.metrics is None:
        return
    m = trainer.metrics
    metrics = dict(zip(m.keys, map(float, m.mean_results())))
    metrics["epoch"] = trainer.epoch + 1
    tune.report(metrics)


callbacks = {
    "on_fit_epoch_end": on_fit_epoch_end,
} if tune else {}
