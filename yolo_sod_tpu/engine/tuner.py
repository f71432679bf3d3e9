"""Hyperparameter tuner: genetic mutation over the search space.

TPU-native analog of reference engine/tuner.py:33-242: each iteration mutates
the best-so-far hyperparameters (gaussian noise scaled per-key), trains a
short run in-process (no subprocess respawn — compiled steps are reused
whenever shapes match), and records fitness to tune_results.csv.
"""

from __future__ import annotations

import shutil

import numpy as np

from yolo_sod_tpu.cfg import DEFAULT_CFG_DICT, get_cfg, get_save_dir
from yolo_sod_tpu.utils import LOGGER, colorstr, yaml_save

# key: (mutation gain, min, max) — reference tuner.py:33 search space.
SEARCH_SPACE = {
    "lr0": (1.0, 1e-5, 0.1),
    "lrf": (1.0, 0.01, 1.0),
    "momentum": (0.3, 0.6, 0.98),
    "weight_decay": (1.0, 0.0, 0.001),
    "warmup_epochs": (1.0, 0.0, 5.0),
    "warmup_momentum": (1.0, 0.0, 0.95),
    "box": (1.0, 0.02, 0.2),
    "cls": (1.0, 0.2, 4.0),
    "dfl": (1.0, 0.4, 6.0),
    "hsv_h": (1.0, 0.0, 0.1),
    "hsv_s": (1.0, 0.0, 0.9),
    "hsv_v": (1.0, 0.0, 0.9),
    "degrees": (1.0, 0.0, 45.0),
    "translate": (1.0, 0.0, 0.9),
    "scale": (1.0, 0.0, 0.9),
    "shear": (1.0, 0.0, 10.0),
    "perspective": (1.0, 0.0, 0.001),
    "flipud": (1.0, 0.0, 1.0),
    "fliplr": (1.0, 0.0, 1.0),
    "mosaic": (1.0, 0.0, 1.0),
    "mixup": (1.0, 0.0, 1.0),
    "copy_paste": (1.0, 0.0, 1.0),
}


class Tuner:
    def __init__(self, args=None, _callbacks=None):
        self.args = args if args is not None else get_cfg(DEFAULT_CFG_DICT, {})
        self.space = SEARCH_SPACE
        self.tune_dir = get_save_dir(self.args, name="tune")
        self.results_csv = self.tune_dir / "tune_results.csv"

    def _mutate(self, parent: dict, rng: np.random.Generator,
                mutation: float = 0.8, sigma: float = 0.2) -> dict:
        """Gaussian mutation of ~80% of keys (reference tuner.py:120-160)."""
        hyp = dict(parent)
        while True:
            factors = np.where(rng.random(len(self.space)) < mutation,
                               1.0 + rng.standard_normal(len(self.space)) * sigma,
                               1.0)
            if not np.allclose(factors, 1.0):
                break
        for (k, (gain, lo, hi)), f in zip(self.space.items(), factors):
            v = float(hyp.get(k, (lo + hi) / 2)) * (f ** gain)
            hyp[k] = float(np.clip(round(v, 5), lo, hi))
        return hyp

    def __call__(self, model=None, iterations: int = 10, cleanup: bool = True):
        """Run the evolve loop; returns (best_hyp, best_fitness)."""
        from yolo_sod_tpu.engine.trainer import DetectionTrainer
        from yolo_sod_tpu.nn.tasks import DetectionModel

        self.tune_dir.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(self.args.seed)
        base = {k: getattr(self.args, k) for k in self.space if hasattr(self.args, k)}
        best_fit, best_hyp = -1.0, dict(base)
        history = []

        for i in range(iterations):
            hyp = self._mutate(best_hyp, rng) if i else dict(base)
            LOGGER.info(f"{colorstr('tuner:')} iteration {i + 1}/{iterations}")
            overrides = {**vars(self.args), **hyp,
                         "name": f"iter{i + 1}", "project": str(self.tune_dir),
                         "exist_ok": True, "val": True, "save": False,
                         "mode": "train", "plots": False}
            fresh = DetectionModel(model.model.yaml if model else
                                   self.args.model or "yolov12n.yaml")
            trainer = DetectionTrainer(overrides=overrides, model=fresh)
            fitness = 0.0
            try:
                trainer.train()
                fitness = trainer.metrics.fitness if trainer.metrics else 0.0
            except Exception as e:
                LOGGER.warning(f"tuner iteration {i + 1} failed: {e}")
            history.append((fitness, hyp))
            if fitness > best_fit:
                best_fit, best_hyp = fitness, hyp
                yaml_save(self.tune_dir / "best_hyperparameters.yaml", hyp)
            header = not self.results_csv.exists()
            with open(self.results_csv, "a") as f:
                if header:
                    f.write("fitness," + ",".join(self.space) + "\n")
                f.write(f"{fitness}," + ",".join(str(hyp.get(k, "")) for k in self.space) + "\n")
            if cleanup:
                shutil.rmtree(self.tune_dir / f"iter{i + 1}", ignore_errors=True)

        LOGGER.info(f"{colorstr('tuner:')} best fitness {best_fit:.5f}")
        return best_hyp, best_fit
