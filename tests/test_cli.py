"""CLI entrypoint tests (reference test_cli.py doctrine, in-process)."""

from pathlib import Path

import numpy as np
import pytest


def test_entrypoint_help_and_version(capsys):
    from yolo_sod_tpu.cfg import entrypoint

    entrypoint("yolo-sod")            # usage
    entrypoint("yolo-sod version")    # version


def test_entrypoint_rejects_bad_args():
    from yolo_sod_tpu.cfg import entrypoint

    with pytest.raises(SyntaxError):
        entrypoint("yolo-sod notathing")
    with pytest.raises(ValueError):
        entrypoint("yolo-sod mode=fly")


def test_entrypoint_predict(tmp_path):
    import cv2

    from yolo_sod_tpu.cfg import entrypoint

    img = (np.random.rand(64, 64, 3) * 255).astype(np.uint8)
    src = tmp_path / "img.jpg"
    cv2.imwrite(str(src), img)
    results = entrypoint(f"yolo-sod detect predict model=yolov12n.yaml "
                         f"source={src} imgsz=64 conf=0.01 verbose=False")
    assert len(results) == 1


def test_task2model_yamls_exist():
    """Every advertised task resolves to a real model YAML and a real
    task_map route (VERDICT Weak #4 / Next #10; reference test_cli.py:32-53)."""
    from pathlib import Path

    from yolo_sod_tpu.cfg import TASK2MODEL, TASKS
    from yolo_sod_tpu.engine.model import Model
    from yolo_sod_tpu.nn.tasks import yaml_model_load

    m = Model.__new__(Model)
    m._task_forced = None
    routes = m.task_map
    for task in TASKS:
        assert task in TASK2MODEL, f"no model for advertised task {task}"
        yaml_model_load(TASK2MODEL[task])  # raises if the file doesn't exist
        assert task in routes, f"no task_map route for {task}"
        for role in ("model", "trainer", "validator", "predictor"):
            assert routes[task][role] is not None


@pytest.mark.parametrize("task,model", [
    ("segment", "yolov12n-seg.yaml"),
    ("pose", "yolov12n-pose.yaml"),
    ("obb", "yolov12n-obb.yaml"),
])
def test_entrypoint_task_predict(task, model, tmp_path):
    """`yolo-sod <task> predict` runs for every non-classify task."""
    import cv2

    from yolo_sod_tpu.cfg import entrypoint

    img = (np.random.rand(64, 64, 3) * 255).astype(np.uint8)
    src = tmp_path / "img.jpg"
    cv2.imwrite(str(src), img)
    results = entrypoint(f"yolo-sod {task} predict model={model} "
                         f"source={src} imgsz=64 conf=0.001 verbose=False")
    assert len(results) == 1


def test_entrypoint_special_modes(tmp_path, monkeypatch):
    """`yolo-sod checks|settings|cfg|copy-cfg` special commands (reference
    cfg/__init__.py:131-137, handle_yolo_settings :579)."""
    from yolo_sod_tpu.cfg import entrypoint
    from yolo_sod_tpu.utils import SETTINGS

    entrypoint("yolo-sod checks")
    entrypoint("yolo-sod cfg")
    entrypoint("yolo-sod settings")
    old = SETTINGS["tensorboard"]
    try:
        entrypoint("yolo-sod settings tensorboard=False")
        assert SETTINGS["tensorboard"] is False
        with pytest.raises(KeyError):
            entrypoint("yolo-sod settings not_a_key=1")
    finally:
        SETTINGS["tensorboard"] = old
    monkeypatch.chdir(tmp_path)
    entrypoint("yolo-sod copy-cfg")
    assert (tmp_path / "default_copy.yaml").exists()


def test_facade_add_callback_forwards():
    """Model.add_callback registers per-event user callbacks and the facade
    forwards them into every trainer/predictor it creates (reference
    Model.add_callback engine/model.py:831, used by root train_all.py's
    cb_p2_gate)."""
    from yolo_sod_tpu import YOLO
    from yolo_sod_tpu.engine.trainer import DetectionTrainer

    m = YOLO("E1.yaml")
    hits = []
    m.add_callback("on_train_epoch_start", lambda tr: hits.append(tr.epoch))

    tr = DetectionTrainer(overrides={"mode": "train"}, model=m.model)
    m._forward_callbacks(tr)
    tr.epoch = 7
    tr.run_callbacks("on_train_epoch_start")
    assert hits == [7]

    m.clear_callback("on_train_epoch_start")
    assert m.callbacks["on_train_epoch_start"] == []
    m.add_callback("teardown", lambda tr: None)
    m.reset_callbacks()
    assert m.callbacks == {}


def test_train_all_experiment_table():
    """The E1-E6 ablation sweep (root train_all.py analog) names only bundled
    configs, in the reference's ablation order."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    try:
        import train_all
    finally:
        sys.path.pop(0)

    from yolo_sod_tpu.nn.tasks import yaml_model_load

    names = [y for _, y in train_all.EXPERIMENTS]
    assert names == [f"E{i}.yaml" for i in range(1, 7)]
    for _, yaml_name in train_all.EXPERIMENTS:
        yaml_model_load(yaml_name)  # raises if the bundled file is missing


def test_cli_subprocess_smoke(tmp_path):
    """The CLI works as an actual OS-level process (`python -m yolo_sod_tpu`),
    the reference test_cli.py doctrine — everything else here drives
    entrypoint() in-process."""
    import os
    import subprocess
    import sys

    import cv2

    img = tmp_path / "im.jpg"
    cv2.imwrite(str(img), np.zeros((48, 64, 3), np.uint8))
    repo = Path(__file__).resolve().parents[1]
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           # Share the repo's persistent XLA compile cache so a re-run on a
           # loaded single-core host skips the E1 compile entirely.
           "JAX_COMPILATION_CACHE_DIR": str(repo / ".jax_cache"),
           "YOLO_SOD_NO_NATIVE": os.environ.get("YOLO_SOD_NO_NATIVE", "")}
    r = subprocess.run(
        [sys.executable, "-m", "yolo_sod_tpu", "detect", "predict",
         "model=E1.yaml", f"source={img}", "imgsz=64", "conf=0.25",
         f"project={tmp_path / 'runs'}"],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=str(repo))
    assert r.returncode == 0, r.stderr[-2000:]
