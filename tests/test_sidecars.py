"""Sidecar completeness: real GMC methods, the full solutions menu,
import-guarded logger integrations, ATSS targets (VERDICT Missing #7-10)."""

import numpy as np
import pytest


# -- GMC -----------------------------------------------------------------------
def _shifted_frames(dx: int = 6, dy: int = 3, size: int = 200):
    """Two structured frames related by a pure translation: smooth gradient
    background + blobs (corner features for orb/sift/flow, intensity
    gradients for ECC)."""
    import cv2

    rng = np.random.default_rng(0)
    S = size + 40
    gy, gx = np.mgrid[0:S, 0:S]
    big = ((gx + gy) * 255 / (2 * S)).astype(np.uint8)
    big = cv2.cvtColor(big, cv2.COLOR_GRAY2BGR)
    for _ in range(25):
        c = (int(rng.integers(20, S - 20)), int(rng.integers(20, S - 20)))
        color = tuple(int(v) for v in rng.integers(0, 255, 3))
        if rng.random() < 0.5:
            cv2.circle(big, c, int(rng.integers(5, 15)), color, -1)
        else:
            cv2.rectangle(big, c, (c[0] + int(rng.integers(10, 30)),
                                   c[1] + int(rng.integers(10, 30))), color, -1)
    big = cv2.GaussianBlur(big, (3, 3), 0.8)
    f1 = big[20:20 + size, 20:20 + size].copy()
    f2 = big[20 - dy:20 - dy + size, 20 - dx:20 - dx + size].copy()
    return f1, f2


@pytest.mark.parametrize("method", ["sparseOptFlow", "orb", "sift", "ecc"])
def test_gmc_recovers_translation(method):
    from yolo_sod_tpu.trackers.utils.gmc import GMC

    dx, dy = 6, 3
    f1, f2 = _shifted_frames(dx, dy)
    gmc = GMC(method=method, downscale=1)
    gmc.apply(f1)
    H = gmc.apply(f2)
    assert H.shape == (2, 3)
    # translation recovered within 1.5 px (each method has its own estimator)
    assert abs(H[0, 2] - dx) < 1.5, f"{method}: tx={H[0, 2]} want {dx}"
    assert abs(H[1, 2] - dy) < 1.5, f"{method}: ty={H[1, 2]} want {dy}"


def test_gmc_rejects_unknown_method():
    from yolo_sod_tpu.trackers.utils.gmc import GMC

    with pytest.raises(ValueError):
        GMC(method="homography")


# -- solutions ------------------------------------------------------------------
class _FakeYOLO:
    """Deterministic stand-in model: one box marching right, id 1."""

    def __init__(self):
        self.x = 10

    def track(self, im0, **kwargs):
        from yolo_sod_tpu.engine.results import Results

        self.x += 15
        box = np.array([[self.x, 100, self.x + 40, 160, 0.9, 0.0, 1.0]])
        return [Results(im0, "frame", {0: "obj"}, boxes=box)]


def test_parking_management():
    from yolo_sod_tpu.solutions import ParkingManagement

    pm = ParkingManagement(model=_FakeYOLO(),
                           slots=[[(0, 80), (120, 80), (120, 200), (0, 200)],
                                  [(400, 80), (520, 80), (520, 200), (400, 200)]])
    img = np.zeros((300, 600, 3), np.uint8)
    pm.process_data(img)     # box center x=45 -> slot 1 occupied
    assert pm.pr_info == {"Occupancy": 1, "Available": 1}


def test_parking_zone_editor_roundtrip(tmp_path):
    """Headless annotator core: clicks -> zones -> rescaled JSON that
    ParkingManagement can consume (reference parking_management.py:14)."""
    from yolo_sod_tpu.solutions import ParkingManagement, ParkingZoneEditor

    ed = ParkingZoneEditor(max_display=(640, 360))
    w, h = ed.set_image_size(1280, 720)          # 2x downscale to display
    assert (w, h) == (640, 360)
    for pt in [(0, 40), (60, 40), (60, 100), (0, 100)]:
        zone = ed.click(*pt)
    assert zone is not None and len(ed.zones) == 1
    ed.click(5, 5)                               # pending point...
    assert ed.undo() and len(ed.zones) == 1      # ...undo clears pending
    assert ed.to_json() == [{"points": [[0, 80], [120, 80], [120, 200],
                                        [0, 200]]}]  # image-space (2x)
    path = ed.save(str(tmp_path / "zones.json"))

    pm = ParkingManagement(model=_FakeYOLO(), json_file=path)
    pm.process_data(np.zeros((300, 600, 3), np.uint8))
    assert pm.pr_info == {"Occupancy": 1, "Available": 0}
    assert ed.undo() and not ed.zones and not ed.undo()


def test_trackzone():
    from yolo_sod_tpu.solutions import TrackZone

    tz = TrackZone(model=_FakeYOLO(), region=[(0, 0), (200, 0), (200, 300), (0, 300)])
    img = np.zeros((300, 600, 3), np.uint8)
    tz.trackzone(img)
    assert tz.n_tracked == 1


def test_security_alarm():
    from yolo_sod_tpu.solutions import SecurityAlarm

    sa = SecurityAlarm(model=_FakeYOLO(), records=1)
    img = np.zeros((300, 600, 3), np.uint8)
    sa.monitor(img)
    assert sa.alerts == 1 and sa.email_sent
    sa.monitor(img)          # still >= threshold, no re-alert
    assert sa.alerts == 1


def test_analytics_counts_and_chart():
    from yolo_sod_tpu.solutions import Analytics

    an = Analytics(model=_FakeYOLO(), analytics_type="line")
    img = np.zeros((200, 300, 3), np.uint8)
    chart = an.process_data(img)
    assert an.history == [{0: 1}]
    if chart is not None:    # matplotlib present
        assert chart.ndim == 3 and chart.shape[2] == 3


def test_streamlit_inference_guarded():
    from yolo_sod_tpu.solutions import streamlit_inference

    try:
        import streamlit  # noqa: F401
        pytest.skip("streamlit present; guard path not reachable")
    except ImportError:
        with pytest.raises(ImportError, match="streamlit"):
            streamlit_inference()


# -- logger integrations ----------------------------------------------------------
def test_integration_callbacks_import_guarded():
    """wandb/mlflow modules expose empty callbacks when absent; attaching is
    always safe (reference utils/callbacks contract)."""
    from yolo_sod_tpu.utils.callbacks import get_default_callbacks
    from yolo_sod_tpu.utils.callbacks.base import add_integration_callbacks

    class T:
        callbacks = get_default_callbacks()

    add_integration_callbacks(T())   # must not raise regardless of installs
    import importlib
    for name in ("tensorboard", "wb", "mlflow", "clearml", "comet", "dvc",
                 "neptune", "raytune"):
        mod = importlib.import_module(f"yolo_sod_tpu.utils.callbacks.{name}")
        assert isinstance(mod.callbacks, dict), name
        for fn in mod.callbacks.values():
            assert callable(fn), name


def test_neptune_callbacks_log_with_fake_package(monkeypatch):
    """Inject a fake `neptune` package and drive the handlers end-to-end:
    series appended per epoch, artifacts uploaded, run stopped."""
    import importlib
    import sys
    import types
    from pathlib import Path

    appended, uploaded, stopped = {}, [], []

    class _Series:
        def __init__(self, key):
            self.key = key

        def append(self, value=None, step=None):
            appended.setdefault(self.key, []).append((value, step))

        def upload(self, path):
            uploaded.append((self.key, path))

    class _Run(dict):
        def __getitem__(self, key):
            return _Series(key)

        def __setitem__(self, key, value):
            dict.__setitem__(self, key, value)

        def stop(self):
            stopped.append(True)

    fake = types.ModuleType("neptune")
    fake.__version__ = "0.0-fake"
    fake.init_run = lambda **kw: _Run()
    monkeypatch.setitem(sys.modules, "neptune", fake)

    from yolo_sod_tpu.utils.callbacks import neptune as nep
    nep = importlib.reload(nep)
    assert set(nep.callbacks) == {"on_pretrain_routine_start",
                                  "on_train_epoch_end", "on_fit_epoch_end",
                                  "on_train_end"}

    class _Args:
        name = "t"

    class _Best:
        name = "best.ckpt"

        def exists(self):
            return False

    class _Trainer:
        args = _Args()
        epoch = 0
        lr = 0.01
        tloss = None
        metrics = None
        save_dir = Path("/nonexistent")
        best = _Best()

        def label_loss_items(self, x, prefix="train"):
            return {f"{prefix}/box_loss": 1.5}

    t = _Trainer()
    nep.callbacks["on_pretrain_routine_start"](t)
    nep.callbacks["on_train_epoch_end"](t)
    nep.callbacks["on_train_end"](t)
    assert appended["train/box_loss"] == [(1.5, 1)]
    assert appended["lr/pg0"] == [(0.01, 1)]
    assert stopped == [True]
    importlib.reload(nep)   # restore real (absent-package) state


# -- ATSS -------------------------------------------------------------------------
def test_compute_atss_targets():
    import jax.numpy as jnp

    from yolo_sod_tpu.utils.losses import compute_atss_targets

    # anchors on a line; one GT sits on anchor 3
    pred = jnp.stack([jnp.arange(10, dtype=jnp.float32) * 10 + 5,
                      jnp.full(10, 5.0), jnp.full(10, 10.0),
                      jnp.full(10, 10.0)], -1)               # xywh
    gt = jnp.array([[35.0, 5.0, 10.0, 10.0], [0, 0, 0, 0]])
    out = compute_atss_targets(pred, gt, jnp.array([2, 0]),
                               jnp.array([1.0, 0.0]), num_classes=5)
    w = np.asarray(out["weights"])
    assert w[3] == 1.0                        # exact-overlap anchor positive
    assert w.sum() >= 1
    assert int(out["labels"][3]) == 2
    np.testing.assert_allclose(np.asarray(out["bbox_targets"][3]),
                               [35, 5, 10, 10])
    # padded GT row contributes nothing
    assert np.asarray(out["bbox_targets"])[w == 0].sum() == 0
