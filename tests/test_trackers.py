"""Tracker tests: KF consistency, ByteTrack id persistence, facade .track()."""

from types import SimpleNamespace

import numpy as np


def _cfg(**kw):
    base = dict(tracker_type="bytetrack", track_high_thresh=0.25,
                track_low_thresh=0.1, new_track_thresh=0.25, track_buffer=30,
                match_thresh=0.8, fuse_score=True)
    base.update(kw)
    return SimpleNamespace(**base)


def test_kalman_predict_update_cycle():
    from yolo_sod_tpu.trackers.utils.kalman_filter import KalmanFilterXYAH

    kf = KalmanFilterXYAH()
    m, c = kf.initiate(np.array([10.0, 20.0, 0.5, 40.0]))
    m, c = kf.predict(m, c)
    m2, c2 = kf.update(m, c, np.array([12.0, 22.0, 0.5, 40.0]))
    assert m2.shape == (8,) and c2.shape == (8, 8)
    assert np.all(np.isfinite(m2)) and np.all(np.linalg.eigvals(c2) > -1e-6)


def test_bytetracker_persistent_ids():
    from yolo_sod_tpu.trackers.byte_tracker import BYTETracker

    tracker = BYTETracker(_cfg(), frame_rate=30)
    ids_seen = []
    for frame in range(5):
        # two objects moving right at 2px/frame
        xywh = np.array([[50 + 2 * frame, 50, 20, 20],
                         [150 + 2 * frame, 80, 30, 30]], np.float32)
        res = SimpleNamespace(conf=np.array([0.9, 0.8]), xywh=xywh,
                              cls=np.array([0.0, 1.0]))
        tracks = tracker.update(res)
        if frame > 0:
            assert tracks.shape[1] == 8
            ids_seen.append(set(tracks[:, 4].astype(int)))
    # same two ids across frames
    assert all(s == ids_seen[0] for s in ids_seen)
    assert len(ids_seen[0]) == 2


def test_bytetracker_low_conf_rescue():
    from yolo_sod_tpu.trackers.byte_tracker import BYTETracker

    tracker = BYTETracker(_cfg(), frame_rate=30)
    res = SimpleNamespace(conf=np.array([0.9]), xywh=np.array([[50.0, 50, 20, 20]]),
                          cls=np.array([0.0]))
    t1 = tracker.update(res)
    # object drops to low confidence -> stage-2 keeps the track alive
    res2 = SimpleNamespace(conf=np.array([0.15]), xywh=np.array([[52.0, 50, 20, 20]]),
                           cls=np.array([0.0]))
    t2 = tracker.update(res2)
    assert len(t2) == 1 and t2[0, 4] == t1[0, 4]


def test_botsort_constructs():
    from yolo_sod_tpu.trackers.bot_sort import BOTSORT

    cfg = _cfg(tracker_type="botsort", gmc_method="sparseOptFlow",
               proximity_thresh=0.5, appearance_thresh=0.25, with_reid=False)
    tracker = BOTSORT(cfg)
    res = SimpleNamespace(conf=np.array([0.9]), xywh=np.array([[50.0, 50, 20, 20]]),
                          cls=np.array([0.0]))
    tracks = tracker.update(res)
    assert tracker.frame_id == 1


def test_model_track_api():
    from yolo_sod_tpu import YOLO

    m = YOLO("yolov12n.yaml")
    m.model.init(imgsz=64)
    img = (np.random.rand(64, 64, 3) * 255).astype(np.uint8)
    results = m.track(img, imgsz=64, conf=0.001, verbose=False)
    assert len(results) == 1
    # Boxes may be empty (untrained model) but the attribute chain must work.
    _ = results[0].boxes.id
