"""Unit tests for box algebra, decode, NMS, letterbox."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_sod_tpu.ops import (
    bbox_iou,
    box_iou,
    dist2bbox,
    letterbox,
    make_anchors,
    non_max_suppression,
    scale_boxes,
    xywh2xyxy,
    xyxy2xywh,
)


def test_xywh_roundtrip():
    b = jnp.array([[10.0, 20.0, 8.0, 6.0], [5.0, 5.0, 2.0, 2.0]])
    assert np.allclose(xyxy2xywh(xywh2xyxy(b)), b, atol=1e-5)


def test_box_iou_known_values():
    a = jnp.array([[0.0, 0, 10, 10]])
    b = jnp.array([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = np.asarray(box_iou(a, b))[0]
    assert iou[0] == pytest.approx(1.0, abs=1e-5)
    assert iou[1] == pytest.approx(25 / 175, abs=1e-4)
    assert iou[2] == pytest.approx(0.0, abs=1e-6)


def test_bbox_iou_ciou_le_iou():
    a = jnp.array([[5.0, 5.0, 4.0, 4.0]])
    b = jnp.array([[6.0, 6.0, 4.0, 4.0]])
    plain = float(np.asarray(bbox_iou(a, b, xywh=True)).squeeze())
    ciou = float(np.asarray(bbox_iou(a, b, xywh=True, CIoU=True)).squeeze())
    assert ciou <= plain


def test_make_anchors_counts_and_offsets():
    pts, strides = make_anchors([(4, 4), (2, 2)], [8, 16])
    assert pts.shape == (20, 2)
    assert strides.shape == (20, 1)
    assert float(pts[0, 0]) == 0.5
    assert float(strides[-1, 0]) == 16


def test_dist2bbox_identity():
    anchors = jnp.array([[5.0, 5.0]])
    dist = jnp.array([[1.0, 2.0, 3.0, 4.0]])  # l, t, r, b
    xyxy = dist2bbox(dist, anchors, xywh=False)
    assert np.allclose(np.asarray(xyxy), [[4.0, 3.0, 8.0, 9.0]])


class TestNMS:
    def _preds(self, boxes_xywh, scores):
        """Assemble (1, A, 4+nc) preds from per-anchor xywh + per-class scores."""
        return jnp.concatenate(
            [jnp.asarray(boxes_xywh, jnp.float32), jnp.asarray(scores, jnp.float32)],
            axis=-1,
        )[None]

    def test_suppresses_overlapping_same_class(self):
        boxes = [[10, 10, 8, 8], [11, 11, 8, 8], [40, 40, 8, 8]]
        scores = [[0.9, 0.0], [0.8, 0.0], [0.7, 0.0]]
        det, n = non_max_suppression(self._preds(boxes, scores), conf_thres=0.25,
                                     iou_thres=0.45, max_det=10)
        assert int(n[0]) == 2
        kept_scores = sorted(np.asarray(det[0, : int(n[0]), 4]).tolist(), reverse=True)
        assert kept_scores == pytest.approx([0.9, 0.7], abs=1e-5)

    def test_keeps_overlapping_different_class(self):
        boxes = [[10, 10, 8, 8], [11, 11, 8, 8]]
        scores = [[0.9, 0.0], [0.0, 0.8]]
        det, n = non_max_suppression(self._preds(boxes, scores), conf_thres=0.25,
                                     iou_thres=0.45, max_det=10)
        assert int(n[0]) == 2

    def test_agnostic_suppresses_across_classes(self):
        boxes = [[10, 10, 8, 8], [11, 11, 8, 8]]
        scores = [[0.9, 0.0], [0.0, 0.8]]
        det, n = non_max_suppression(self._preds(boxes, scores), conf_thres=0.25,
                                     iou_thres=0.45, max_det=10, agnostic=True)
        assert int(n[0]) == 1
        # Agnostic mode must still emit un-offset coordinates.
        assert float(det[0, 0, 0]) == pytest.approx(6.0, abs=1e-4)

    def test_conf_threshold_filters(self):
        boxes = [[10, 10, 8, 8], [40, 40, 8, 8]]
        scores = [[0.9, 0.0], [0.1, 0.0]]
        det, n = non_max_suppression(self._preds(boxes, scores), conf_thres=0.25,
                                     iou_thres=0.45, max_det=10)
        assert int(n[0]) == 1

    def test_class_filter(self):
        boxes = [[10, 10, 8, 8], [40, 40, 8, 8]]
        scores = [[0.9, 0.0], [0.0, 0.8]]
        det, n = non_max_suppression(self._preds(boxes, scores), conf_thres=0.25,
                                     iou_thres=0.45, max_det=10, classes=[1])
        assert int(n[0]) == 1
        assert int(det[0, 0, 5]) == 1

    def test_multi_label_expands(self):
        boxes = [[10, 10, 8, 8]]
        scores = [[0.9, 0.8]]
        det, n = non_max_suppression(self._preds(boxes, scores), conf_thres=0.25,
                                     iou_thres=0.45, max_det=10, multi_label=True)
        # Same box kept once per class (class-aware suppression keeps both).
        assert int(n[0]) == 2

    def test_matches_reference_greedy_on_random(self):
        """Exact-greedy parity vs a numpy O(N^2) reference implementation."""
        rs = np.random.RandomState(3)
        A, nc = 64, 3
        xy = rs.uniform(20, 80, (A, 2))
        wh = rs.uniform(5, 25, (A, 2))
        boxes = np.concatenate([xy, wh], -1)
        scores = rs.uniform(0, 1, (A, nc)).astype(np.float32)
        det, n = non_max_suppression(self._preds(boxes, scores), conf_thres=0.3,
                                     iou_thres=0.5, max_det=64)

        # numpy greedy reference
        best = scores.max(-1)
        cls = scores.argmax(-1)
        xyxy = np.concatenate([xy - wh / 2, xy + wh / 2], -1)
        order = np.argsort(-best)
        keep = []
        for j in order:
            if best[j] < 0.3:
                continue
            ok = True
            for k in keep:
                if cls[k] != cls[j]:
                    continue
                bx1 = np.maximum(xyxy[j, :2], xyxy[k, :2])
                bx2 = np.minimum(xyxy[j, 2:], xyxy[k, 2:])
                inter = np.prod(np.clip(bx2 - bx1, 0, None))
                a1 = np.prod(xyxy[j, 2:] - xyxy[j, :2])
                a2 = np.prod(xyxy[k, 2:] - xyxy[k, :2])
                if inter / (a1 + a2 - inter + 1e-7) > 0.5:
                    ok = False
                    break
            if ok:
                keep.append(j)
        assert int(n[0]) == len(keep)
        got = np.asarray(det[0, : len(keep), 4])
        want = np.sort(best[keep])[::-1]
        assert np.allclose(np.sort(got)[::-1], want, atol=1e-5)


def test_letterbox_shapes_and_padding():
    img = (np.random.rand(480, 640, 3) * 255).astype(np.uint8)
    out, gain, (dw, dh) = letterbox(jnp.asarray(img), (640, 640))
    assert out.shape == (640, 640, 3)
    assert gain == pytest.approx(1.0)
    assert dh == pytest.approx(80.0)
    # Pad rows are the 114-gray value.
    assert np.allclose(np.asarray(out[:79]), 114 / 255, atol=1e-5)


def test_scale_boxes_roundtrip():
    # A box letterboxed from (480, 640) into (640, 640) maps back.
    boxes_lb = jnp.array([[100.0, 160.0, 200.0, 260.0]])  # in letterboxed coords
    back = scale_boxes((640, 640), boxes_lb, (480, 640))
    assert np.allclose(np.asarray(back), [[100.0, 80.0, 200.0, 180.0]], atol=0.5)


class TestClusterNMS:
    """Cluster-NMS must reproduce the sequential greedy result exactly."""

    def _random_preds(self, seed, B=2, A=400, nc=5):
        import numpy as np

        rng = np.random.default_rng(seed)
        cx = rng.uniform(50, 600, (B, A, 1))
        cy = rng.uniform(50, 600, (B, A, 1))
        w = rng.uniform(5, 80, (B, A, 1))
        h = rng.uniform(5, 80, (B, A, 1))
        scores = rng.uniform(0, 1, (B, A, nc)) ** 3
        return np.concatenate([cx, cy, w, h, scores], -1).astype(np.float32)

    def test_cluster_matches_scan(self):
        import numpy as np

        from yolo_sod_tpu.ops.nms import non_max_suppression

        for seed in (0, 1, 2):
            preds = self._random_preds(seed)
            det_c, n_c = non_max_suppression(preds, 0.25, 0.45, max_det=50,
                                             method="cluster")
            det_s, n_s = non_max_suppression(preds, 0.25, 0.45, max_det=50,
                                             method="scan")
            np.testing.assert_array_equal(np.asarray(n_c), np.asarray(n_s))
            np.testing.assert_allclose(np.asarray(det_c), np.asarray(det_s),
                                       rtol=1e-5, atol=1e-5)

    def test_cluster_multilabel_matches_scan(self):
        import numpy as np

        from yolo_sod_tpu.ops.nms import non_max_suppression

        preds = self._random_preds(3, A=200)
        det_c, n_c = non_max_suppression(preds, 0.001, 0.7, multi_label=True,
                                         max_det=100, method="cluster")
        det_s, n_s = non_max_suppression(preds, 0.001, 0.7, multi_label=True,
                                         max_det=100, method="scan")
        np.testing.assert_array_equal(np.asarray(n_c), np.asarray(n_s))
        np.testing.assert_allclose(np.asarray(det_c), np.asarray(det_s),
                                   rtol=1e-5, atol=1e-5)


def test_image_to_compute_matches_host_normalize():
    """uint8 on-device normalize matches the old host-side f32 /255 path to
    1 ulp (XLA lowers the constant divide to a reciprocal multiply), for
    both f32 and bf16 compute dtypes."""
    import jax.numpy as jnp

    from yolo_sod_tpu.ops.numerics import image_to_compute

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 8, 8, 3), np.uint8)
    host = u8.astype(np.float32) / 255.0
    for dtype, rtol in ((jnp.float32, 2e-7), (jnp.bfloat16, 2 ** -7)):
        dev = jax.jit(lambda x: image_to_compute(x, dtype))(jnp.asarray(u8))
        ref = jnp.asarray(host).astype(dtype)
        assert dev.dtype == dtype
        np.testing.assert_allclose(np.asarray(dev.astype(jnp.float32)),
                                   np.asarray(ref.astype(jnp.float32)),
                                   rtol=rtol)
    # float input passes through with a cast only
    f = jax.jit(lambda x: image_to_compute(x, jnp.float32))(jnp.asarray(host))
    np.testing.assert_array_equal(np.asarray(f), host)


# ---------------------------------------------------------------------------
# Format-conversion long tail: parity vs reference utils/ops.py
# ---------------------------------------------------------------------------

from tests import reference_shim as _shim  # noqa: E402

HAVE_REF = _shim.install()


def test_box_format_conversion_roundtrips():
    from yolo_sod_tpu.ops import (ltwh2xywh, ltwh2xyxy, xywh2ltwh, xywh2xyxy,
                                  xyxy2ltwh, xyxy2xywh)

    rng = np.random.default_rng(0)
    xywh = np.abs(rng.standard_normal((32, 4)).astype(np.float32)) + \
        np.array([10, 10, 1, 1], np.float32)
    np.testing.assert_allclose(np.asarray(ltwh2xywh(xywh2ltwh(xywh))), xywh,
                               atol=1e-5)
    xyxy = np.asarray(xywh2xyxy(xywh))
    np.testing.assert_allclose(np.asarray(ltwh2xyxy(xyxy2ltwh(xyxy))), xyxy,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(xyxy2xywh(xyxy)), xywh, atol=1e-5)


@pytest.mark.skipif(not HAVE_REF, reason="reference package unavailable")
def test_format_converters_match_reference():
    import torch
    from ultralytics.utils import ops as rops

    from yolo_sod_tpu.ops import (crop_mask, ltwh2xyxy, regularize_rboxes,
                                  segment2box, segments2boxes, xywh2ltwh,
                                  xywhr2xyxyxyxy)

    rng = np.random.default_rng(1)
    xywh = np.abs(rng.standard_normal((16, 4)).astype(np.float32)) + \
        np.array([20, 20, 2, 2], np.float32)
    np.testing.assert_allclose(np.asarray(xywh2ltwh(xywh)),
                               rops.xywh2ltwh(torch.from_numpy(xywh)).numpy(),
                               atol=1e-5)
    ltwh = np.asarray(xywh2ltwh(xywh))
    np.testing.assert_allclose(np.asarray(ltwh2xyxy(ltwh)),
                               rops.ltwh2xyxy(torch.from_numpy(ltwh)).numpy(),
                               atol=1e-5)
    # rotated-rect corners
    r = np.concatenate([xywh[:, :2] * 4, xywh[:, 2:] + 3,
                        rng.uniform(0, np.pi / 2, (16, 1)).astype(np.float32)],
                       -1)
    np.testing.assert_allclose(np.asarray(xywhr2xyxyxyxy(r)),
                               rops.xywhr2xyxyxyxy(torch.from_numpy(r)).numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(regularize_rboxes(r)),
        rops.regularize_rboxes(torch.from_numpy(r)).numpy(), atol=1e-5)
    # mask crop
    masks = rng.random((4, 32, 32)).astype(np.float32)
    boxes = np.array([[2, 3, 20, 25], [0, 0, 32, 32],
                      [5, 5, 6, 6], [10, 0, 30, 16]], np.float32)
    np.testing.assert_allclose(
        np.asarray(crop_mask(jnp.asarray(masks), jnp.asarray(boxes))),
        rops.crop_mask(torch.from_numpy(masks),
                       torch.from_numpy(boxes)).numpy(), atol=1e-6)
    # polygons
    seg = rng.uniform(-5, 70, (12, 2)).astype(np.float32)
    np.testing.assert_allclose(segment2box(seg, 64, 64),
                               rops.segment2box(seg, 64, 64), atol=1e-5)
    np.testing.assert_allclose(
        segments2boxes([seg, seg * 0.5]),
        rops.segments2boxes([seg, seg * 0.5]), atol=1e-4)
    # resample: up (merged original vertices, ring order), down, exact-n
    from yolo_sod_tpu.ops import resample_segments

    for m in (40, 8, 12):
        ours = resample_segments([seg.copy()], n=m)[0]
        ref = rops.resample_segments([seg.copy()], n=m)[0]
        assert ours.shape == (m, 2)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_decode_per_level_biteq_concat_oracle():
    """decode_detections decodes each level before the anchor concat (the
    layout-friendly form); it must stay BIT-equal to decoding the
    concatenated maps (the reference Detect._inference order,
    head.py:100-131) for both xywh and xyxy outputs."""
    from yolo_sod_tpu.ops.boxes import dist2bbox, make_anchors
    from yolo_sod_tpu.ops.decode import decode_detections, dfl_expectation

    def oracle(feats, strides, nc, reg_max=16, xywh=True):
        b = feats[0].shape[0]
        no = 4 * reg_max + nc
        x = jnp.concatenate([f.reshape(b, -1, no) for f in feats], axis=1)
        bl, cl = x[..., :4 * reg_max], x[..., 4 * reg_max:]
        anchors, stride_t = make_anchors([(f.shape[1], f.shape[2])
                                          for f in feats], strides)
        boxes = dist2bbox(dfl_expectation(bl, reg_max), anchors[None],
                          xywh=xywh) * stride_t[None]
        return jnp.concatenate(
            [boxes, jax.nn.sigmoid(cl.astype(jnp.float32))], axis=-1)

    rng = np.random.default_rng(0)
    nc, rm = 10, 16
    feats = [jnp.asarray(rng.standard_normal((2, h, w, 4 * rm + nc)),
                         jnp.float32)
             for h, w in [(16, 16), (8, 8), (4, 4), (2, 2)]]
    strides = [4, 8, 16, 32]
    for xywh in (True, False):
        got = decode_detections(feats, strides, nc, rm, xywh)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(oracle(feats, strides, nc, rm, xywh)))
