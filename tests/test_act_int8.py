"""int8-boundary activation mode: numerics guard (VERDICT r2 item 3).

The opt-in P2 int8 activation boundary trades precision for HBM bytes; this
pins the accuracy cost: decoded predictions of the flagship graph with
act_int8_strides=(4,) must stay within a loss-parity-grade tolerance of the
full-precision forward, and the boundary must actually carry int8 (checked
in the jaxpr)."""

from __future__ import annotations

import numpy as np
import pytest


def test_act_int8_preds_close_and_boundary_is_int8():
    import jax
    import jax.numpy as jnp

    from yolo_sod_tpu.nn.tasks import DetectionModel

    base = DetectionModel("E2.yaml")            # P2-headed, small
    base.init(imgsz=64)
    q = DetectionModel("E2.yaml", act_int8_strides=(4,))
    q.variables = base.variables                # identical weights

    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3), np.float32))
    p0 = np.asarray(base.predict(base.variables, x))
    p1 = np.asarray(q.predict(q.variables, x))

    assert p0.shape == p1.shape
    # Scores: sigmoid outputs, absolute tolerance; boxes: pixel tolerance.
    np.testing.assert_allclose(p1[..., 4:], p0[..., 4:], atol=0.02)
    np.testing.assert_allclose(p1[..., :4], p0[..., :4], atol=1.5)

    # The quantized boundary must exist in the graph as a real int8 tensor.
    jaxpr = str(jax.make_jaxpr(
        lambda v, t: q.net.apply(v, t, train=False))(q.variables, x))
    assert "convert_element_type[new_dtype=int8" in jaxpr


def test_act_int8_off_by_default():
    from yolo_sod_tpu.nn.tasks import DetectionModel

    m = DetectionModel("E2.yaml")
    assert m.net.act_int8_strides == ()
