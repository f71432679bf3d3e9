"""utils/aot.py unit tests (the executable cache behind fmt=aot, init, and
the predictor pipelines). The cache-hit path itself is covered by
tests/test_export.py::test_aot_export_fresh_process_roundtrip in a
single-device subprocess — under this suite's forced-8-device CPU mesh the
disk path is deliberately disabled (deserialized executables mis-bind shard
counts on multi-device topologies)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def test_cached_compile_multidevice_disk_guard():
    from yolo_sod_tpu.utils.aot import cached_compile

    def f(x):
        return x * 2.0

    x = jnp.ones((4, 8))
    call, stats = cached_compile(f, (x,), "guard-test")
    assert jax.local_device_count() > 1
    assert stats["cache"] == "off"          # disk path disabled, still compiled
    np.testing.assert_allclose(np.asarray(call(x)), 2.0 * np.ones((4, 8)))


def test_signature_varies_with_avals_and_key():
    from yolo_sod_tpu.utils.aot import _signature

    a = jnp.ones((4, 8))
    b = jnp.ones((8, 4))
    assert _signature("k", (a,)) != _signature("k", (b,))
    assert _signature("k", (a,)) != _signature("k2", (a,))
    assert _signature("k", (a,)) == _signature("k", (jnp.zeros((4, 8)),))


import pytest


@pytest.mark.skipif(jax.local_device_count() > 1,
                    reason="deserialized executables mis-bind on multi-device "
                           "topologies — the exact limitation the disk-cache "
                           "guard exists for; single-device coverage lives in "
                           "test_export.py's fresh-process subprocess test")
def test_serialize_roundtrip_in_process():
    """serialize -> deserialize_to_callable with rebuilt treedefs matches
    the jit result (single-device codepath, in-process)."""
    from yolo_sod_tpu.utils.aot import (deserialize_to_callable,
                                        serialize_compiled)

    def f(v, x):
        return jnp.tanh(x @ v["w"]), x.sum(axis=-1)

    v = {"w": jnp.ones((16, 16), jnp.float32)}
    x = jnp.ones((2, 16), jnp.float32)
    compiled = jax.jit(f).lower(v, x).compile()
    payload = serialize_compiled(compiled)
    call = deserialize_to_callable(payload, f, (v, x))
    ref = compiled(v, x)
    got = call(v, x)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]))
