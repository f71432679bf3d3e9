"""Spatial-partitioning (SP) training: DPxSP mesh must match single-device.

The 'spatial' mesh axis shards every (B, H, W, C) activation over image
height (parallel/mesh.py shard_batch_sp); GSPMD inserts the conv halo
exchanges. This is the TPU recipe for high-resolution SOD inputs whose
P2-level activations exceed one chip's HBM — the reference has no analog
(its DDP replicates the full image per GPU, utils/dist.py).

Runs on the 8-device virtual CPU mesh from conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_sod_tpu.parallel.mesh import build_mesh, shard_batch_sp


def _tiny_batch(B=4, imgsz=64, M=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "img": jnp.asarray(rng.integers(0, 255, (B, imgsz, imgsz, 3),
                                        np.uint8)),
        "cls": jnp.asarray(rng.integers(0, 3, (B, M)), jnp.float32),
        "bboxes": jnp.asarray(np.clip(rng.random((B, M, 4)), 0.2, 0.8),
                              jnp.float32),
        "mask_gt": jnp.asarray((rng.random((B, M)) > 0.5), jnp.float32),
    }


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_dp_sp_train_step_matches_single_device():
    from yolo_sod_tpu.engine.train_step import (build_optimizer,
                                                init_train_state,
                                                make_train_step, shard_state)
    from yolo_sod_tpu.nn.tasks import DetectionModel
    from yolo_sod_tpu.utils.loss import DetectionLoss

    model = DetectionModel("yolov12n.yaml", nc=3)
    model.init(imgsz=64)
    crit = DetectionLoss(nc=3, strides=model.graph.detect_strides)
    tx = build_optimizer(model.variables["params"], name="SGD", lr=0.01,
                         momentum=0.9, weight_decay=0.0)

    batch = _tiny_batch()

    # The jitted step donates its state arg and init states alias
    # model.variables' buffers — give the single-device state fresh
    # buffers so donation can't delete the sharded state's shards.
    s1 = jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)),
                                init_train_state(model, tx))
    mesh = build_mesh(shape=(2, 4), axes=("data", "spatial"))
    sN = shard_state(init_train_state(model, tx), mesh)

    # single-device reference (f32 compute: CPU has no native bf16 and the
    # comparison should isolate sharding, not dtype)
    step1 = make_train_step(model, crit, tx, compute_dtype=jnp.float32)
    s1, out1 = step1(s1, batch)
    loss1 = float(out1["loss"])

    # 2-way data x 4-way spatial
    stepN = make_train_step(model, crit, tx, compute_dtype=jnp.float32)
    batchN = shard_batch_sp(batch, mesh)
    # img really is height-sharded: each device holds a (2, 16, 64, 3) band
    shard_shapes = {tuple(sh.data.shape) for sh in batchN["img"].addressable_shards}
    assert shard_shapes == {(2, 16, 64, 3)}
    sN, outN = stepN(sN, batchN)
    lossN = float(outN["loss"])

    np.testing.assert_allclose(lossN, loss1, rtol=2e-5, atol=2e-5)
    # updated param leaves agree to f32 reduction-order noise (the halo'd
    # convs and the 8-way gradient all-reduce sum in a different order)
    p1 = jax.tree_util.tree_leaves(s1.params)
    pN = jax.tree_util.tree_leaves(jax.device_get(sN.params))
    for a, b in list(zip(p1, pN))[:8]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=3e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_sp_second_step_stays_in_sync():
    """Two chained steps under DPxSP: loss trajectory matches single-device
    (catches sharding bugs that only surface after the first update)."""
    from yolo_sod_tpu.engine.train_step import (build_optimizer,
                                                init_train_state,
                                                make_train_step, shard_state)
    from yolo_sod_tpu.nn.tasks import DetectionModel
    from yolo_sod_tpu.utils.loss import DetectionLoss

    model = DetectionModel("yolov12n.yaml", nc=3)
    model.init(imgsz=64)
    crit = DetectionLoss(nc=3, strides=model.graph.detect_strides)
    tx = build_optimizer(model.variables["params"], name="SGD", lr=0.01,
                         momentum=0.9, weight_decay=0.0)
    b0, b1 = _tiny_batch(seed=0), _tiny_batch(seed=1)

    s = jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)),
                               init_train_state(model, tx))
    mesh = build_mesh(shape=(2, 4), axes=("data", "spatial"))
    sN = shard_state(init_train_state(model, tx), mesh)

    step = make_train_step(model, crit, tx, compute_dtype=jnp.float32)
    s, _ = step(s, b0)
    _, out_ref = step(s, b1)

    stepN = make_train_step(model, crit, tx, compute_dtype=jnp.float32)
    sN, _ = stepN(sN, shard_batch_sp(b0, mesh))
    _, outN = stepN(sN, shard_batch_sp(b1, mesh))
    # after one divergent-rounding update the trajectories still agree to
    # well under the loss scale
    np.testing.assert_allclose(float(outN["loss"]), float(out_ref["loss"]),
                               rtol=2e-3, atol=2e-3)
