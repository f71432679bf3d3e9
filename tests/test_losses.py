"""Unit tests for the SOD loss library + staged-training callbacks."""

import jax
import jax.numpy as jnp
import numpy as np


def test_nwd_loss_zero_for_identical_boxes():
    from yolo_sod_tpu.utils.losses import nwd_loss

    b = jnp.array([[10.0, 10.0, 4.0, 4.0], [5.0, 5.0, 1.0, 2.0]])
    l = nwd_loss(b, b)
    assert np.allclose(np.asarray(l), 0.0, atol=1e-3)
    # farther boxes -> larger loss
    b2 = b.at[:, 0].add(10.0)
    assert (np.asarray(nwd_loss(b, b2)) > np.asarray(l)).all()


def test_interpiou_bounds_and_identity():
    from yolo_sod_tpu.utils.losses import interpiou_iou_xyxy, interpiou_loss_xyxy

    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    assert np.allclose(np.asarray(interpiou_iou_xyxy(a, a)), 1.0, atol=1e-5)
    b = jnp.array([[20.0, 20.0, 30.0, 30.0]])
    v = float(interpiou_iou_xyxy(a, b)[0])
    assert 0.0 < v < 1.0  # interpolated boxes overlap gt partway
    assert float(interpiou_loss_xyxy(a, b)) > 0


def test_shape_iou_and_focal():
    from yolo_sod_tpu.utils.losses import focal_loss, shape_iou_loss

    p = jnp.array([[5.0, 5.0, 4.0, 4.0]])
    assert float(shape_iou_loss(p, p)) < 1e-5
    logits = jnp.array([[3.0, -3.0]])
    target = jnp.array([[1.0, 0.0]])
    good = float(focal_loss(logits, target))
    bad = float(focal_loss(-logits, target))
    assert good < bad


def test_boundary_loss():
    from yolo_sod_tpu.utils.losses import BoundaryAwareLoss

    gt = jnp.zeros((1, 16, 16, 1)).at[:, 4:12, 4:12].set(1.0)
    loss = BoundaryAwareLoss()
    perfect = float(loss(jnp.where(gt > 0, 10.0, -10.0), gt))
    wrong = float(loss(jnp.where(gt > 0, -10.0, 10.0), gt))
    assert perfect < 0.01 < wrong


def test_rfla_assigner_shapes_and_rescue():
    from yolo_sod_tpu.ops.boxes import make_anchors
    from yolo_sod_tpu.utils.losses import RFLATaskAlignedAssigner

    hw = [(8, 8), (4, 4)]
    strides = (8, 16)
    anchor_points, stride_t = make_anchors(hw, strides)
    anc = anchor_points * stride_t
    A = anc.shape[0]
    B, M, nc = 2, 3, 4
    rng = np.random.default_rng(0)
    assigner = RFLATaskAlignedAssigner(topk=5, num_classes=nc,
                                       strides=strides, hw_list=hw)
    pd_scores = jnp.asarray(rng.uniform(0, 1, (B, A, nc)), jnp.float32)
    pd_bboxes = jnp.asarray(rng.uniform(0, 64, (B, A, 4)), jnp.float32)
    gt = jnp.array([[[10, 10, 20, 20], [30, 30, 50, 50], [0, 0, 0, 0]],
                    [[5, 5, 9, 9], [0, 0, 0, 0], [0, 0, 0, 0]]], jnp.float32)
    gt_labels = jnp.zeros((B, M, 1))
    mask_gt = jnp.array([[[1.0], [1.0], [0.0]], [[1.0], [0.0], [0.0]]])

    tl, tb, ts, fg, tgi = assigner(pd_scores, pd_bboxes, anc, gt_labels, gt, mask_gt)
    assert tl.shape == (B, A) and tb.shape == (B, A, 4)
    assert ts.shape == (B, A, nc) and fg.shape == (B, A)
    # every valid GT gets at least one positive anchor (stage-2 rescue)
    fg_np = np.asarray(fg)
    tgi_np = np.asarray(tgi)
    assert {0, 1} <= set(tgi_np[0][fg_np[0]].tolist())
    assert 0 in tgi_np[1][fg_np[1]].tolist()


def test_staged_config_and_callbacks():
    from yolo_sod_tpu.engine.staged import (
        create_hcp_400_config, create_p2_toggle_callback,
        create_staged_training_callback)

    stages = create_hcp_400_config()
    assert set(stages) == {"stage1", "stage2", "stage3", "stage4"}
    assert stages["stage4"]["mosaic"] == 0.0

    class FakeArgs:
        lr0 = 0.002
        mosaic = 1.0

    class FakeTrainer:
        args = FakeArgs()
        epoch = 150
        lr0 = 0.002

    cb = create_staged_training_callback(stages)
    t = FakeTrainer()
    cb(t)
    assert t.lr0 == 0.0006
    assert t.args.mosaic == 0.8


def test_early_phase_callback():
    """Anomalous early loss halves lr and decays the cls gain through
    set_loss_gains; calm losses and late epochs are no-ops (reference
    callbacks/early_phase_tweaks.py)."""
    from yolo_sod_tpu.engine.staged import create_early_phase_callback

    class FakeArgs:
        cls = 0.5

    class FakeTrainer:
        def __init__(self):
            self.args = FakeArgs()
            self.epoch = 2
            self.lr0 = 0.002
            self.tloss = [1500.0, 900.0, 1200.0]
            self.gains = []

        def set_loss_gains(self, cls=None, **kw):
            self.gains.append(cls)
            self.args.cls = cls

    cb = create_early_phase_callback(max_epoch=10, loss_threshold=1000.0)
    t = FakeTrainer()
    cb(t)
    assert t.lr0 == 0.001 and t.gains == [0.4]
    cb(t)                                   # still anomalous: decays again
    assert t.lr0 == 0.0005 and abs(t.args.cls - 0.32) < 1e-9
    t.tloss = 5.0                           # calm loss: no-op
    cb(t)
    assert t.lr0 == 0.0005
    t.tloss, t.epoch = 9999.0, 10           # late epoch: no-op
    cb(t)
    assert t.lr0 == 0.0005


def test_staged_training_end_to_end():
    """HCP staged protocol drives the real trainer: stage switch mutates lr +
    aug, the P2 gate flips DetectStable's mask mid-run (one retrace), and the
    run completes with finite losses."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_train import TMP, make_synthetic_dataset

    import shutil

    root = TMP / "staged"
    shutil.rmtree(root, ignore_errors=True)
    yaml = make_synthetic_dataset(root, n_images=8, imgsz=96)

    from yolo_sod_tpu.engine.staged import (create_hcp_400_config,
                                            create_p2_toggle_callback,
                                            create_staged_training_callback)
    from yolo_sod_tpu.engine.trainer import DetectionTrainer
    from yolo_sod_tpu.nn.tasks import DetectionModel

    model = DetectionModel("yolov12-sod-fusion-v5-stable.yaml", nc=2)
    trainer = DetectionTrainer(
        overrides={"data": str(yaml), "epochs": 3, "batch": 4, "imgsz": 64,
                   "optimizer": "SGD", "lr0": 0.002, "nbs": 4,
                   "warmup_epochs": 0.0, "val": False, "save": False,
                   "mosaic": 0.0, "project": str(TMP / "runs"),
                   "name": "staged", "exist_ok": True, "close_mosaic": 0},
        model=model)
    stages = create_hcp_400_config()
    # shrink the schedule: switch to stage3 at epoch 1; open P2 at epoch 2
    trainer.add_callback("on_train_epoch_start",
                         create_staged_training_callback(stages, {1: "stage3"}))
    trainer.add_callback("on_train_epoch_start", create_p2_toggle_callback(2))
    trainer.train()
    assert trainer.lr0 == stages["stage3"]["lr0"]          # stage switch landed
    assert trainer.active_mask == (1.0, 1.0, 1.0, 1.0)      # P2 opened
    assert np.isfinite(trainer.tloss).all()
    shutil.rmtree(root, ignore_errors=True)


def test_tal_compressed_matches_dense():
    """The candidate-compressed TAL tail must reproduce the dense
    (B, M, A) reference tail exactly — including multi-claim conflict
    resolution to a non-claimant GT, ties, all-invalid columns, and the
    per-GT norm maxes — across random crowded scenes."""
    import jax.numpy as jnp

    from yolo_sod_tpu.utils.tal import TaskAlignedAssigner

    rng = np.random.default_rng(0)
    for trial, (B, M, A_side, nc) in enumerate(
            [(2, 8, 20, 5), (3, 16, 24, 10), (2, 32, 16, 3), (1, 4, 12, 2)]):
        A = A_side * A_side
        xs = (np.arange(A_side) + 0.5) * 8.0
        anc = np.stack(np.meshgrid(xs, xs), -1).reshape(-1, 2).astype(np.float32)
        size = A_side * 8.0
        # crowded, overlapping GT boxes to force multi-claim conflicts
        cxy = rng.random((B, M, 2)) * size
        wh = rng.random((B, M, 2)) * size * 0.5 + 8.0
        gt = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
        gt = np.clip(gt, 0, size)
        labels = rng.integers(0, nc, (B, M, 1)).astype(np.float32)
        mask = (rng.random((B, M, 1)) > 0.2).astype(np.float32)
        gt = gt * mask
        scores = rng.random((B, A, nc)).astype(np.float32)
        # predicted boxes near anchors
        pb = np.concatenate([anc - 20, anc + 20], -1)[None].repeat(B, 0)
        pb = (pb + rng.normal(0, 5, pb.shape)).astype(np.float32)
        pb = np.clip(pb, 0, size)
        pb[..., 2:] = np.maximum(pb[..., 2:], pb[..., :2] + 1)

        args = (jnp.asarray(scores), jnp.asarray(pb), jnp.asarray(anc),
                jnp.asarray(labels), jnp.asarray(gt), jnp.asarray(mask))
        dense = TaskAlignedAssigner(topk=10, num_classes=nc, compressed=False)(*args)
        comp = TaskAlignedAssigner(topk=10, num_classes=nc, compressed=True)(*args)
        names = ("labels", "bboxes", "scores", "fg_mask", "gt_idx")
        for n, d, c in zip(names, dense, comp):
            np.testing.assert_array_equal(
                np.asarray(d), np.asarray(c),
                err_msg=f"trial {trial} field {n} mismatch")
