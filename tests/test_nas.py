"""YOLO-NAS family: graph build, xyxy output contract, reparameterization.

Reference parity targets: models/nas/model.py:26 (NAS facade), predict.py:
35-48 (xyxy adaptation ahead of NMS), val.py:38-50; RepConv fusion math
mirrors reference nn/modules/conv.py RepConv.fuse_convs:228-286.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_sod_tpu.nn.modules.standard import RepConv, rep_deploy
from yolo_sod_tpu.utils.reparam import fuse_rep_variables


@pytest.mark.parametrize("c1,c2,s", [(16, 16, 1), (16, 32, 1), (16, 32, 2)])
def test_repconv_fuse_equivalence(c1, c2, s):
    """Deploy-mode fused conv must reproduce the train-branch eval output
    exactly (up to float assoc): BN fold + 1x1 pad + identity delta kernel.
    bn=True exercises the identity-BN third branch where legal (c1==c2, s==1;
    reference conv.py:193 — default is bn=False, RT-DETR RepC3 uses none)."""
    mod = RepConv(c1, c2, 3, s, bn=True)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, c1), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    # Perturb BN stats/params so the fold is non-trivial.
    rs = np.random.RandomState(1)
    variables = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(rs.uniform(0.1, 0.5, a.shape), a.dtype),
        variables)
    y_train_form = mod.apply(variables, x, train=False)

    # The module IS the RepConv node here: wrap to reuse the tree walker.
    fused, n = fuse_rep_variables({"params": {"rep": variables["params"]},
                                   "batch_stats": {"rep": variables["batch_stats"]}})
    assert n == 1
    with rep_deploy():
        y_fused = mod.apply({"params": fused["params"]["rep"]}, x, train=False)
    np.testing.assert_allclose(np.asarray(y_train_form), np.asarray(y_fused),
                               rtol=1e-4, atol=1e-4)


def test_nas_model_builds_and_decodes_xyxy():
    from yolo_sod_tpu.nn.tasks import NASModel

    m = NASModel("yolo-nas-s.yaml", nc=7)
    m.init(imgsz=64)
    assert list(m.stride) == [8, 16, 32]
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out = m.predict(m.variables, x)
    a = sum((64 // s) ** 2 for s in (8, 16, 32))
    assert out.shape == (1, a, 4 + 7)
    # xyxy contract: x2 >= x1, y2 >= y1 for every anchor.
    boxes = np.asarray(out[..., :4])
    assert (boxes[..., 2] >= boxes[..., 0]).all()
    assert (boxes[..., 3] >= boxes[..., 1]).all()


def test_nas_full_model_fuse_preserves_predictions():
    from yolo_sod_tpu.nn.tasks import NASModel

    m = NASModel("yolo-nas-s.yaml", nc=3)
    m.init(imgsz=64)
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3), jnp.float32)
    before = np.asarray(m.predict(m.variables, x))
    n_params_before = m.num_params()
    m.fuse()
    after = np.asarray(m.predict(m.variables, x))
    assert m.num_params() < n_params_before        # branches really collapsed
    np.testing.assert_allclose(before, after, rtol=2e-3, atol=2e-3)


def test_nas_facade_predict_e2e():
    from yolo_sod_tpu.models import NAS

    model = NAS("yolo-nas-s.yaml")
    img = (np.random.RandomState(3).rand(80, 60, 3) * 255).astype(np.uint8)
    results = model.predict(img, imgsz=64, conf=0.0, max_det=5, verbose=False)
    assert len(results) == 1
    r = results[0]
    assert r.boxes.data.shape[1] == 6
    # boxes land inside the original image frame
    if len(r):
        assert (r.boxes.xyxy[:, [0, 2]] <= 60 + 1).all()
        assert (r.boxes.xyxy[:, [1, 3]] <= 80 + 1).all()


def test_nas_public_import():
    import yolo_sod_tpu

    assert yolo_sod_tpu.NAS.__name__ == "NAS"
    assert yolo_sod_tpu.RTDETR.__name__ == "RTDETR"
    assert yolo_sod_tpu.SAM is not None
