"""Graph compiler + model assembly tests: param parity with the reference.

Ground-truth counts measured by instantiating the reference torch model
(reference nn/tasks.py DetectionModel) on CPU:
- yolov12-sod-fusion-v5-simple: 13,570,780 params (README claims 13.56 M)
- yolov12n: 2,553,904 params (yolov12.yaml header)
Our counts differ by exactly +276 (lazy-built SE 1x1 convs the torch count
misses at init: 292 + 1156 - 16 - 1156... see breakdown below) and -16 (the
frozen DFL arange conv implemented closed-form here).
"""

import numpy as np
import pytest

from yolo_sod_tpu.nn.tasks import DetectionModel, parse_model, yaml_model_load

# torch-reference per-layer ground truth for v5-simple (layer index → params).
REF_V5_LAYERS = {
    0: 928, 2: 18560, 3: 29056, 4: 610, 5: 73984, 6: 197632, 7: 295424,
    8: 460288, 9: 595456, 10: 1180672, 11: 1838080, 12: 1577984, 13: 656896,
    14: 131584, 17: 525824, 18: 8290, 19: 33024, 22: 131840, 24: 8320,
    27: 33152, 28: 38272, 29: 73984, 31: 131840, 32: 3352, 33: 295424,
    35: 525824, 36: 1180672, 38: 2100224,
}
REF_V5_TOTAL = 13570780  # includes 16-param frozen DFL conv, excludes lazy SE


@pytest.fixture(scope="module")
def v5():
    m = DetectionModel("yolov12-sod-fusion-v5-simple.yaml")
    m.init(imgsz=64)
    return m


def _per_layer(m):
    import collections
    import jax

    per = collections.Counter()
    for path, leaf in jax.tree_util.tree_leaves_with_path(m.variables["params"]):
        idx = int(path[0].key.split("_")[1])
        per[idx] += int(np.prod(leaf.shape))
    return per


def test_v5_simple_per_layer_param_parity(v5):
    per = _per_layer(v5)
    for i, want in REF_V5_LAYERS.items():
        assert per[i] == want, f"layer {i}: {per[i]} != reference {want}"


def test_v5_simple_total_params(v5):
    # Reference post-build total (lazy SE materialized by its stride-discovery
    # forward) is 13,570,780; ours differs only by the 16-param frozen DFL
    # conv, which is closed-form here.
    assert v5.num_params() == REF_V5_TOTAL - 16


def test_v5_simple_strides(v5):
    assert list(v5.stride) == [4, 8, 16, 32]


def test_v5_simple_forward_shapes(v5):
    import jax.numpy as jnp

    x = jnp.zeros((1, 64, 64, 3))
    feats = v5.apply(v5.variables, x, train=False)
    assert len(feats) == 4
    no = 4 * 16 + 10
    assert [f.shape for f in feats] == [
        (1, 16, 16, no), (1, 8, 8, no), (1, 4, 4, no), (1, 2, 2, no)]


def test_v5_simple_decode_shape(v5):
    import jax.numpy as jnp

    x = jnp.zeros((1, 64, 64, 3))
    preds = v5.predict(v5.variables, x)
    a = 16 * 16 + 8 * 8 + 4 * 4 + 2 * 2
    assert preds.shape == (1, a, 14)
    # Scores are sigmoid outputs.
    assert float(preds[..., 4:].min()) >= 0 and float(preds[..., 4:].max()) <= 1


def test_yolov12n_total_params():
    m = DetectionModel("yolov12n.yaml")
    m.init(imgsz=64)
    # Reference: 2,553,904 including the 16-param DFL conv.
    assert m.num_params() == 2553904 - 16


def test_parse_model_save_list():
    g = parse_model(yaml_model_load("yolov12-sod-fusion-v5-simple.yaml"))
    assert g.detect_index == 39
    # 38 feeds Detect as its immediately-previous layer, so it rides the
    # running output and is not in the save list.
    assert set(g.save) == {3, 6, 9, 13, 18, 23, 28, 32, 35}


def test_nc_override():
    m = DetectionModel("yolov12-sod-fusion-v5-simple.yaml", nc=7)
    assert m.nc == 7
