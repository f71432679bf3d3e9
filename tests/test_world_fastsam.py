"""YOLO-World + FastSAM model families.

World: text-guided graph (C2fAttn / ImagePoolingAttn / WorldDetect),
set_classes vocabulary swap, closed-set WorldTrainer route
(reference models/yolo/world/train.py, nn/tasks.py:633).
FastSAM: single-class seg graph + bbox/point prompt selection
(reference models/fastsam/predict.py).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def world_model():
    import jax
    from yolo_sod_tpu.nn.tasks import WorldModel

    m = WorldModel("yolov8n-world.yaml", nc=8)
    m.init(imgsz=64)
    return m


def test_world_build_and_forward(world_model):
    import jax, jax.numpy as jnp

    m = world_model
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    feats = m.apply(m.variables, x, train=True, mutable=True)[0]
    assert [f.shape for f in feats] == [(2, 8, 8, 72), (2, 4, 4, 72), (2, 2, 2, 72)]
    p = jax.jit(lambda v, xx: m.predict(v, xx))(m.variables, x)
    assert p.shape == (2, 84, 12)          # 4 + nc=8


def test_world_set_classes_swaps_vocab_without_params(world_model):
    import jax, jax.numpy as jnp

    m = world_model
    before = jax.tree_util.tree_leaves(m.variables["params"])
    m.set_classes(["car", "tree", "person"])
    assert m.nc == 3 and m.names[2] == "person"
    after = jax.tree_util.tree_leaves(m.variables["params"])
    assert all(a is b for a, b in zip(before, after))   # no param touched
    p = jax.jit(lambda v, xx: m.predict(v, xx))(
        m.variables, jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert p.shape == (1, 84, 7)


def test_world_text_guide_changes_output(world_model):
    """Different vocabularies must produce different cls logits (the guide
    actually reaches the contrastive head)."""
    import jax.numpy as jnp

    m = world_model
    x = jnp.linspace(0, 1, 2 * 64 * 64 * 3).reshape(2, 64, 64, 3)
    g1 = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 512)),
                     jnp.float32)
    g2 = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4, 512)),
                     jnp.float32)
    o1 = m.net.apply(m.variables, x, train=False, guide=g1)
    o2 = m.net.apply(m.variables, x, train=False, guide=g2)
    diff = any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(o1, o2))
    assert diff


def test_hash_text_embedder_deterministic():
    from yolo_sod_tpu.utils.text_embed import HashTextEmbedder

    e = HashTextEmbedder(128)
    a, b = e(["red car", "red car"]), e(["blue sky"])
    np.testing.assert_allclose(a[0], a[1])
    np.testing.assert_allclose(np.linalg.norm(a, axis=-1), 1.0, rtol=1e-5)
    assert abs(float(a[0] @ b[0])) < 0.5     # unrelated ≈ orthogonal
    # related strings correlate more than unrelated ones
    c = e(["red car", "blue car", "quantum entanglement"])
    assert c[0] @ c[1] > c[0] @ c[2]


def test_world_trainer_one_epoch(tmp_path):
    """Closed-set fine-tune: the full WorldTrainer route runs and the guide
    ships with every batch."""
    import yaml
    from PIL import Image

    root = tmp_path / "ds"
    (root / "images/train").mkdir(parents=True)
    (root / "labels/train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8), "RGB") \
            .save(root / f"images/train/{i}.jpg")
        (root / f"labels/train/{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    data = {"path": str(root), "train": "images/train", "val": "images/train",
            "names": {0: "widget", 1: "gadget/gizmo"}}
    (root / "data.yaml").write_text(yaml.safe_dump(data))

    from yolo_sod_tpu.models.world import WorldTrainer

    tr = WorldTrainer(overrides=dict(
        model="yolov8n-world.yaml", data=str(root / "data.yaml"), epochs=1,
        imgsz=64, batch=2, val=False, plots=False, save=False, workers=0,
        mosaic=0.0, warmup_epochs=0, project=str(tmp_path / "runs")))
    tr.train()
    assert tr.model.nc == 2
    assert tr.model.names[1] == "gadget"         # multi-prompt split
    assert np.isfinite(tr.loss_items_last).all() if hasattr(tr, "loss_items_last") else True


def test_yoloworld_facade_predict():
    from yolo_sod_tpu import YOLOWorld

    m = YOLOWorld("yolov8n-world.yaml")
    m.set_classes(["cat", "dog"])
    img = (np.random.rand(48, 64, 3) * 255).astype(np.uint8)
    res = m.predict(img, imgsz=64, conf=0.001)
    assert len(res) == 1
    assert set(np.unique(res[0].boxes.cls).astype(int)) <= {0, 1}


# ---------------------------------------------------------------- FastSAM --

@pytest.fixture(scope="module")
def fastsam():
    from yolo_sod_tpu.models.fastsam import FastSAM

    return FastSAM("fastsam-s.yaml")


def test_fastsam_everything_mode(fastsam):
    img = (np.random.rand(48, 64, 3) * 255).astype(np.uint8)
    res = fastsam.predict(img, imgsz=64, conf=0.001)
    assert len(res) == 1
    r = res[0]
    assert r.masks is None or len(r.masks.data) == len(r)
    # single-class contract
    if len(r):
        assert set(np.unique(r.boxes.cls).astype(int)) == {0}


def test_fastsam_bbox_prompt_selects_one_per_box(fastsam):
    img = (np.random.rand(48, 64, 3) * 255).astype(np.uint8)
    base = fastsam.predict(img, imgsz=64, conf=0.001)[0]
    if len(base) == 0:
        pytest.skip("untrained model produced no detections at this seed")
    res = fastsam.predict(img, imgsz=64, conf=0.001,
                          bboxes=[[5, 5, 40, 40], [10, 10, 60, 45]])[0]
    assert 1 <= len(res) <= 2
    assert res.masks is not None and len(res.masks.data) == len(res)


def test_fastsam_point_prompt(fastsam):
    img = (np.random.rand(48, 64, 3) * 255).astype(np.uint8)
    res = fastsam.predict(img, imgsz=64, conf=0.001,
                          points=[[32, 24]], labels=[1])[0]
    # selection is a subset of everything-mode
    every = fastsam.predict(img, imgsz=64, conf=0.001)[0]
    assert len(res) <= len(every)


def test_adjust_bboxes_to_image_border():
    from yolo_sod_tpu.models.fastsam import adjust_bboxes_to_image_border

    b = np.array([[5.0, 3.0, 100.0, 90.0], [30.0, 30.0, 50.0, 50.0]])
    out = adjust_bboxes_to_image_border(b, (96, 108), threshold=20)
    np.testing.assert_allclose(out[0], [0, 0, 108, 96])
    np.testing.assert_allclose(out[1], [30, 30, 50, 50])


def test_scale_masks_np_roundtrip():
    """A mask painted on the letterboxed canvas maps back to the original
    pixels it covered."""
    from yolo_sod_tpu.models.fastsam import scale_masks_np

    h0, w0, imgsz = 48, 64, 64
    r = min(imgsz / h0, imgsz / w0, 1.0)
    dh = (imgsz - round(h0 * r)) / 2
    # proto resolution = imgsz/4
    m = np.zeros((1, 16, 16), bool)
    s = 16 / imgsz
    y0 = int(round(dh * s))
    m[0, y0:16 - y0, :] = True               # full unpadded area
    out = scale_masks_np(m, (h0, w0), imgsz)
    assert out.shape == (1, h0, w0)
    assert out.mean() > 0.95                  # covers (almost) everything


def test_world_trainer_from_scratch_grounding(tmp_path):
    """Open-set route (reference train_world.py): yolo data + grounding JSON
    concat-train with per-image text vocabularies embedded per batch."""
    import json

    import yaml
    from PIL import Image

    rng = np.random.default_rng(1)
    # -- yolo-data dataset (also serves as val) ------------------------------
    root = tmp_path / "ds"
    (root / "images/train").mkdir(parents=True)
    (root / "labels/train").mkdir(parents=True)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8), "RGB") \
            .save(root / f"images/train/{i}.jpg")
        (root / f"labels/train/{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    data = {"path": str(root), "train": "images/train", "val": "images/train",
            "names": {0: "widget", 1: "gadget"}}
    (root / "data.yaml").write_text(yaml.safe_dump(data))

    # -- grounding dataset ----------------------------------------------------
    gdir = tmp_path / "grounding"
    gdir.mkdir()
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8), "RGB") \
            .save(gdir / f"g{i}.jpg")
    cap = "a red ball next to a blue cube"
    gj = {"images": [{"id": i, "file_name": f"g{i}.jpg", "height": 64,
                      "width": 64, "caption": cap} for i in range(2)],
          "annotations": [
              {"id": 1, "image_id": 0, "bbox": [8, 8, 20, 20],
               "tokens_positive": [[2, 10]]},          # "red ball"
              {"id": 2, "image_id": 0, "bbox": [30, 30, 24, 20],
               "tokens_positive": [[21, 30]]},         # "blue cube"
              {"id": 3, "image_id": 1, "bbox": [10, 12, 30, 28],
               "tokens_positive": [[2, 10]]}]}
    (gdir / "ann.json").write_text(json.dumps(gj))

    from yolo_sod_tpu.data import GroundingDataset, YOLOConcatDataset
    from yolo_sod_tpu.models.world import WorldTrainerFromScratch

    gds = GroundingDataset(str(gdir / "ann.json"), str(gdir), imgsz=64)
    assert len(gds) == 2
    it = gds[0]
    assert it["texts"] == ["red ball", "blue cube"]
    assert len(it["labels"]) == 2 and set(it["labels"][:, 0]) == {0.0, 1.0}

    spec = dict(train=dict(yolo_data=[str(root / "data.yaml")],
                           grounding_data=[dict(img_path=str(gdir),
                                                json_file=str(gdir / "ann.json"))]),
                val=dict(yolo_data=[str(root / "data.yaml")]))
    seen = []

    class SpyTrainer(WorldTrainerFromScratch):
        """Record what preprocess_batch actually receives: the train loop must
        deliver the host-side per-image vocabularies ('texts') and the jitted
        step must never see them (regression: the dev-batch key filter used
        to drop 'texts' before preprocess, silently falling back to the
        closed-set guide)."""

        def preprocess_batch(self, batch):
            had = "texts" in batch
            out = super().preprocess_batch(batch)
            seen.append((had, "txt_feats" in out, "texts" not in out))
            return out

    tr = SpyTrainer(overrides=dict(
        model="yolov8n-world.yaml", data=spec, epochs=1, imgsz=64, batch=2,
        val=False, plots=False, save=False, workers=0, mosaic=0.0,
        warmup_epochs=0, project=str(tmp_path / "runs")))
    tr.train()
    assert isinstance(tr.trainset, YOLOConcatDataset)
    assert len(tr.trainset) == 4
    assert tr.model.nc == 2                      # val dataset vocabulary
    assert seen and all(had for had, _, _ in seen), \
        "per-image vocabularies never reached preprocess_batch"
    assert all(fe and clean for _, fe, clean in seen)


def test_world_embed_injects_guide():
    """Model.embed on a World model must inject the text guide — the neck's
    C2fAttn layers sit before the default embed index (regression: embed
    replayed the graph with guide=None and crashed in MaxSigmoidAttnBlock)."""
    import numpy as np

    from yolo_sod_tpu.models.world import YOLOWorld

    m = YOLOWorld("yolov8n-world.yaml")
    img = (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
    (vec,) = m.embed(img, imgsz=64)
    assert vec.ndim == 1 and vec.shape[0] > 0 and np.isfinite(vec).all()


def test_fastsam_text_prompt_tiny_fragments():
    """Text prompting must survive the all-tiny-regions case: the area gate
    falls back to scoring every region instead of crashing CLIP on an empty
    crop batch, and the argmax can only pick a region that was scored
    (regression: -1e9 placeholder rows made argmax silently pick region 0)."""
    from yolo_sod_tpu.engine.results import Results
    from yolo_sod_tpu.models.fastsam import FastSAMPredictor

    pred = FastSAMPredictor(overrides=dict(imgsz=64))
    calls = []

    class StubCLIP:
        def image_text_similarity(self, crops, texts):
            calls.append(len(crops))
            assert crops and all(c.size > 0 for c in crops)
            # score the LAST region highest
            sim = np.zeros((len(texts), len(crops)), np.float32)
            sim[:, -1] = 1.0
            return sim

    pred._clip = StubCLIP()
    img = (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
    boxes = np.array([[2, 2, 20, 20, 0.9, 0], [30, 30, 60, 60, 0.8, 0]],
                     np.float32)
    masks = np.zeros((2, 16, 16), bool)
    masks[0, 1:3, 1:3] = True               # tiny (< 100 px upscaled? yes: 4*16=64)
    masks[1, 8:10, 8:10] = True             # tiny too
    r = Results(img, "x.jpg", {0: "object"}, boxes=boxes, masks=masks)
    out = pred._prompt(r, texts="a thing")
    assert len(out) == 1
    # the stub scored the last surviving region highest -> region 1 selected
    np.testing.assert_allclose(out.boxes.xyxy[0], boxes[1, :4])
    assert calls and calls[0] == 2           # fallback scored BOTH regions
