"""AutoBackend: uniform inference over export formats.

TPU-native analog of reference nn/autobackend.py (763 LoC, 15 formats):
format sniffing by suffix/magic, metadata recovery, uniform
``forward(im) -> (det, n_valid)`` where det is (B, max_det, 6).

Supported: native .ckpt (rebuild model + jit), .stablehlo (jax.export
deserialize — runs the exact serialized fused graph), .tflite (TFLite
interpreter, host CPU), *_saved_model dirs (TF SavedModel via jax2tf),
and http(s)://host/model Triton inference-server URLs (remote KServe-v2,
utils/triton.py — the served model must be one of our exported fused
pipelines returning (det, n)).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from yolo_sod_tpu.utils import LOGGER

HLO_MAGIC = b"YSTHLO1\n"


class AutoBackend:
    def __init__(self, weights: str, conf: float = 0.25, iou: float = 0.45,
                 max_det: int = 300):
        self.path = Path(str(weights))
        self.names: dict = {}
        self.imgsz = None
        suffix = self.path.suffix.lower()
        if str(weights).startswith(("http://", "https://", "grpc://")):
            self._init_triton(str(weights))
            self.format = "triton"
        elif suffix in (".ckpt", ".msgpack"):
            self._init_native(conf, iou, max_det)
            self.format = "ckpt"
        elif suffix == ".stablehlo":
            self._init_stablehlo()
            self.format = "stablehlo"
        elif suffix == ".aot":
            self._init_aot()
            self.format = "aot"
        elif suffix == ".tflite":
            self._init_tflite(conf, iou, max_det)
            self.format = "tflite"
        elif self.path.is_dir() or str(weights).endswith("_saved_model"):
            self._init_saved_model()
            self.format = "saved_model"
        else:
            raise ValueError(f"unsupported weights format: {self.path}")
        LOGGER.info(f"AutoBackend: loaded {self.format} backend from {self.path}")

    # -- native ---------------------------------------------------------------
    def _init_native(self, conf, iou, max_det):
        from yolo_sod_tpu.nn.tasks import DetectionModel
        from yolo_sod_tpu.ops.nms import non_max_suppression
        from yolo_sod_tpu.utils.checkpoint import load_checkpoint

        ckpt = load_checkpoint(self.path)
        model = DetectionModel(ckpt["model_yaml"])
        model.variables = ckpt.get("ema") or ckpt["variables"]
        if not model.variables or "params" not in model.variables:
            model.variables = ckpt["variables"]
        self.names = ckpt.get("names") or {i: str(i) for i in range(model.nc)}
        self.model = model

        @jax.jit
        def fn(x):
            preds = model.predict(model.variables, x)
            return non_max_suppression(preds, conf_thres=conf, iou_thres=iou,
                                       max_det=max_det)
        self._fn = fn

    # -- stablehlo ------------------------------------------------------------
    def _init_stablehlo(self):
        from jax import export as jexport

        with open(self.path, "rb") as f:
            magic = f.read(len(HLO_MAGIC))
            if magic != HLO_MAGIC:
                raise ValueError(f"{self.path}: bad stablehlo header")
            n = int.from_bytes(f.read(8), "little")
            meta = json.loads(f.read(n).decode())
            blob = f.read()
        self.names = {int(k): v for k, v in (meta.get("names") or {}).items()}
        self.imgsz = meta.get("imgsz")
        exp = jexport.deserialize(blob)
        self._fn = lambda x: exp.call(x)

    # -- aot ------------------------------------------------------------------
    def _init_aot(self):
        """Serialized compiled executable: deserialize + run — no trace, no
        XLA compile (exporter fmt=aot). Treedefs rebuild from the header's
        input/output specs; the artifact is bound to the platform/device
        kind/jax version it was compiled on, checked here for a clean error
        instead of an undefined dispatch."""
        from jax.experimental import serialize_executable as se
        from jax.tree_util import tree_structure

        from yolo_sod_tpu.engine.exporter import AOT_MAGIC

        with open(self.path, "rb") as f:
            if f.read(len(AOT_MAGIC)) != AOT_MAGIC:
                raise ValueError(f"{self.path}: bad aot header")
            n = int.from_bytes(f.read(8), "little")
            meta = json.loads(f.read(n).decode())
            payload = f.read()
        dev = jax.devices()[0]
        want = (meta.get("platform"), meta.get("device_kind"),
                meta.get("jax_version"))
        have = (dev.platform, dev.device_kind, jax.__version__)
        if want != have:
            raise RuntimeError(
                f"{self.path}: AOT artifact was compiled for "
                f"platform/device/jax {want} but this process runs {have}; "
                "re-export on this platform or load the .ckpt instead")
        self.names = {int(k): v for k, v in (meta.get("names") or {}).items()}
        self.imgsz = meta.get("imgsz")
        in_specs = tuple(jax.ShapeDtypeStruct(tuple(s), np.dtype(d))
                         for s, d in meta["inputs"])
        out_specs = tuple(jax.ShapeDtypeStruct(tuple(s), np.dtype(d))
                          for s, d in meta["outputs"])
        in_tree = tree_structure((in_specs, {}))
        out_tree = tree_structure(out_specs)
        self._fn = se.deserialize_and_load(payload, in_tree, out_tree)

    # -- tflite ---------------------------------------------------------------
    def _init_tflite(self, conf=0.25, iou=0.45, max_det=300):
        import tensorflow as tf

        self._interp = tf.lite.Interpreter(model_path=str(self.path))
        self._interp.allocate_tensors()
        self._in = self._interp.get_input_details()
        self._out = self._interp.get_output_details()

        # INT8 artifacts are model-only (forward+decode; the quantization
        # calibrator cannot execute the flex NMS scan, so the exporter strips
        # it — reference TFLite exports are likewise net-only). A single
        # rank-3 output means "preds, NMS on us".
        nms = None
        if len(self._out) == 1 and len(self._out[0]["shape"]) == 3:
            from yolo_sod_tpu.ops.nms import non_max_suppression

            nms = jax.jit(lambda p: non_max_suppression(
                p, conf_thres=conf, iou_thres=iou, max_det=max_det))

        def fn(x):
            self._interp.set_tensor(self._in[0]["index"], np.asarray(x, np.float32))
            self._interp.invoke()
            outs = [self._interp.get_tensor(o["index"]) for o in self._out]
            if nms is not None:
                det, n = nms(jnp.asarray(outs[0]))
                return np.asarray(det), np.asarray(n)
            # (det, n): det is the rank-3 output, n the rank-1 counts —
            # interpreter output order is not contractual.
            outs.sort(key=lambda a: -a.ndim)
            return tuple(outs)
        self._fn = fn

    # -- saved_model ------------------------------------------------------------
    def _init_saved_model(self):
        import tensorflow as tf

        mod = tf.saved_model.load(str(self.path))
        sig = mod.signatures["serving_default"]

        def fn(x):
            out = sig(tf.constant(np.asarray(x, np.float32)))
            vals = [v.numpy() for v in out.values()]
            # (det, n): det is the rank-3 output, n the rank-1 counts.
            vals.sort(key=lambda a: -a.ndim)
            return tuple(vals)
        self._mod = mod   # keep the loaded module alive
        self._fn = fn

    # -- triton -----------------------------------------------------------------
    def _init_triton(self, url: str):
        from yolo_sod_tpu.utils.triton import TritonRemoteModel

        self._client = TritonRemoteModel(url)

        def fn(x):
            outs = self._client(np.asarray(x, np.float32))
            outs = sorted(outs, key=lambda a: -a.ndim)
            return tuple(outs)
        self._fn = fn

    # -- uniform API ----------------------------------------------------------
    def forward(self, im):
        """im: (B, H, W, 3) float32 in [0,1] → (det (B, max_det, 6), n (B,)).

        uint8 input is normalized here: exported graphs are traced with a
        float signature, while the validator ships raw uint8 batches (the
        4×-less-transfer contract, reference AutoBackend does the same
        `im.float()/255` adaptation inside forward)."""
        if getattr(im, "dtype", None) == np.uint8:
            im = np.asarray(im, np.float32) / 255.0
        out = self._fn(jnp.asarray(im)
                       if self.format not in ("tflite", "saved_model", "triton")
                       else im)
        det, n = out[0], out[1]
        return np.asarray(jax.device_get(det)), np.asarray(jax.device_get(n))

    __call__ = forward

    def warmup(self, imgsz=(1, 640, 640, 3)):
        self.forward(np.zeros(imgsz, np.float32))
        return self
