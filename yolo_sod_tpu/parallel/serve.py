"""Sharded batched inference: the multi-chip serving path.

North-star item (BASELINE.json): batched image streams shard across chips on
the 'data' mesh axis; every chip runs the identical fused pipeline (forward +
decode + NMS) on its shard and the per-image (max_det, 6) results gather back
over ICI — XLA inserts the collective from the output sharding, there is no
explicit gather code.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from yolo_sod_tpu.ops.nms import non_max_suppression
from yolo_sod_tpu.parallel.mesh import build_mesh


class ShardedPredictor:
    """Compile-once sharded inference over all local devices.

    Example:
        sp = ShardedPredictor(model, imgsz=640, batch_per_chip=8)
        det, n = sp(images_uint8)   # (B_global, max_det, 6) on host
    """

    def __init__(self, model, imgsz: int = 640, batch_per_chip: int = 8,
                 conf: float = 0.25, iou: float = 0.45, max_det: int = 300,
                 half: bool = True, mesh: Optional[Mesh] = None):
        self.model = model
        self.imgsz = imgsz
        self.mesh = mesh if mesh is not None else build_mesh()
        self.n_chips = int(np.prod(self.mesh.devices.shape))
        self.batch = batch_per_chip * self.n_chips
        variables = model.variables
        if half:
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
                variables)
        # Replicate params once; the batch shards over 'data'.
        repl = NamedSharding(self.mesh, P())
        self._variables = jax.device_put(variables, repl)
        self._data = NamedSharding(self.mesh, P("data"))
        compute = jnp.bfloat16 if half else jnp.float32

        def fn(variables, x):
            x = x.astype(compute) / 255.0
            preds = model.predict(variables, x)
            return non_max_suppression(preds, conf_thres=conf, iou_thres=iou,
                                       max_det=max_det)

        self._fn = jax.jit(fn, in_shardings=(repl, self._data),
                           out_shardings=(repl, repl))

    def __call__(self, images: np.ndarray):
        """images: (B, imgsz, imgsz, 3) uint8, B == batch_per_chip * n_chips.
        Returns host numpy (det (B, max_det, 6), n_valid (B,))."""
        assert images.shape[0] == self.batch, \
            f"global batch must be {self.batch}, got {images.shape[0]}"
        x = jax.device_put(jnp.asarray(images), self._data)
        det, n = self._fn(self._variables, x)
        return np.asarray(jax.device_get(det)), np.asarray(jax.device_get(n))
