"""Parallelism layer: device meshes, sharding rules, distributed helpers."""

from yolo_sod_tpu.parallel.mesh import (
    batch_sharding,
    build_mesh,
    replicate,
    shard_batch,
)

__all__ = ["build_mesh", "batch_sharding", "replicate", "shard_batch"]
