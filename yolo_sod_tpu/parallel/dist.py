"""Multi-host initialization: the SPMD 'launcher'.

TPU-native replacement for the reference's DDP launcher machinery
(utils/dist.py:25-66 — free-port pick, generated temp train script,
`torch.distributed.run` subprocess re-exec): on TPU pods there is no
subprocess relaunch — every host runs the same SPMD program and
jax.distributed.initialize() wires the cluster from the environment
(TPU metadata / coordinator address).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from yolo_sod_tpu.utils import LOGGER


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> dict:
    """Initialize multi-host JAX when needed; no-op on a single host.

    Returns {"process_index", "process_count", "local_devices", "global_devices"}.
    """
    explicit = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if explicit or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes,
            process_id=process_id)
        LOGGER.info(f"distributed: process {jax.process_index()}/{jax.process_count()}")
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def is_main_process() -> bool:
    """Rank-0 gating for host-side IO (checkpoints, logs). Device compute
    needs no gating — it is one SPMD program."""
    return jax.process_index() == 0
