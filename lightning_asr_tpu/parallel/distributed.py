"""Multi-host initialization — the reference's ``num_nodes`` Trainer arg
(``/root/reference/conf/conf.yaml:31``, ``train.py:251``; PL spawns one DDP
process group across nodes over NCCL).

JAX equivalent: ``jax.distributed.initialize`` forms one global runtime
across hosts; every host then sees all devices in ``jax.devices()`` and the
same pjit program spans the pod — gradients psum over ICI within a slice and
DCN across slices with no code changes (the mesh helpers in
``parallel.mesh`` already operate on the global device list).

On TPU pods the coordinator/process env comes from the TPU metadata, so
``initialize()`` needs no arguments; explicit args support CPU/GPU fleets.
"""

from __future__ import annotations

import logging
from typing import Optional

logger = logging.getLogger(__name__)

_initialized = False


def init_distributed(
    num_nodes: int = 1,
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime when num_nodes > 1 (idempotent)."""
    global _initialized
    if num_nodes <= 1 or _initialized:
        return
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    logger.info(
        "distributed runtime up: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
