"""Device mesh + sharding helpers — the framework's parallelism layer.

The reference delegates data parallelism to pytorch-lightning DDP over NCCL
(``/root/reference/conf/conf.yaml:30``, ``train.py:233-251``); world size is
gpus x num_nodes and gradients all-reduce every backward.  TPU-native
equivalent: a single program jitted over a ``Mesh`` with a ``data`` axis —
batches are sharded across chips, parameters are replicated, and XLA inserts
the gradient psum over ICI automatically from the sharding annotations.
Nothing model-side changes between 1 chip and a pod slice.

A second optional ``model`` axis shards the wide (256/512/1024-channel)
conv trunk tensor-parallel — see ``parallel/tp.py`` for the sharding
rules.  The reference has no model parallelism (grep-verified, SURVEY
§2.4) so the default mesh stays 1-D; pass ``shape=(dp, tp)`` with
``axis_names=("data", "model")`` for a dp x tp layout.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence] = None,
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a 1-D (or explicitly shaped N-D) mesh over available devices.

    ``shape`` reshapes the device list into the given per-axis extents
    (row-major, so with ``("data", "model")`` the model axis varies fastest
    — neighboring devices share the tensor-parallel group, keeping its
    collectives on the shortest ICI hops)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.asarray(devices)
    if shape is not None:
        if len(shape) != len(axis_names):
            raise ValueError(f"shape {tuple(shape)} does not match axes {tuple(axis_names)}")
        arr = arr.reshape(tuple(shape))
    elif len(axis_names) > 1:
        # fill trailing axes of size 1 unless explicitly reshaped by caller
        arr = arr.reshape((len(devices),) + (1,) * (len(axis_names) - 1))
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch_arrays: dict, axis: str = "data") -> dict:
    """device_put a dict of host numpy arrays with batch-dim sharding."""
    sharding = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sharding) for k, v in batch_arrays.items()}
