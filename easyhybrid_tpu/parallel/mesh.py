"""Device mesh + data-parallel sharding helpers.

The reference has NO distributed layer (SURVEY.md §2.10: single-device Lux
``gpu_device()`` transfers only). This module is the TPU-native addition:
single-program data parallelism via ``jax.sharding`` — batches are sharded
over the mesh's ``data`` axis, parameters are replicated, and XLA inserts the
gradient ``psum`` over ICI automatically because the jitted train step is an
SPMD program over sharded inputs.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_epoch_tensors",
    "data_parallel_sharding",
]


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "data",
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D mesh over (the first ``n_devices``) local devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devs)} available"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def data_parallel_sharding(mesh: Mesh, *, batch_axis: int = 0) -> NamedSharding:
    """NamedSharding splitting ``batch_axis`` over the mesh's first axis."""
    axis_name = mesh.axis_names[0]
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = axis_name
    return NamedSharding(mesh, P(*spec))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def _shard_leaf(a, mesh: Mesh, batch_axis: int):
    if np.ndim(a) <= batch_axis:
        return a  # scalars / low-rank leaves stay unsharded
    return jax.device_put(a, data_parallel_sharding(mesh, batch_axis=batch_axis))


def shard_batch(tree: Any, mesh: Mesh, *, batch_axis: int = 0) -> Any:
    """Shard every array leaf of a batch pytree along its sample axis."""
    return jax.tree.map(lambda a: _shard_leaf(a, mesh, batch_axis), tree)


def shard_epoch_tensors(tensors, mesh: Mesh):
    """Shard padded epoch tensors ``(num_batches, batch, ...)`` along the
    in-batch sample axis (axis 1); the scan walks axis 0 on every device."""
    return jax.tree.map(lambda a: _shard_leaf(a, mesh, 1), tensors)
