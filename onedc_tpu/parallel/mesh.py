"""Device mesh + sharding helpers.

The reference's only parallelism is 4-GPU DDP via Accelerate
(``src/ddp_configs/ddp_4A100.yaml``). The TPU-native replacement is a
``jax.sharding.Mesh`` with named axes and pjit-partitioned train steps:

- ``data``: batch data-parallel axis (DDP equivalent; gradients are
  all-reduced by XLA automatically through the sharded loss mean)
- ``tensor``: reserved for spatial/tensor sharding of the 4K tiled path
  (attention windows and conv halos ride ICI via shard_map)

Single-chip execution is the degenerate 1x1 mesh, so every code path is
mesh-agnostic.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
TENSOR_AXIS = "tensor"


def make_mesh(devices: Optional[Sequence] = None,
              data: Optional[int] = None,
              tensor: int = 1) -> Mesh:
    """Build a (data, tensor) mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // tensor
    assert data * tensor == n, f"{data}x{tensor} mesh != {n} devices"
    arr = np.asarray(devices).reshape(data, tensor)
    return Mesh(arr, (DATA_AXIS, TENSOR_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of batch arrays with the batch dim sharded."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate_params(mesh: Mesh, params):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), params)
