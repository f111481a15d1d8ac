"""Device mesh + sharding helpers.

The reference's only parallelism is a tf.distribute.MirroredStrategy scope
(reference models.py:41-44, synchronous NCCL data-parallel).  The TPU-native
equivalent: a ``jax.sharding.Mesh`` with a ``data`` axis; batches are sharded
on that axis, parameters replicated, and XLA emits the gradient all-reduce
(psum over ICI) from the sharding annotations — no hand-written collectives.

Multi-host extension: call ``jax.distributed.initialize()`` before
``make_mesh`` and the same annotations ride DCN across slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_data`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data is not None:
        if num_data > len(devices):
            raise ValueError(
                f"requested {num_data} devices, have {len(devices)}")
        devices = devices[:num_data]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim on the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, batch_axis: int = 0):
    """Place a host batch pytree on the mesh, sharded on ``batch_axis``
    (axis 1 for gradient-accumulation stacks whose axis 0 is the
    replicated micro-step axis)."""
    spec = P(*([None] * batch_axis + ["data"]))
    s = NamedSharding(mesh, spec)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
