"""Device mesh + sharding helpers.

The reference's only parallelism is a tf.distribute.MirroredStrategy scope
(reference models.py:41-44, synchronous NCCL data-parallel).  The TPU-native
equivalent: a ``jax.sharding.Mesh`` with a ``data`` axis; batches are sharded
on that axis, parameters replicated, and XLA emits the gradient all-reduce
(psum over ICI) from the sharding annotations — no hand-written collectives.

Multi-host extension: call :func:`init_distributed` (once, before any other
JAX use) on every process, then ``make_mesh()`` with no argument — it spans
the GLOBAL device set and the same sharding annotations ride ICI within a
slice and DCN across slices.
"""

from __future__ import annotations

import os
import warnings
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DISTRIBUTED_INITIALIZED = False

# Env vars whose presence (with the given predicate on their value) says
# "this process is part of a multi-host rig" even when
# jax.distributed.initialize()'s auto-detection fails — in that situation a
# silent single-process fallback would make every process train
# independently (no gradient sync, clashing checkpoint writes).
_MULTI_HOST_HINTS = (
    ("TPU_WORKER_HOSTNAMES", lambda v: "," in v),     # >1 pod worker
    ("TPU_WORKER_ID", lambda v: True),
    ("MEGASCALE_COORDINATOR_ADDRESS", lambda v: True),
    ("CLOUD_TPU_TASK_ID", lambda v: True),
    ("SLURM_NTASKS", lambda v: v.strip().isdigit() and int(v) > 1),
    ("SLURM_JOB_NUM_NODES", lambda v: v.strip().isdigit() and int(v) > 1),
    ("OMPI_COMM_WORLD_SIZE", lambda v: v.strip().isdigit() and int(v) > 1),
)


def _multi_host_hints() -> list:
    """Names of env vars suggesting this host is one of several."""
    return [name for name, pred in _MULTI_HOST_HINTS
            if name in os.environ and pred(os.environ[name])]


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> dict:
    """Join this process to a multi-host JAX cluster (the entry point the
    reference never had — its MirroredStrategy was single-host only,
    reference models.py:41-44).

    Thin, idempotent wrapper over ``jax.distributed.initialize``.  On TPU
    pods every argument is discovered from the runtime/metadata, so
    ``init_distributed()`` with no arguments is the whole recipe; on
    CPU/GPU rigs pass ``coordinator_address`` ("host:port" of process 0),
    ``num_processes`` and ``process_id``, or set the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.

    Must run before any other JAX call (backend init pins the device set).
    Returns {"process_id", "num_processes", "local_devices",
    "global_devices"} for logging.

    Per-host data sharding recipe: each process feeds its OWN DataGenerator
    over 1/num_processes of the annotation lines::

        lines = read_annotation_lines(path)[jax.process_index()::jax.process_count()]

    with per-host batch ``config.batch_size * jax.local_device_count()``.
    ``shard_batch`` then places each host's shard on its local devices; the
    gradient all-reduce spans the global mesh automatically.
    """
    global _DISTRIBUTED_INITIALIZED
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    # The want-multi-host decision must NOT touch any jax query API first:
    # even jax.process_count() initialises the XLA backend, after which
    # jax.distributed.initialize raises unconditionally.  Idempotency is
    # therefore tracked with a module flag, not probed from jax.
    if not _DISTRIBUTED_INITIALIZED:
        if (coordinator_address is not None
                or num_processes not in (None, 1)):
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
            _DISTRIBUTED_INITIALIZED = True
        elif num_processes is None:
            # No explicit rig described: hand the no-arg call to JAX's
            # managed-cluster auto-detection (TPU pod metadata, SLURM, …).
            # On a plain single host detection finds nothing and raises
            # BEFORE touching the backend — that is the documented
            # single-process fallback, not an error.  But if the
            # environment LOOKS multi-host (pod metadata / SLURM vars
            # present) the failure is a transient coordinator/metadata
            # error, and falling back would mean every process silently
            # trains alone — refuse instead.
            try:
                jax.distributed.initialize()
                _DISTRIBUTED_INITIALIZED = True
            except (ValueError, RuntimeError) as e:
                hints = _multi_host_hints()
                if hints:
                    raise RuntimeError(
                        "jax.distributed.initialize() auto-detection failed "
                        f"but the environment looks multi-host (env: "
                        f"{', '.join(hints)}). Refusing the single-process "
                        "fallback: each process would train independently — "
                        "no gradient sync, clashing checkpoint writes. Pass "
                        "coordinator_address/num_processes/process_id "
                        "explicitly or fix the cluster metadata."
                    ) from e
                warnings.warn(
                    "init_distributed: auto-detection found no cluster "
                    f"({type(e).__name__}: {e}); continuing single-process.",
                    stacklevel=2)
    return {
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def make_mesh(num_data: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_data`` devices.

    After :func:`init_distributed`, ``jax.devices()`` is the GLOBAL device
    list, so the default mesh spans every chip of every host."""
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
