"""Device mesh & sharding layer — the framework's distributed backend (D1).

The reference has no distributed computing at all (SURVEY.md §2.2); this
module introduces it the TPU-native way: a ``jax.sharding.Mesh`` with a
``data`` axis (patch batches) and a ``model`` axis (independent ensemble
trees / scene tiles), ``NamedSharding``/``PartitionSpec`` annotations, and
XLA collectives (psum/all_gather) over ICI within a slice and DCN across
hosts.  No NCCL/MPI: the JAX runtime is the communication backend.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host init (``jax.distributed.initialize``).

    No-op on single-process runs; in a pod slice the standard TPU
    environment variables are picked up automatically.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(n_devices: Optional[int] = None,
              model_axis: int = 1,
              axis_names: Tuple[str, str] = ("data", "model"),
              devices: Optional[Sequence] = None) -> Mesh:
    """2-D ``(data, model)`` mesh over the first ``n_devices`` devices.

    ``model_axis`` devices are dedicated to tree/tile parallelism; the rest
    to batch data parallelism.  Default is a pure data-parallel 1xN mesh.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_axis:
        raise ValueError(f"n_devices={n} not divisible by "
                         f"model_axis={model_axis}")
    arr = np.asarray(devs).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names)


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def model_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (tree/tile) axis over the ``model`` mesh axis."""
    return NamedSharding(mesh, P("model", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    """Place a host array on the mesh, batch axis sharded over ``data``.

    Pads the batch to a multiple of the data-axis size with edge repeats if
    needed (callers should trim using the returned original length).
    """
    import jax.numpy as jnp
    n = x.shape[0]
    d = mesh.shape["data"]
    pad = (-n) % d
    if pad:
        x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
    return jax.device_put(jnp.asarray(x), data_sharding(mesh, x.ndim)), n
