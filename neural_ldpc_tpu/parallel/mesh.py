"""Device-mesh utilities: the framework's distributed backend.

The reference is single-process/single-device (SURVEY.md §2.2 — no
torch.distributed anywhere); here Monte-Carlo decoding and training scale by
sharding the codeword batch over a ``jax.sharding.Mesh`` ('data' axis).
Params are replicated; XLA inserts the gradient/error-count psums over ICI.
Multi-host pods attach via ``initialize_distributed()``
(jax.distributed.initialize) before mesh construction.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host runtime init (no-op for single-process runs)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices (all by
    default).  Works on real TPU slices and on virtual CPU devices
    (XLA_FLAGS=--xla_force_host_platform_device_count=N)."""
    devices = jax.devices()
    if n_devices is not None and len(devices) < n_devices:
        # some platform plugins (e.g. the axon TPU tunnel) register even under
        # JAX_PLATFORMS=cpu and hide the virtual CPU devices — fall back to
        # the cpu backend when it can satisfy the request
        try:
            cpu = jax.devices("cpu")
            if len(cpu) >= n_devices:
                devices = cpu
        except RuntimeError:
            pass
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a batch-leading array (or pytree) sharded over the data axis."""
    return jax.device_put(x, data_sharding(mesh, axis_name))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, replicated_sharding(mesh))


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
