"""Device-mesh construction and sharding helpers.

The single entry point for how this framework talks to multiple
chips/hosts (SURVEY.md §2.8): a ``data`` axis for pair-parallel
matching/training and a ``ba`` axis for the distributed Schur solver.
Collectives are always XLA collectives over the mesh (psum /
all_gather under jit or shard_map) — never host loops.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` local devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Device-put a dict of host arrays with the batch dim sharded."""
    sh = data_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host runtime init (DCN between hosts, ICI within a slice).

    A thin wrapper over ``jax.distributed.initialize`` — on
    single-host setups (this repo's CI) it is a no-op.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
