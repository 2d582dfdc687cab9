"""Device mesh construction + sharding helpers (SURVEY.md §5 comm table).

The rebuild's only required parallelism is data-parallel (SURVEY.md §2 #15):
a 1-D 'data' mesh axis; gradients all-reduce over ICI within a slice and DCN
across hosts. All collectives are XLA-inserted — no user-level comm code.
Multi-host init goes through `jax.distributed.initialize` before mesh
construction (caller's responsibility; `maybe_init_distributed` wraps it).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _multi_process_launch() -> bool:
    """True when the environment indicates a multi-process (multi-host) run.

    Signals, in the standard jax.distributed contract: the
    `JAX_COORDINATOR_ADDRESS` / `JAX_NUM_PROCESSES` / `JAX_PROCESS_ID`
    triplet (consumed by `jax.distributed.initialize()` itself when its
    args are None), or a TPU-pod launcher exporting multiple worker
    hostnames. A single-entry TPU_WORKER_HOSTNAMES (e.g. 'localhost',
    which this image's sitecustomize injects) is NOT a multi-process
    signal.
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return True
    if int(os.environ.get("JAX_NUM_PROCESSES", "1") or 1) > 1:
        return True
    if os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return True
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hostnames.split(",") if h.strip()]) > 1


def maybe_init_distributed() -> None:
    """Initialize jax.distributed when launched multi-host (env-driven).

    Contract (BASELINE config #5, v5e-16 = 4 hosts): see
    `_multi_process_launch`. Single-process runs (1 host, any chip count)
    skip this — jax.devices() already sees the whole slice.
    """
    if _multi_process_launch():
        jax.distributed.initialize()


def make_mesh(data_parallel: int = -1, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first `data_parallel` devices."""
    devices = jax.devices()
    n = len(devices) if data_parallel in (-1, 0) else data_parallel
    if n > len(devices):
        raise ValueError(
            f"requested {n}-way data parallelism but only {len(devices)} devices"
        )
    return Mesh(np.asarray(devices[:n]).reshape(n), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """device_put a host batch with the leading dim sharded over `data`."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
