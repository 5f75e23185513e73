"""Multi-host initialization and mesh construction.

The reference is strictly single-process (SURVEY §2.3); the multi-host
story here is standard JAX SPMD: every host runs the same program,
``jax.distributed.initialize`` wires the hosts into one runtime, and the
global mesh spans all devices — ICI within a slice, DCN across hosts.
The sharded batch solver (``parallel/sharding.py``) is written against the
global mesh, so scaling from one chip to a pod slice is a mesh-shape
change, not a code change.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host JAX runtime (no-op on a single host).

    On TPU pods launched through a cluster scheduler the arguments are
    auto-detected; pass them explicitly for manual bring-up.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def instance_mesh(axis_names: Sequence[str] = ("dp", "ep"), ep_size: int = 1) -> Mesh:
    """Build a global device mesh for instance sharding.

    ``ep_size`` splits off an ensemble/parameter-sweep axis; the rest of
    the devices form the data-parallel axis. Works identically for one
    chip, one host, or a multi-host pod slice (call
    :func:`initialize_distributed` first in the multi-host case).
    """
    devices = np.array(jax.devices())
    n = len(devices)
    if n % ep_size:
        raise ValueError(f"device count {n} not divisible by ep_size {ep_size}")
    grid = devices.reshape(n // ep_size, ep_size)
    return Mesh(grid, tuple(axis_names))
