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

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

# environment markers set by cluster schedulers / TPU pod runtimes for
# which arg-less ``jax.distributed.initialize()`` can auto-detect the
# coordinator and process topology
_CLUSTER_ENV_MARKERS = (
    "SLURM_JOB_ID",
    "OMPI_COMM_WORLD_SIZE",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "CLOUD_TPU_TASK_ID",
)


def _on_scheduled_pod() -> bool:
    """True when env markers indicate a multi-process launch. A
    single-entry ``TPU_WORKER_HOSTNAMES`` (one standalone TPU VM — some
    runtimes set it unconditionally) does NOT count."""
    if any(m in os.environ for m in _CLUSTER_ENV_MARKERS):
        return True
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hostnames.split(",") if h.strip()]) > 1


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-host JAX runtime; returns True if initialized.

    Three cases:

    - explicit arguments -> manual bring-up with exactly those values;
    - no arguments on a scheduled pod (SLURM / OpenMPI / GKE TPU / Cloud
      TPU environments, detected via their env markers) -> arg-less
      ``jax.distributed.initialize()`` auto-detect, so unattended pod
      launches initialize correctly without any call-site topology;
    - no arguments on a plain single host -> no-op.
    """
    if num_processes is not None and num_processes <= 1:
        return False
    if coordinator_address is not None or num_processes is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    if _on_scheduled_pod():
        try:
            jax.distributed.initialize()
        except RuntimeError as e:
            # the XLA backend is already up (auto-detect must run before
            # any JAX computation): unattended single-process runs keep
            # working, real pods surface the misuse loudly
            import warnings

            warnings.warn(
                f"initialize_distributed auto-detect skipped: {e}",
                RuntimeWarning,
                stacklevel=2,
            )
            return False
        return True
    return False


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
