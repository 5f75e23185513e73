"""Homotopy / continuation sweeps over batched problem instances.

A continuation sweep solves a family of problems along a parameter path
(e.g. relaxing a constraint, ramping a boundary condition), warm-starting
every stage from the previous stage's solutions — the standard way to reach
hard targets that defeat cold starts. Here each stage is one batched solve,
so the whole sweep is a handful of device launches regardless of batch
size. No reference analog (pockit re-solves manually; SURVEY §5).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from pockit_tpu.optimizer import ipm
from pockit_tpu.solver import IPOptions


def homotopy_sweep(
    system,
    guess_batch: np.ndarray,
    bc_stages: Sequence,
    optimizer_options: Optional[IPOptions] = None,
    on_stage: Optional[Callable] = None,
):
    """Solve a batched continuation sweep.

    Args:
        system: fully configured ``System``.
        guess_batch: (B, L) initial vectors for stage 0.
        bc_stages: sequence of per-stage ``bc_overrides`` (each a tuple of
            (B, n_fixed) arrays, one per phase) describing the continuation
            path of the FIXED boundary values.
        optimizer_options: shared solver options.
        on_stage: optional callback ``(stage_index, IPResult) -> None``
            (metrics, checkpointing).

    Returns:
        list of per-stage ``IPResult``; stage k+1 warm-starts from stage
        k's primal solutions.
    """
    results = []
    z = jnp.asarray(guess_batch)
    for k, bc in enumerate(bc_stages):
        res = ipm.solve_batch(
            system, z, bc_overrides=bc, optimizer_options=optimizer_options
        )
        # no host sync here: stage k+1 chains on res.z device-side, and
        # callers that need host values fetch them (np.asarray) — a
        # block_until_ready would be misleading anyway on remote-tunnel
        # backends where it does not actually block
        if on_stage is not None:
            on_stage(k, res)
        results.append(res)
        z = res.z
    return results
