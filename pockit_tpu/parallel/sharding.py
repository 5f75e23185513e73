"""Sharded batched solves over a ``jax.sharding.Mesh``.

Design (TPU-first, no reference analog — the reference is single-process):

- The batch (instance) axis is the scaling axis. Instances are
  embarrassingly parallel during the solve; the only cross-device traffic
  is the reduction of convergence statistics, which rides ICI via ``psum``.
- ``shard_map`` keeps each device's shard fully local so XLA compiles the
  per-device program once; adding hosts extends the same mesh over DCN
  without touching this code (``jax.distributed`` initialization is the
  caller's responsibility).
- Mesh axes: ``dp`` (data/instance parallelism) x ``ep``
  (expert/ensemble-style parameter-sweep parallelism — different homotopy
  or boundary-condition families per lane). Both axes shard the flat batch.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from pockit_tpu.parallel._compat import shard_map
from pockit_tpu.solver import Bounds, IPOptions, make_ip_solver


def make_sharded_batch_solver(
    compiled,
    mesh: Mesh,
    options: Optional[IPOptions] = None,
):
    """Build ``step(z0_batch, bounds, rt) -> (IPResult, n_converged)``
    sharded over every axis of ``mesh`` along the batch dimension.

    All array leaves of the inputs must have a leading batch axis divisible
    by the mesh size. ``n_converged`` is a globally psum-reduced scalar —
    the cross-device convergence signal for homotopy/sweep drivers.
    """
    from pockit_tpu.optimizer.ipm import default_options

    if options is None:
        options = default_options()
    block = None
    if options.kkt_solver in ("auto", "block", "pallas"):
        from pockit_tpu.transcription.kkt import make_block_kkt

        block = make_block_kkt(compiled.system)
    solve_fn = make_ip_solver(
        compiled.objective_fn,
        compiled.constraints_fn,
        compiled.L,
        compiled.m,
        options,
        block=block,
    )
    axes = tuple(mesh.axis_names)
    spec = P(axes)  # shard the leading (batch) dim over all mesh axes

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, P()),
        check_rep=False,
    )
    def _step(z0_local, bounds_local, rt_local):
        res = jax.vmap(solve_fn)(z0_local, Bounds(*bounds_local), rt_local)
        n_conv = jax.lax.psum(
            jnp.sum(res.status == 0), axis_name=axes
        )
        return res, n_conv

    def step(z0_batch, bounds: Bounds, rt):
        return _step(z0_batch, tuple(bounds), rt)

    return jax.jit(step)


def replicate_for_batch(tree, B: int):
    """Broadcast every array leaf of ``tree`` to a leading batch axis."""
    return jax.tree_util.tree_map(
        lambda v: jnp.broadcast_to(v, (B,) + jnp.shape(v)), tree
    )
