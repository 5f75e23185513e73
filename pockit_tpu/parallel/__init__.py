"""Multi-device scaling: instance sharding over a device mesh.

The reference has no distributed layer at all (SURVEY §2.3); here the
scaling axis is the *problem-instance batch* (thousands of perturbed
boundary-condition / homotopy instances), sharded over the mesh with
``shard_map`` and reduced with ICI collectives.
"""

from pockit_tpu.parallel.sharding import make_sharded_batch_solver
from pockit_tpu.parallel.distributed import initialize_distributed, instance_mesh
from pockit_tpu.parallel.homotopy import homotopy_sweep
from pockit_tpu.parallel.refine_batch import solve_refine_batch, SweepResult
from pockit_tpu.solver.structured import make_sharded_structured_solve

__all__ = [
    "make_sharded_batch_solver",
    "make_sharded_structured_solve",
    "initialize_distributed",
    "instance_mesh",
    "homotopy_sweep",
    "solve_refine_batch",
    "SweepResult",
]
