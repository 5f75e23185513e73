"""Auxiliary subsystems: checkpointing, profiling, solver diagnostics."""

from pockit_tpu.utils.checkpoint import save_solution, load_solution
from pockit_tpu.utils.profiling import profile_trace
from pockit_tpu.utils.aot import (
    export_batch_solver,
    save_batch_solver,
    load_batch_solver,
)

__all__ = [
    "save_solution",
    "load_solution",
    "profile_trace",
    "export_batch_solver",
    "save_batch_solver",
    "load_batch_solver",
]
