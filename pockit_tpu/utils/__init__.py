"""Auxiliary subsystems: checkpointing, profiling, solver diagnostics."""

from pockit_tpu.utils.checkpoint import save_solution, load_solution
from pockit_tpu.utils.profiling import profile_trace

__all__ = ["save_solution", "load_solution", "profile_trace"]
