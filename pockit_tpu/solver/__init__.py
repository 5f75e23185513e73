"""From-scratch batched primal-dual interior-point solver (replaces IPOPT,
reference: ``/root/reference/pockit/optimizer/ipopt.py``)."""

from pockit_tpu.solver.options import IPOptions
from pockit_tpu.solver.ipm import (
    make_ip_solver,
    IPResult,
    Bounds,
    broadcast_bounds,
    summarize,
)

__all__ = [
    "IPOptions",
    "make_ip_solver",
    "IPResult",
    "Bounds",
    "broadcast_bounds",
    "summarize",
]
