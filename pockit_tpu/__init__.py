"""pockit_tpu: a TPU-native pseudospectral optimal-control framework.

A from-scratch rebuild of the capabilities of pockit (Python Optimal Control
KIT, reference: /root/reference) designed for TPU hardware:

- Multi-phase optimal control problems on Legendre-Gauss-Lobatto (LGL) and
  Legendre-Gauss-Radau (LGR) collocation meshes (reference:
  ``pockit/lobatto``, ``pockit/radau``).
- A SymPy-based problem-definition frontend mirroring pockit's ``System`` /
  ``Phase`` / ``Variable`` API (reference: ``pockit/base/systembase.py``,
  ``pockit/base/phasebase.py``), lowered to JAX instead of Numba.
- Derivatives by JAX tracing (jacfwd / forward-over-reverse) instead of
  SymPy symbolic differentiation + codegen (reference:
  ``pockit/base/fastfunc.py``, ``pockit/base/easyderiv.py``).
- A from-scratch batched primal-dual interior-point solver replacing IPOPT
  (reference: ``pockit/optimizer/ipopt.py``), fully ``jit``/``vmap``-able,
  scaling over device meshes with ``shard_map``.

Everything under ``jit`` uses static shapes, dense block-structured tensors
(never general sparse matrices) and batched linear algebra so XLA can map
the work onto the MXU.
"""

__version__ = "0.1.0"

from pockit_tpu import numerics  # noqa: F401


def __getattr__(name):
    # lazy subpackage access (pockit_tpu.lobatto, .radau, .optimizer, ...)
    # without importing jax-heavy modules at package import time
    if name in {
        "lobatto",
        "radau",
        "optimizer",
        "solver",
        "parallel",
        "transcription",
        "utils",
        "base",
    }:
        import importlib

        return importlib.import_module(f"pockit_tpu.{name}")
    raise AttributeError(f"module 'pockit_tpu' has no attribute {name!r}")


__all__ = [
    "numerics",
    "lobatto",
    "radau",
    "optimizer",
    "solver",
    "parallel",
    "transcription",
    "utils",
    "__version__",
]
