"""Solver interfaces (reference: ``/root/reference/pockit/optimizer/``).

- :mod:`pockit_tpu.optimizer.ipm` — the native batched interior-point
  solver (replaces the reference's IPOPT adapter).
- :mod:`pockit_tpu.optimizer.scipy` — scipy ``trust-constr`` adapter, kept
  as an independent cross-check of the transcription.
"""

from pockit_tpu.optimizer import ipm, scipy  # noqa: F401

__all__ = ["ipm", "scipy"]
