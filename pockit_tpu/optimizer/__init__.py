"""Solver interfaces (reference: ``/root/reference/pockit/optimizer/``).

- :mod:`pockit_tpu.optimizer.ipm` — the native batched interior-point
  solver (replaces the reference's IPOPT adapter).
- :mod:`pockit_tpu.optimizer.scipy` — scipy ``trust-constr`` adapter, kept
  as an independent cross-check of the transcription.
- :mod:`pockit_tpu.optimizer.ipopt` — drop-in shim translating IPOPT-style
  option dicts so reference scripts run by changing only the package name.
"""

from pockit_tpu.optimizer import ipm, ipopt, scipy  # noqa: F401

__all__ = ["ipm", "ipopt", "scipy"]
