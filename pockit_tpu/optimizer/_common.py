"""Adapter-shared packing between user-facing ``Variable`` guesses and the
flat NLP vector the solvers consume.

Semantics match the reference's adapter glue
(``/root/reference/pockit/optimizer/_common.py:9-63``): a guess is either
one ``Variable`` (single phase, no statics) or a list of per-phase
``Variable`` s with the static-parameter iterable appended; results come
back in the same shape with FIXED/FUNC boundary values substituted.
"""

from __future__ import annotations

from typing import Type

import numpy as np

from pockit_tpu.base.system import SystemBase
from pockit_tpu.base.variable import VariableBase


def _guess_parts(system: SystemBase, guess):
    """Normalize a guess into ``(phase_parts, statics_or_None, was_single)``
    after shape-checking it against the system layout."""
    was_single = isinstance(guess, VariableBase)
    parts = [guess] if was_single else list(guess)

    want = system.n_p + (1 if system.n_s else 0)
    if len(parts) != want:
        layout = f"{system.n_p} phase Variable(s)"
        if system.n_s:
            layout += " followed by the static-parameter values"
        raise ValueError(
            f"guess has {len(parts)} entries but this system expects "
            f"{want}: {layout}"
        )
    statics = parts.pop() if system.n_s else None
    return parts, statics, was_single


def preprocess(system: SystemBase, guess):
    """Flatten a guess into one NLP vector; returns ``(x0, was_single)``."""
    if not system.ok:
        raise ValueError(
            "system setup is incomplete: set phases and an objective first"
        )
    parts, statics, was_single = _guess_parts(system, guess)

    x0 = np.zeros(system.L)
    for part, lo, hi in zip(parts, system.l_p, system.r_p):
        x0[lo:hi] = part.data
    if statics is not None:
        x0[system.l_s : system.r_s] = np.asarray(list(statics), dtype=np.float64)
    return x0, was_single


def postprocess(
    Variable: Type[VariableBase],
    system: SystemBase,
    x: np.ndarray,
    guess_is_variable: bool,
):
    """Substitute boundary values back into the solution vector and rewrap
    it as per-phase ``Variable`` objects (plus the static array)."""
    x = np.array(x, dtype=np.float64)
    statics = x[system.l_s : system.r_s]
    wrapped = []
    for phase, lo, hi in zip(system.p, system.l_p, system.r_p):
        x[lo:hi] = phase._apply_bc_host(x[lo:hi], statics)
        wrapped.append(Variable(phase, x[lo:hi]))
    if system.n_s:
        wrapped.append(statics)
    return wrapped[0] if guess_is_variable else wrapped
