"""Guess flattening / result unflattening shared by all solver adapters
(reference: ``/root/reference/pockit/optimizer/_common.py:9-63``)."""

from __future__ import annotations

from typing import Iterable, Type

import numpy as np

from pockit_tpu.base.system import SystemBase
from pockit_tpu.base.variable import VariableBase


def preprocess(system: SystemBase, guess):
    """Validate the system and flatten the guess into one NLP vector."""
    if not system.ok:
        raise ValueError("system is not fully configured")

    guess_is_variable = isinstance(guess, VariableBase)
    if guess_is_variable:
        guess = [guess]

    if not system.n_s and len(guess) != system.n_p:
        raise ValueError("len(guess) must be equal to the number of phases")
    if system.n_s and len(guess) != system.n_p + 1:
        raise ValueError(
            "len(guess) must be equal to the number of phases + 1 "
            "(for static variables)"
        )

    x_0 = np.zeros(system.L)
    for i in range(system.n_p):
        x_0[system.l_p[i] : system.r_p[i]] = guess[i].data
    if system.n_s > 0:
        x_0[system.l_s : system.r_s] = np.array(list(guess[-1]), dtype=np.float64)
    return x_0, guess_is_variable


def postprocess(
    Variable: Type[VariableBase],
    system: SystemBase,
    x: np.ndarray,
    guess_is_variable: bool,
):
    """Write boundary conditions back into the vector and rewrap as
    per-phase ``Variable`` objects plus the static array."""
    x = np.array(x, dtype=np.float64)
    result = []
    s = x[system.l_s : system.r_s]
    for i in range(system.n_p):
        p = system.p[i]
        x_p = p._apply_bc_host(x[system.l_p[i] : system.r_p[i]], s)
        x[system.l_p[i] : system.r_p[i]] = x_p
        result.append(Variable(p, x_p))
    if system.n_s > 0:
        result.append(s)
    if guess_is_variable:
        return result[0]
    return result
