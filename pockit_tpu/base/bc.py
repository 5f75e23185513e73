"""Boundary-condition descriptors (reference: ``phasebase.py:18-35``)."""

from __future__ import annotations

from enum import Enum
from typing import NamedTuple, Optional, Union

import sympy as sp

from pockit_tpu.base.expr import LoweredFunc


class BcType(Enum):
    """Type of a boundary condition."""

    FREE = 0
    FIXED = 1
    FUNC = 2  # a function of static parameters


class BcInfo(NamedTuple):
    """One boundary condition: its type and value (``None`` for FREE, a float
    for FIXED, a ``LoweredFunc`` of the static parameters for FUNC)."""

    t: BcType
    v: Optional[Union[float, LoweredFunc]]


def parse_boundary_condition(bc, static_symbols) -> BcInfo:
    """Classify a user-provided boundary condition (reference:
    ``phasebase.py:420-438``)."""
    if bc is None:
        return BcInfo(BcType.FREE, None)
    if isinstance(bc, (int, float)):
        return BcInfo(BcType.FIXED, float(bc))
    if isinstance(bc, sp.Expr):
        if bc.is_number:
            return BcInfo(BcType.FIXED, float(bc))
        return BcInfo(BcType.FUNC, LoweredFunc(bc, static_symbols))
    raise ValueError("boundary condition must be None, a number, or sympy.Expr")
