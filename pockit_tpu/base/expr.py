"""SymPy -> JAX lowering.

Replaces the reference's symbolic-differentiation + Numba-codegen pipeline
(``/root/reference/pockit/base/fastfunc.py``): user expressions are lowered
once to traceable jax functions; gradients/Hessians come from JAX AD at the
transcription level, so no symbolic derivative generation, CSE, or on-disk
kernel cache is needed — XLA compilation (with its persistent cache) plays
that role.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import sympy as sp


class LoweredFunc:
    """A sympy expression lowered to a broadcasting jax callable.

    Calling convention: ``fn(values)`` with one array (or scalar) per symbol
    in ``symbols``; the result is broadcast to the common input shape, which
    makes constant expressions (lambdify returns a bare Python scalar) safe.
    """

    def __init__(self, expr, symbols: Sequence[sp.Symbol]):
        self.expr = sp.sympify(expr)
        self.symbols = list(symbols)
        free = self.expr.free_symbols
        unknown = free - set(self.symbols)
        if unknown:
            raise ValueError(
                f"expression {self.expr} contains unknown symbols {unknown}"
            )
        self._fn = sp.lambdify(self.symbols, self.expr, modules="jax")

    def __call__(self, values):
        values = list(values)
        if len(values) != len(self.symbols):
            raise ValueError(
                f"expected {len(self.symbols)} arguments, got {len(values)}"
            )
        out = self._fn(*values)
        if values:
            shape = jnp.broadcast_shapes(*[jnp.shape(v) for v in values])
        else:
            shape = ()
        out = jnp.asarray(out)
        if out.shape != shape:
            out = jnp.broadcast_to(out, shape)
        return out

    def __repr__(self):
        return f"LoweredFunc({self.expr})"
