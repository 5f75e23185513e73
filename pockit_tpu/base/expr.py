"""SymPy -> JAX lowering.

Replaces the reference's symbolic-differentiation + Numba-codegen pipeline
(``/root/reference/pockit/base/fastfunc.py``): user expressions are lowered
once to traceable jax functions; gradients/Hessians come from JAX AD at the
transcription level, so no symbolic derivative generation, CSE, or on-disk
kernel cache is needed — XLA compilation (with its persistent cache) plays
that role.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import sympy as sp

# Numeric coefficients outside this range are folded into an adjacent
# exponential before lambdification (see _fold_extreme_exp_coeffs).
# float32 max is ~3.4e38; 1e30 leaves headroom for downstream products.
_F32_SAFE_MAG = 1e30


class _exp_folded(sp.Function):
    """Opaque stand-in for ``exp`` with NO auto-evaluation rules.

    ``sp.exp`` eagerly splits numeric terms out of its argument
    (``exp(x + 505.7) -> 4.3e219 * exp(x)``), which re-creates the exact
    overflow _fold_extreme_exp_coeffs removes as soon as ``replace``
    rebuilds the parent nodes. This subclass carries no such rule, so the
    folded form survives symbolic rebuilding; lambdify maps it back to
    ``jnp.exp``.
    """

    nargs = 1


def _fold_extreme_exp_coeffs(expr):
    """Rewrite ``c*exp(y) -> sign(c)*exp(y + ln|c|)`` for |c| outside the
    float32-safe magnitude range.

    SymPy auto-distributes float coefficients and splits constant terms out
    of exponentials: ``310*exp(-500*(h-1))`` becomes
    ``4.35e219*exp(-500*h)``, whose coefficient is exact in float64 but
    overflows to inf in float32, poisoning every dynamics evaluation (the
    3-phase Goddard gate dies at iteration 0 on chip). Folding the
    coefficient back into the exponent is exact up to one float64 rounding
    of the log and keeps every intermediate in range. The folded result
    uses ``_exp_folded`` so SymPy cannot re-split it; it is built for
    lambdification only, never re-entered into symbolic rewriting.
    """

    def _is_extreme(coeff) -> bool:
        if not coeff.is_Number or not coeff.is_finite or coeff == 0:
            return False
        # float() may overflow to inf for coefficients beyond float64
        # range (e.g. exp-splitting of steep exponentials); those are
        # exactly the coefficients that MUST be folded, so inf counts as
        # extreme — the log below is taken at sympy precision, not via
        # the overflowed float
        c = abs(float(coeff))
        return c > _F32_SAFE_MAG or c < 1.0 / _F32_SAFE_MAG

    def _fold(m):
        coeff, rest = m.as_coeff_Mul()
        if not _is_extreme(coeff):
            return m
        factors = sp.Mul.make_args(rest)
        exps = [f for f in factors if isinstance(f, sp.exp)]
        if not exps:
            return m  # genuinely out-of-range constant: leave untouched
        e = exps[0]
        others = [f for f in factors if f is not e]
        # log at sympy/mpmath precision: float64 overflows (|c| > ~1.8e308)
        # would give math.log(inf) = inf and fold to exp(arg + oo) — wrong
        # everywhere even where the true value is representable
        logc_sym = sp.log(abs(coeff)).evalf()
        if not logc_sym.is_finite:
            return m  # zero/degenerate coefficient: leave untouched
        logc = sp.Float(logc_sym)
        folded = _exp_folded(e.args[0] + logc)
        sign = [] if coeff > 0 else [sp.Integer(-1)]
        return sp.Mul(*sign, *others, folded)

    return expr.replace(lambda node: node.is_Mul, _fold)


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
        # fold float32-overflowing exp coefficients for codegen only;
        # self.expr keeps the canonical evaluated form for symbolic use
        self._fn = sp.lambdify(
            self.symbols,
            _fold_extreme_exp_coeffs(self.expr),
            modules=[{"_exp_folded": jnp.exp}, "jax"],
        )

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
