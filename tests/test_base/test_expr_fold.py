"""Extreme-coefficient exp folding in the sympy->jax lowering.

SymPy splits constant terms out of exponentials (``310*exp(-500*(h-1))``
-> ``4.35e219*exp(-500*h)``); the coefficient is exact in float64 but inf
in float32. ``_fold_extreme_exp_coeffs`` folds it back into the exponent
for codegen (``base/expr.py``).
"""

import numpy as np
import sympy as sp

from pockit_tpu.base.expr import LoweredFunc, _fold_extreme_exp_coeffs


def test_fold_overflowing_coefficient():
    h = sp.Symbol("h")
    expr = 310.0 * sp.exp(-500.0 * (h - 1))  # sympy splits out e^500
    assert any(
        abs(float(a)) > 1e200
        for a in expr.atoms(sp.Float)
    ), "precondition: sympy produced the extreme split form"
    folded = _fold_extreme_exp_coeffs(expr)
    assert not any(abs(float(a)) > 1e30 for a in folded.atoms(sp.Float))

    fn = LoweredFunc(expr, [h])
    for hv in (1.0, 1.013, 0.98):
        got = float(fn([np.float32(hv)]))
        want = 310.0 * np.exp(-500.0 * (hv - 1))
        np.testing.assert_allclose(got, want, rtol=2e-5)


def test_fold_underflowing_coefficient():
    x = sp.Symbol("x")
    expr = 2.0e-40 * sp.exp(x)  # denormal-range coefficient in f32
    folded = _fold_extreme_exp_coeffs(expr)
    floats = [abs(float(a)) for a in folded.atoms(sp.Float)]
    assert all(1e-30 < a < 1e30 for a in floats if a != 0.0)
    fn = LoweredFunc(expr, [x])
    got = float(fn([np.float32(95.0)]))
    np.testing.assert_allclose(got, 2.0e-40 * np.exp(95.0), rtol=2e-5)


def test_fold_negative_coefficient_and_extra_factors():
    v, h = sp.symbols("v h")
    expr = -310.0 * v**2 * sp.exp(500.0) * sp.exp(-500.0 * h)
    fn = LoweredFunc(expr, [v, h])
    got = float(fn([np.float32(0.1), np.float32(1.01)]))
    want = -310.0 * 0.01 * np.exp(-500.0 * 0.01)
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_no_fold_for_ordinary_expressions():
    x = sp.Symbol("x")
    expr = 3.5 * sp.exp(-2.0 * x) + x**2
    assert _fold_extreme_exp_coeffs(expr) == expr


def test_extreme_constant_without_exp_left_alone():
    x = sp.Symbol("x")
    expr = sp.Float(1e40) * x
    assert _fold_extreme_exp_coeffs(expr) == expr


def test_fold_coefficient_beyond_float64_range():
    """A coefficient that overflows float64 (float(c) == inf) must still
    fold via a sympy-precision log instead of math.log(inf) = inf, which
    produced exp(arg + oo) == inf/nan everywhere (advisor r4)."""
    h = sp.Symbol("h")
    expr = sp.sympify(310 * sp.exp(-800 * (h - 1)))  # c = 310*e^800 > 1.8e308
    fn = LoweredFunc(expr, [h])
    got = float(fn([np.float32(1.01)]))
    want = 310.0 * np.exp(-800.0 * 0.01)
    np.testing.assert_allclose(got, want, rtol=2e-5)
