"""Tests for barycentric Lagrange value/derivative/integration matrices."""

import numpy as np
import pytest

from pockit_tpu.numerics import (
    V_interpolation,
    D_interpolation,
    differentiation_matrix,
    integral_matrix,
    lagrange_values,
    polynomial_coefficients,
    xw_lgl,
    xw_lgr,
)


def test_lagrange_values_exact_at_nodes():
    nodes = np.array([-1.0, -0.3, 0.2, 1.0])
    V = lagrange_values(nodes, nodes)
    np.testing.assert_allclose(V, np.eye(4), atol=1e-14)


def test_lagrange_values_reproduce_polynomials():
    nodes, _ = xw_lgl(6)
    pts = np.linspace(-1, 1, 37)
    V = lagrange_values(pts, nodes)
    for deg in range(6):
        np.testing.assert_allclose(V @ nodes**deg, pts**deg, atol=1e-12)


def test_differentiation_matrix_polynomials():
    nodes, _ = xw_lgl(7)
    D = differentiation_matrix(nodes)
    for deg in range(1, 7):
        np.testing.assert_allclose(
            D @ nodes**deg, deg * nodes ** (deg - 1), atol=1e-11
        )
    np.testing.assert_allclose(D @ np.ones_like(nodes), 0.0, atol=1e-12)


def test_V_interpolation_sin():
    x_old = np.linspace(0.0, 2.0, 12)
    x_new = np.linspace(0.0, 2.0, 55)
    V = V_interpolation(x_old, x_new)
    np.testing.assert_allclose(V @ np.sin(x_old), np.sin(x_new), atol=1e-8)


def test_D_interpolation_sin():
    x_old = np.linspace(0.0, 2.0, 14)
    x_new = np.linspace(0.0, 2.0, 55)
    D = D_interpolation(x_old, x_new)
    np.testing.assert_allclose(D @ np.sin(x_old), np.cos(x_new), atol=1e-7)


def test_V_D_interpolation_edge_cases():
    x_old = np.array([0.5])
    assert V_interpolation(x_old, np.array([0.1, 0.9])).shape == (2, 1)
    np.testing.assert_allclose(
        V_interpolation(x_old, np.array([0.1])), [[1.0]]
    )
    np.testing.assert_allclose(
        D_interpolation(x_old, np.array([0.1])), [[0.0]]
    )
    assert V_interpolation(np.array([0.0, 1.0]), np.array([])).shape == (0, 2)


@pytest.mark.parametrize("xw", [xw_lgl, xw_lgr])
@pytest.mark.parametrize("n", [2, 4, 8, 10])
def test_integral_matrix_from_one_backwards(xw, n):
    """(I @ f)[k] must equal the antiderivative from +1 down to node k."""
    x, _ = xw(n)
    I = integral_matrix(x, x)
    # f(t) = t^d   ->  ∫_1^x f = (x^{d+1} - 1) / (d + 1)
    for deg in range(n):
        expected = (x ** (deg + 1) - 1.0) / (deg + 1)
        np.testing.assert_allclose(I @ x**deg, expected, atol=1e-12)
    # integral at x = 1 is zero by convention
    I_at_1 = integral_matrix(x, np.array([1.0]))
    np.testing.assert_allclose(I_at_1, 0.0, atol=1e-14)


def test_integral_matrix_rejects_duplicate_nodes():
    with pytest.raises(ValueError):
        integral_matrix(np.array([0.0, 0.0, 1.0]), np.array([0.5]))


def test_polynomial_coefficients_roots_roundtrip():
    nodes, _ = xw_lgl(5)
    P = polynomial_coefficients(nodes)
    # y = values of (x - 0.3)(x + 0.6) at the nodes
    y = (nodes - 0.3) * (nodes + 0.6)
    coef = P @ y
    roots = np.sort(np.roots(coef[np.abs(coef) > 1e-12]))
    np.testing.assert_allclose(roots, [-0.6, 0.3], atol=1e-10)
