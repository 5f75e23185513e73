"""Property tests for the dense discretization operators.

Core invariant (reference transcription, ``phasebase.py:969-973``): for a
smooth trajectory x(τ) on the scaled domain τ ∈ [0, 1],

    T_v @ x(t_x)  ==  I_m @ x'(t_m)

because each interval's translation rows are ``x_j - x_right`` and the
integration matrix integrates from the right end backwards.
"""

import numpy as np
import pytest

from pockit_tpu.base.discretization import Discretization
from pockit_tpu.numerics.layout import lr_c, lr_nc


MESHES = [
    (np.linspace(0, 1, 6), np.full(5, 6)),
    (np.array([0.0, 0.1, 1.0]), np.array([4, 7])),
    (np.array([0.0, 0.3, 0.55, 1.0]), np.array([3, 5, 8])),
]


@pytest.mark.parametrize("family", ["lobatto", "radau"])
@pytest.mark.parametrize("mesh,num_point", MESHES)
def test_translation_equals_integration_of_derivative(family, mesh, num_point):
    d = Discretization(family, mesh, num_point, n_x=1, n_u=1)
    x_fn = lambda t: t**3 - 2 * t**2 + 0.5 * t + 1.0
    dx_fn = lambda t: 3 * t**2 - 4 * t + 0.5
    lhs = d.T_v @ x_fn(d.t_x)
    rhs = d.I_m @ dx_fn(d.t_m)
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


@pytest.mark.parametrize("family", ["lobatto", "radau"])
@pytest.mark.parametrize("mesh,num_point", MESHES)
def test_aug_translation_equals_integration(family, mesh, num_point):
    d = Discretization(family, mesh, num_point, n_x=2, n_u=0)
    x_fn = lambda t: np.sin(1.3 * t) + t**2
    dx_fn = lambda t: 1.3 * np.cos(1.3 * t) + 2 * t
    # interpolate variable values to the augmented grid, then translate
    lhs = d.T_x_aug_v @ x_fn(d.t_x)
    rhs = d.I_m_aug @ dx_fn(d.t_m_aug)
    # intervals with as few as 3 points -> truncation error dominates;
    # this residual IS the mesh-refinement error signal, so only require
    # it to be small, not exact
    np.testing.assert_allclose(lhs, rhs, atol=1e-3)
    # V_x_aug reproduces values on the augmented grid to truncation error
    interp = d.V_x_aug @ x_fn(d.t_x)
    np.testing.assert_allclose(interp, x_fn(d.t_m_aug), atol=1e-3)


@pytest.mark.parametrize("family", ["lobatto", "radau"])
def test_aug_exact_for_polynomials(family):
    mesh = np.array([0.0, 0.4, 1.0])
    num_point = np.array([4, 5])
    d = Discretization(family, mesh, num_point, n_x=1, n_u=1)
    x_fn = lambda t: t**3 + t
    dx_fn = lambda t: 3 * t**2 + 1
    np.testing.assert_allclose(
        d.T_x_aug_v @ x_fn(d.t_x), d.I_m_aug @ dx_fn(d.t_m_aug), atol=1e-12
    )
    np.testing.assert_allclose(d.V_x_aug @ x_fn(d.t_x), x_fn(d.t_m_aug), atol=1e-12)
    np.testing.assert_allclose(d.V_u_aug @ x_fn(d.t_u), x_fn(d.t_m_aug), atol=1e-12)


def test_lobatto_layout():
    mesh = np.array([0.0, 0.1, 1.0])
    num_point = np.array([2, 3])
    d = Discretization("lobatto", mesh, num_point, n_x=2, n_u=1)
    assert d.L_x_var == d.L_u_var == d.L_m == 2 + 3 - 1
    assert d.L_d == 1 + 2
    assert d.L == 3 * 4 + 2
    np.testing.assert_array_equal(d.l_v, [0, 4, 8])
    np.testing.assert_array_equal(d.r_v, [4, 8, 12])
    np.testing.assert_array_equal(d.l_m, [0, 1])
    np.testing.assert_array_equal(d.r_m, [2, 4])
    # nodes: interval 1 is [0, 0.1] with LGL(2) = {0, 0.1};
    # interval 2 is [0.1, 1] with LGL(3) = {0.1, 0.55, 1}
    np.testing.assert_allclose(d.t_m, [0.0, 0.1, 0.55, 1.0], atol=1e-15)
    # weights: [0.05, 0.05 + 0.15, 0.6, 0.15]
    np.testing.assert_allclose(d.w_m, [0.05, 0.2, 0.6, 0.15], atol=1e-14)
    assert d.mstage_has_back


def test_radau_layout():
    mesh = np.array([0.0, 0.1, 1.0])
    num_point = np.array([2, 3])
    d = Discretization("radau", mesh, num_point, n_x=1, n_u=2)
    assert d.L_m == 5
    assert d.L_x_var == 6 and d.L_u_var == 5
    assert d.L_d == 5
    assert d.L == 6 + 2 * 5 + 2
    np.testing.assert_array_equal(d.l_v, [0, 6, 11])
    np.testing.assert_array_equal(d.r_v, [6, 11, 16])
    np.testing.assert_array_equal(d.l_m, [0, 2])
    np.testing.assert_array_equal(d.r_m, [2, 5])
    assert d.t_x[-1] == 1.0
    assert not d.mstage_has_back
    # state_to_mid drops the terminal point
    x = np.arange(6.0)
    np.testing.assert_array_equal(d.state_to_mid(x), np.arange(5.0))
    # w_m sums to 1 (the scaled domain length)
    np.testing.assert_allclose(d.w_m.sum(), 1.0, atol=1e-14)


@pytest.mark.parametrize("family", ["lobatto", "radau"])
def test_integral_weights_quadrature(family):
    mesh = np.array([0.0, 0.25, 0.6, 1.0])
    num_point = np.array([5, 6, 4])
    d = Discretization(family, mesh, num_point, n_x=1, n_u=0)
    f = lambda t: t**4 - t
    np.testing.assert_allclose(d.w_m @ f(d.t_m), 1 / 5 - 1 / 2, atol=1e-13)


def test_index_helpers():
    np.testing.assert_array_equal(lr_c(np.array([3, 4, 2]))[0], [0, 2, 5])
    np.testing.assert_array_equal(lr_c(np.array([3, 4, 2]))[1], [3, 6, 7])
    np.testing.assert_array_equal(lr_nc(np.array([3, 4, 2]))[0], [0, 3, 7])
    np.testing.assert_array_equal(lr_nc(np.array([3, 4, 2]))[1], [3, 7, 9])
