"""Finite-difference oracle tests for the jitted NLP functions.

Mirrors the reference's strongest correctness gate
(``tests/test_radau/test_derivative_radau.py``): one deliberately messy
system — trig dynamics, FUNC boundary conditions of statics, two integrals,
path constraints, system constraints — whose gradient, Jacobian, and
Lagrangian Hessian must match central finite differences. Directional
probes (a handful of random directions) keep the number of NLP evaluations
small while still exercising every entry through random mixing.
"""

import numpy as np
import pytest
import sympy as sp

import pockit_tpu.lobatto as lobatto
import pockit_tpu.radau as radau


def _messy_system(mod):
    system = mod.System(["a", "b"])
    a, b = system.s
    phase = system.new_phase(["x", "y"], ["u"])
    x, y = phase.x
    (u,) = phase.u
    t = phase.t
    phase.set_dynamics([sp.sin(y) * x + u * sp.cos(t), x * y + a * u])
    phase.set_integral([x**2 + u**2, sp.exp(-(y**2)) + b * x])
    phase.set_phase_constraint(
        [x * u + y, u**2 + a], [-1.0, -np.inf], [1.0, 2.0]
    )
    phase.set_boundary_condition(
        [1.0, a + b**2], [None, 0.5], 0, sp.sqrt(a**2 + 1)
    )
    phase.set_discretization(np.array([0.0, 0.35, 1.0]), np.array([4, 5]))
    system.set_phase([phase])
    I0, I1 = phase.I
    system.set_objective(I0 + 2 * I1 + a * b + a**2)
    system.set_system_constraint(
        [I0 * I1 + a, I1 - b**2], [0.0, -1.0], [3.0, 1.0]
    )
    return system, phase


@pytest.fixture(params=[lobatto, radau], ids=["lobatto", "radau"], scope="module")
def sys_phase(request):
    return _messy_system(request.param)


def _rand_z(system, seed=0):
    rng = np.random.default_rng(seed)
    z = rng.uniform(0.3, 1.2, system.L)
    for i, p in enumerate(system.p):
        z[system.l_p[i] + p.L - 2] = 0.1
        z[system.l_p[i] + p.L - 1] = 1.4
    return z


def _directions(n, k=5, seed=7):
    rng = np.random.default_rng(seed)
    V = rng.normal(size=(k, n))
    return V / np.linalg.norm(V, axis=1, keepdims=True)


def test_constraint_count_and_order(sys_phase):
    system, phase = sys_phase
    c = system.constraints(_rand_z(system))
    m = 2 + phase.n_x * phase.d.L_d + phase.n_c * phase.L_m
    assert c.shape == (m,)
    assert len(system.c_lb) == m == len(system.c_ub)
    assert len(system.v_lb) == system.L == len(system.v_ub)


def test_gradient_vs_fd(sys_phase):
    system, _ = sys_phase
    z = _rand_z(system)
    g = system.gradient(z)
    eps = 1e-6
    for v in _directions(system.L):
        fd = (system.objective(z + eps * v) - system.objective(z - eps * v)) / (
            2 * eps
        )
        np.testing.assert_allclose(g @ v, fd, rtol=1e-6, atol=1e-8)


def test_jacobian_vs_fd(sys_phase):
    system, _ = sys_phase
    z = _rand_z(system)
    J = system.jacobian(z)
    eps = 1e-6
    for v in _directions(system.L, seed=11):
        fd = (system.constraints(z + eps * v) - system.constraints(z - eps * v)) / (
            2 * eps
        )
        np.testing.assert_allclose(J @ v, fd, rtol=1e-5, atol=1e-7)


def test_hessian_vs_fd(sys_phase):
    system, _ = sys_phase
    z = _rand_z(system)
    m = len(system.c_lb)
    rng = np.random.default_rng(3)
    lam = rng.normal(size=m)
    fct_o = 0.7
    H = system.hessian(z, lam, fct_o)
    np.testing.assert_allclose(H, H.T, atol=1e-9)

    def lag_grad(v):
        return fct_o * system.gradient(v) + lam @ system.jacobian(v)

    eps = 1e-6
    for v in _directions(system.L, seed=13, k=4):
        fd = (lag_grad(z + eps * v) - lag_grad(z - eps * v)) / (2 * eps)
        np.testing.assert_allclose(H @ v, fd, rtol=5e-5, atol=1e-6)


def test_fixed_bc_substitution(sys_phase):
    """FIXED/FUNC boundary entries must not influence the NLP (dead vars)."""
    system, phase = sys_phase
    z = _rand_z(system)
    z2 = z.copy()
    z2[phase.l_v[0]] += 123.0  # x front (FIXED 1.0)
    z2[phase.l_v[1]] += 55.0  # y front (FUNC of statics)
    z2[phase.r_v[1] - 1] -= 7.0  # y back (FIXED 0.5)
    z2[phase.L - 2] += 3.0  # t_0 (FIXED 0)
    z2[phase.L - 1] -= 2.0  # t_f (FUNC)
    np.testing.assert_allclose(
        system.objective(z), system.objective(z2), rtol=1e-12
    )
    np.testing.assert_allclose(
        system.constraints(z), system.constraints(z2), rtol=1e-12
    )


def test_func_bc_couples_statics(sys_phase):
    """FUNC boundary conditions must make the NLP depend on the statics."""
    system, _ = sys_phase
    z = _rand_z(system)
    g = system.gradient(z)
    assert abs(g[system.l_s]) > 1e-8
