"""FD oracle over a multi-phase system with cross-phase couplings."""

import numpy as np
import pytest
import sympy as sp

import pockit_tpu.radau as radau


def _system():
    system = radau.System(["k", "x_link"])
    k, x_link = system.s
    p1 = system.new_phase(["a"], ["u"])
    (a1,) = p1.x
    (u1,) = p1.u
    p1.set_dynamics([-k * a1 + u1])
    p1.set_integral([a1**2 + u1**2])
    p1.set_boundary_condition([1.0], [x_link], 0.0, 0.4)
    p1.set_discretization(2, 5)

    p2 = system.new_phase(["b"], ["w"])
    (b2,) = p2.x
    (w2,) = p2.u
    p2.set_dynamics([sp.sin(b2) + k * w2])
    p2.set_integral([b2**2])
    p2.set_phase_constraint([b2 * w2], [-1.0], [1.0])
    p2.set_boundary_condition([x_link], [None], 0.4, sp.sqrt(1 + k**2))
    p2.set_discretization(2, 4)

    system.set_phase([p1, p2])
    system.set_objective(p1.I[0] + 2 * p2.I[0] + k**2)
    system.set_system_constraint([p1.I[0] * p2.I[0]], [-5.0], [5.0])
    return system


def _dirs(n, k=4, seed=3):
    rng = np.random.default_rng(seed)
    V = rng.normal(size=(k, n))
    return V / np.linalg.norm(V, axis=1, keepdims=True)


def test_multiphase_gradient_jacobian_hessian_vs_fd():
    system = _system()
    rng = np.random.default_rng(0)
    z = rng.uniform(0.4, 1.1, system.L)
    g = system.gradient(z)
    J = system.jacobian(z)
    m = len(system.c_lb)
    lam = rng.normal(size=m)
    H = system.hessian(z, lam, 0.9)
    np.testing.assert_allclose(H, H.T, atol=1e-9)

    eps = 1e-6
    for v in _dirs(system.L):
        fd_g = (system.objective(z + eps * v) - system.objective(z - eps * v)) / (
            2 * eps
        )
        np.testing.assert_allclose(g @ v, fd_g, rtol=1e-6, atol=1e-8)
        fd_J = (
            system.constraints(z + eps * v) - system.constraints(z - eps * v)
        ) / (2 * eps)
        np.testing.assert_allclose(J @ v, fd_J, rtol=2e-5, atol=1e-7)

        def lag_grad(w):
            return 0.9 * system.gradient(w) + lam @ system.jacobian(w)

        fd_H = (lag_grad(z + eps * v) - lag_grad(z - eps * v)) / (2 * eps)
        np.testing.assert_allclose(H @ v, fd_H, rtol=5e-5, atol=5e-6)
