"""Randomized stress: small random OCPs through the full stack.

Each case builds a random linear-quadratic-ish OCP (random stable linear
dynamics, quadratic cost, random fixed/free boundary conditions, optional
control bounds), solves it with the native interior-point solver, and
cross-checks the objective against scipy trust-constr on the same NLP.
Seeded and deterministic.
"""

import numpy as np
import pytest
import sympy as sp

import pockit_tpu.lobatto as lobatto
import pockit_tpu.radau as radau
from pockit_tpu.optimizer import ipm, scipy as opt_scipy
from pockit_tpu.solver import IPOptions


def _random_ocp(seed):
    rng = np.random.default_rng(seed)
    mod = lobatto if rng.random() < 0.5 else radau
    n_x = int(rng.integers(1, 3))
    n_u = int(rng.integers(1, 3))
    system = mod.System(0)
    phase = system.new_phase(n_x, n_u)
    xs, us = phase.x, phase.u

    # stable-ish random linear dynamics
    A = rng.normal(0, 1, (n_x, n_x)) - 1.5 * np.eye(n_x)
    Bm = rng.normal(0, 1, (n_x, n_u))
    dyn = []
    for i in range(n_x):
        expr = sum(A[i, j] * xs[j] for j in range(n_x)) + sum(
            Bm[i, j] * us[j] for j in range(n_u)
        )
        dyn.append(expr)
    phase.set_dynamics(dyn)
    phase.set_integral(
        [sum(x_**2 for x_ in xs) + 0.1 * sum(u_**2 for u_ in us)]
    )

    if rng.random() < 0.5:  # control box
        phase.set_phase_constraint(
            list(us), [-2.0] * n_u, [2.0] * n_u
        )

    bc0 = [float(rng.uniform(-1, 1)) for _ in range(n_x)]
    # pick FIXED terminal values by simulating forward with an admissible
    # control, so fixed endpoints are reachable within the control box and
    # the NLP is feasible by construction
    u_star = rng.uniform(-1.0, 1.0, n_u)
    xv = np.array(bc0)
    h = 1.0 / 200
    for _ in range(200):
        f = lambda x_: A @ x_ + Bm @ u_star
        k1 = f(xv)
        k2 = f(xv + h / 2 * k1)
        k3 = f(xv + h / 2 * k2)
        k4 = f(xv + h * k3)
        xv = xv + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    bcf = [
        (float(xv[i]) if rng.random() < 0.5 else None) for i in range(n_x)
    ]
    phase.set_boundary_condition(bc0, bcf, 0.0, 1.0)
    phase.set_discretization(int(rng.integers(2, 5)), int(rng.integers(4, 8)))
    system.set_phase([phase])
    system.set_objective(phase.I[0])
    return mod, system, phase


@pytest.mark.parametrize("seed", range(12))
def test_random_ocp_matches_scipy(seed):
    mod, system, phase = _random_ocp(seed)
    guess = mod.constant_guess(phase, 0.1)
    # rotate barrier strategies so all three code paths stay covered
    strategy = ["monotone", "adaptive", "mehrotra"][seed % 3]
    var, info = ipm.solve(
        system, guess, IPOptions(tol=1e-8, max_iter=200, mu_strategy=strategy)
    )
    assert info["status"] == 0, (seed, info["kkt_error"], info["iterations"])

    guess2 = mod.constant_guess(phase, 0.1)
    _, res = opt_scipy.solve(system, guess2, {"maxiter": 600, "gtol": 1e-10})
    # convex problems: both must find the same optimum
    assert info["obj_val"] == pytest.approx(res.fun, rel=1e-5, abs=1e-7), seed


def _random_head_ocp(seed):
    """Random OCP exercising the Lagrangian head: a static parameter, FUNC
    boundary conditions, a system constraint on an integral, and (half the
    time) an objective nonlinear in the integrals — the configuration
    class where the block path's current-point alpha weighting and the
    cross-term krylov_rank counting are load-bearing."""
    rng = np.random.default_rng(10_000 + seed)
    mod = lobatto if rng.random() < 0.5 else radau
    n_x = int(rng.integers(1, 3))
    system = mod.System(["a"])
    (a,) = system.s
    phase = system.new_phase(n_x, 1)
    xs, (u,) = phase.x, phase.u

    A = rng.normal(0, 1, (n_x, n_x)) - 1.5 * np.eye(n_x)
    Bm = rng.normal(0, 1, (n_x, 1))
    phase.set_dynamics(
        [
            sum(A[i, j] * xs[j] for j in range(n_x)) + Bm[i, 0] * u
            for i in range(n_x)
        ]
    )
    phase.set_integral([sum(x_**2 for x_ in xs) + 0.1 * u**2, u**2])

    bc0 = [float(rng.uniform(-1, 1)) for _ in range(n_x)]
    # first terminal value rides the free static (FUNC BC); others free
    bcf = [a] + [None] * (n_x - 1)
    phase.set_boundary_condition(bc0, bcf, 0.0, 1.0)
    phase.set_discretization(int(rng.integers(2, 4)), int(rng.integers(4, 7)))
    system.set_phase([phase])

    # system constraint on the control-energy integral (feasible: u ~ 0 is
    # admissible because the terminal state floats on the static)
    system.set_system_constraint([phase.I[1]], [0.0], [float(rng.uniform(0.5, 5.0))])

    if rng.random() < 0.5:
        system.set_objective(phase.I[0] + 0.2 * phase.I[0] ** 2 + a**2)
    else:
        system.set_objective(phase.I[0] + 0.3 * a * phase.I[1] + a**2)
    return mod, system, phase


@pytest.mark.parametrize("seed", range(8))
def test_random_lagrangian_head_matches_scipy(seed):
    mod, system, phase = _random_head_ocp(seed)
    from pockit_tpu.solver.structured import structured_layout

    assert structured_layout(system).krylov_rank > 0
    guess = mod.constant_guess(phase, 0.1)
    var, info = ipm.solve(
        system,
        [guess, [0.0]],
        IPOptions(tol=1e-8, max_iter=200, kkt_solver="block"),
    )
    assert info["status"] == 0, (seed, info["kkt_error"], info["iterations"])

    guess2 = mod.constant_guess(phase, 0.1)
    _, res = opt_scipy.solve(
        system, [guess2, [0.0]], {"maxiter": 600, "gtol": 1e-10}
    )
    assert info["obj_val"] == pytest.approx(res.fun, rel=1e-5, abs=1e-7), seed
