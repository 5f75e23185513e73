"""End-to-end parity gates on the README LQR problem.

The reference solves this with IPOPT to objective 0.2319139744522318
(``/root/reference/README.md:93``); we must match to <= 1e-6 (BASELINE.md
target) — in float64 we match to ~1e-11.
"""

import numpy as np
import pytest

import pockit_tpu.lobatto as lobatto
import pockit_tpu.radau as radau
from pockit_tpu.optimizer import ipm

LQR_OBJECTIVE = 0.2319139744522318


def _build_lqr(mod, mesh=10, num_point=10):
    a, b, s_, q, r = -1, 1, 1, 1, 0.1
    system = mod.System(["x_f"])
    (x_f,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([a * x + b * u])
    phase.set_integral([q * x**2 + r * u**2])
    phase.set_boundary_condition([1], [x_f], 0, 1)
    phase.set_discretization(mesh, num_point)
    system.set_phase([phase])
    system.set_objective(phase.I[0] + s_ * x_f**2 / 2)
    return system, phase


@pytest.mark.parametrize("mod", [lobatto, radau], ids=["lobatto", "radau"])
def test_lqr_objective_matches_reference(mod):
    system, phase = _build_lqr(mod)
    guess = mod.constant_guess(phase, 0)
    [var_p, var_s], info = ipm.solve(system, [guess, [0.0]])
    assert info["status"] == 0, info
    assert abs(info["obj_val"] - LQR_OBJECTIVE) < 1e-8
    # solution sanity: x decays from 1, control is negative feedback
    assert abs(var_p.x[0][0] - 1.0) < 1e-12
    assert var_p.x[0][-1] == pytest.approx(float(var_s[0]), abs=1e-9)
    # interpolation round trip at the nodes
    V = var_p.V_x(var_p.t_x)
    np.testing.assert_allclose(V @ var_p.x[0], var_p.x[0], atol=1e-9)


def test_lqr_analytic_riccati():
    """Check the trajectory against the analytic Riccati solution."""
    system, phase = _build_lqr(lobatto, mesh=12, num_point=10)
    guess = lobatto.constant_guess(phase, 0)
    [var_p, var_s], info = ipm.solve(system, [guess, [0.0]])
    assert info["status"] == 0

    # analytic solution via the Riccati ODE. The objective
    #   J = ∫ (q x² + r u²) dt + (s/2) x_f²
    # is the standard form J = ½[∫ (Q x² + R u²) + S x_f²] with
    # Q = 2q, R = 2r, S = s, so
    #   -P' = 2 a P - P² b²/R + Q,  P(1) = S,  u* = -(b P / R) x
    a, b, Q, R, S = -1.0, 1.0, 2.0, 0.2, 1.0
    n_steps = 20000
    h = 1.0 / n_steps
    P = S
    Ps = [P]
    for _ in range(n_steps):  # integrate backwards from t=1
        f = lambda P_: -(2 * a * P_ - P_**2 * b**2 / R + Q)
        k1 = f(P)
        k2 = f(P - h / 2 * k1)
        k3 = f(P - h / 2 * k2)
        k4 = f(P - h * k3)
        P = P - h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        Ps.append(P)
    Ps = np.array(Ps[::-1])  # P on uniform grid over [0, 1]
    # optimal cost J* = ½ P(0) x(0)²; closed loop x' = (a - b² P / R) x
    assert abs(0.5 * Ps[0] - LQR_OBJECTIVE) < 1e-9
    x = 1.0
    xs = [x]
    for k in range(n_steps):
        Pk = Ps[k]
        Pk1 = Ps[k + 1]
        Pm = 0.5 * (Pk + Pk1)
        f = lambda x_, P_: (a - b**2 * P_ / R) * x_
        k1 = f(x, Pk)
        k2 = f(x + h / 2 * k1, Pm)
        k3 = f(x + h / 2 * k2, Pm)
        k4 = f(x + h * k3, Pk1)
        x = x + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        xs.append(x)
    xs = np.array(xs)

    # compare state trajectory at collocation nodes
    t_nodes = var_p._t_x
    x_ref = np.interp(t_nodes, np.linspace(0, 1, n_steps + 1), xs)
    np.testing.assert_allclose(var_p.x[0], x_ref, atol=5e-6)
    # terminal value matches the free parameter
    assert abs(float(var_s[0]) - xs[-1]) < 5e-6


def test_lqr_warm_start_fewer_iterations():
    system, phase = _build_lqr(lobatto)
    guess = lobatto.constant_guess(phase, 0)
    [var_p, var_s], info1 = ipm.solve(system, [guess, [0.0]])
    [_, _], info2 = ipm.solve(system, [var_p, var_s])
    assert info2["iterations"] <= info1["iterations"]
    assert abs(info2["obj_val"] - LQR_OBJECTIVE) < 1e-8
