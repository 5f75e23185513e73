"""Brachistochrone with free final time against the analytic cycloid.

Minimum-time descent from (0,0) to (2,2) under gravity g = 10:
states (x, y, v), control theta;
    x' = v sin(theta), y' = v cos(theta), v' = g cos(theta)
(y measured downward). The optimal curve is the cycloid
    x = R (phi - sin phi), y = R (1 - cos phi),  T = phi_f sqrt(R / g).
"""

import numpy as np
import pytest
import sympy as sp

import pockit_tpu.radau as radau
import pockit_tpu.lobatto as lobatto
from pockit_tpu.optimizer import ipm

G = 10.0
X_F = 2.0
Y_F = 2.0


def _analytic_time():
    # solve (1 - cos phi) / (phi - sin phi) = Y_F / X_F by bisection
    target = Y_F / X_F
    lo, hi = 1e-6, 2 * np.pi - 1e-6
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        val = (1 - np.cos(mid)) / (mid - np.sin(mid))
        if val > target:
            lo = mid
        else:
            hi = mid
    phi_f = 0.5 * (lo + hi)
    R = X_F / (phi_f - np.sin(phi_f))
    return phi_f * np.sqrt(R / G)


@pytest.mark.parametrize("mod", [radau, lobatto], ids=["radau", "lobatto"])
def test_brachistochrone_free_final_time(mod):
    system = mod.System(0)
    phase = system.new_phase(["x", "y", "v"], ["theta"])
    x, y, v = phase.x
    (theta,) = phase.u
    phase.set_dynamics([v * sp.sin(theta), v * sp.cos(theta), G * sp.cos(theta)])
    phase.set_integral([1])
    phase.set_phase_constraint([theta], [0.0], [np.pi])
    phase.set_boundary_condition([0.0, 0.0, 0.0], [X_F, Y_F, None], 0.0, None)
    phase.set_discretization(10, 8)
    system.set_phase([phase])
    system.set_objective(phase.I[0])

    # the all-defaults guess leaves v = 0 (fixed initial BC), which makes
    # the dynamics Jacobian structurally singular; ramp v like a user would
    guess = mod.linear_guess(phase, 1.0)
    guess.x[2] = 5.0 * phase.t_x
    guess.u[0] = 1.0
    guess.t_f = 1.0
    var, info = ipm.solve(system, guess)
    t_expected = _analytic_time()
    assert info["status"] == 0, info
    assert info["obj_val"] == pytest.approx(t_expected, abs=2e-6)
    assert var.t_f - var.t_0 == pytest.approx(t_expected, abs=2e-6)
    # the mesh is fine enough that the continuous error check passes a
    # loose tolerance and fails a strict one only marginally
    assert phase.check_continuous(var, None, 1e-3, 1e-3)


def test_brachistochrone_refine_loop():
    """solve -> refine -> solve drives the residual below tolerance."""
    system = radau.System(0)
    phase = system.new_phase(["x", "y", "v"], ["theta"])
    x, y, v = phase.x
    (theta,) = phase.u
    phase.set_dynamics([v * sp.sin(theta), v * sp.cos(theta), G * sp.cos(theta)])
    phase.set_integral([1])
    phase.set_boundary_condition([0.0, 0.0, 0.0], [X_F, Y_F, None], 0.0, None)
    phase.set_discretization(3, 6)
    system.set_phase([phase])
    system.set_objective(phase.I[0])

    guess = radau.linear_guess(phase, 1.0)
    guess.x[2] = 5.0 * phase.t_x
    guess.u[0] = 1.0
    guess.t_f = 1.0
    var, info = ipm.solve(system, guess)
    assert info["status"] == 0

    atol = rtol = 1e-7
    for _ in range(6):
        if system.check(var, absolute_tolerance_continuous=atol,
                        relative_tolerance_continuous=rtol):
            break
        var = system.refine(var, absolute_tolerance_continuous=atol,
                            relative_tolerance_continuous=rtol)
        var, info = ipm.solve(system, var)
        assert info["status"] == 0
    assert system.check(var, absolute_tolerance_continuous=atol,
                        relative_tolerance_continuous=rtol)
    assert info["obj_val"] == pytest.approx(_analytic_time(), abs=1e-8)
