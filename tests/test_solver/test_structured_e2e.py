"""End-to-end: the structured KKT solver must reproduce the dense path's
convergence on a real problem (orbit transfer, uniform LGL mesh)."""

import numpy as np
import pytest
import sympy as sp

import pockit_tpu.lobatto as lobatto
from pockit_tpu.optimizer import ipm
from pockit_tpu.solver import IPOptions


def _orbit():
    system = lobatto.System(["r_f"])
    (r_f,) = system.s
    phase = system.new_phase(["r", "u", "v"], ["phi"])
    r, u, v = phase.x
    (phi,) = phase.u
    t = phase.t
    acc = 0.1405 / (1 - 0.0749 * t)
    phase.set_dynamics(
        [u, v**2 / r - 1 / r**2 + acc * sp.sin(phi), -u * v / r + acc * sp.cos(phi)]
    )
    phase.set_boundary_condition(
        [1.0, 0.0, 1.0], [r_f, 0.0, 1 / sp.sqrt(r_f)], 0.0, 3.32
    )
    phase.set_discretization(12, 7)
    system.set_phase([phase])
    system.set_objective(-r_f)
    return system, phase


def _solve(mode):
    system, phase = _orbit()
    guess = lobatto.linear_guess(phase, 1.0)
    guess.x[0] = 1.0 + 0.5 * phase.t_x
    guess.x[1] = 0.1
    guess.x[2] = 1.0
    guess.u[0] = 0.5
    opts = IPOptions(tol=1e-8, max_iter=200, kkt_solver=mode)
    return ipm.solve(system, [guess, [1.5]], opts)


def test_structured_matches_dense_end_to_end():
    (_, s_d), info_d = _solve("dense")
    (_, s_s), info_s = _solve("structured")
    assert info_d["status"] == 0 and info_s["status"] == 0
    assert info_s["obj_val"] == pytest.approx(info_d["obj_val"], abs=1e-9)
    # identical linear algebra -> identical iteration count
    assert info_s["iterations"] == info_d["iterations"]


def test_structured_with_system_constraint_row():
    """System-constraint rows couple densely outside the pattern; the
    Krylov-corrected structured path must still solve them."""
    system, phase = _orbit()
    (r_f,) = system.s
    system.set_system_constraint([r_f**2], [1.0, ], [2.25])
    guess = lobatto.linear_guess(phase, 1.0)
    guess.x[0] = 1.0 + 0.5 * phase.t_x
    guess.x[1] = 0.1
    guess.x[2] = 1.0
    guess.u[0] = 0.5
    (_, s_d), info_d = (
        ipm.solve(system, [guess, [1.5]], IPOptions(tol=1e-8, max_iter=200))
    )
    guess2 = lobatto.linear_guess(phase, 1.0)
    guess2.x[0] = 1.0 + 0.5 * phase.t_x
    guess2.x[1] = 0.1
    guess2.x[2] = 1.0
    guess2.u[0] = 0.5
    (_, s_s), info_s = ipm.solve(
        system,
        [guess2, [1.5]],
        IPOptions(tol=1e-8, max_iter=200, kkt_solver="structured"),
    )
    assert info_d["status"] == 0 and info_s["status"] == 0
    # active constraint: r_f <= 1.5 binds (unconstrained optimum ~1.5253)
    assert float(s_d[0]) == pytest.approx(1.5, abs=1e-6)
    assert info_s["obj_val"] == pytest.approx(info_d["obj_val"], abs=1e-8)


def test_structured_handles_ragged_degrees():
    """Non-uniform interval degrees ride the structured path via phantom
    padding (no dense fallback, no warning) and match the dense solve."""
    import warnings

    system, phase = _orbit()
    phase.set_discretization(np.array([0.0, 0.4, 1.0]), np.array([6, 8]))
    system.update()
    guess = lobatto.linear_guess(phase, 1.0)
    guess.x[0] = 1.0 + 0.5 * phase.t_x
    guess.x[1] = 0.1
    guess.x[2] = 1.0
    guess.u[0] = 0.5
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any fallback warning is a failure
        _, info = ipm.solve(
            system,
            [guess, [1.5]],
            IPOptions(tol=1e-8, max_iter=200, kkt_solver="structured"),
        )
    assert info["status"] == 0
    _, info_d = ipm.solve(
        system,
        [guess, [1.5]],
        IPOptions(tol=1e-8, max_iter=200, kkt_solver="dense"),
    )
    assert abs(info["obj_val"] - info_d["obj_val"]) < 1e-9
