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


def test_structured_falls_back_with_warning():
    system, phase = _orbit()
    (r_f,) = system.s
    system.set_objective(-r_f + 0.0 * phase.I[0] if phase.n_I else -r_f)
    # introduce a system constraint row -> pattern does not apply
    system.set_system_constraint([r_f], [1.0], [2.0])
    # r_f is a plain static symbol -> becomes a bound, NOT a row; use an
    # expression instead
    system.set_system_constraint([r_f**2], [1.0], [4.0])
    guess = lobatto.linear_guess(phase, 1.0)
    guess.x[0] = 1.0 + 0.5 * phase.t_x
    guess.x[1] = 0.1
    guess.x[2] = 1.0
    guess.u[0] = 0.5
    with pytest.warns(UserWarning, match="block-arrow"):
        _, info = ipm.solve(
            system,
            [guess, [1.5]],
            IPOptions(tol=1e-8, max_iter=200, kkt_solver="structured"),
        )
    assert info["status"] == 0
