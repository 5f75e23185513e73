"""Minimum-time double integrator — the canonical bang-bang problem.

    min T   s.t.  x' = v, v' = u, |u| <= 1,
    x(0) = v(0) = 0,  x(T) = 1, v(T) = 0.

Optimal control: u = +1 for t < T/2, u = -1 after; T* = 2.
Exercises the Radau discontinuous error check and switch-point mesh
refinement (reference: ``phasebase.py:1349-1360, 1580-1828``).
"""

import numpy as np
import pytest

import pockit_tpu.radau as radau
import pockit_tpu.lobatto as lobatto
from pockit_tpu.optimizer import ipm
from pockit_tpu.solver import IPOptions


def _build():
    system = radau.System(0)
    phase = system.new_phase(["x", "v"], ["u"])
    x, v = phase.x
    (u,) = phase.u
    phase.set_dynamics([v, u])
    phase.set_integral([1])
    phase.set_phase_constraint([u], [-1.0], [1.0], bang_bang_control=True)
    phase.set_boundary_condition([0.0, 0.0], [1.0, 0.0], 0.0, None)
    phase.set_discretization(5, 7)
    system.set_phase([phase])
    system.set_objective(phase.I[0])
    return system, phase


def test_bang_bang_solve_and_refine():
    system, phase = _build()
    guess = radau.linear_guess(phase, 0.5)
    guess.t_f = 3.0
    var, info = ipm.solve(system, guess)
    assert info["status"] == 0
    assert info["obj_val"] == pytest.approx(2.0, abs=1e-3)

    # the switch at t = 1 falls inside an interval: discontinuous check
    # must fail, then refinement must place a mesh point near the switch
    assert not phase.check_discontinuous(var)
    var = system.refine(var)
    switch_scaled = 0.5  # t = 1 on the scaled domain
    assert np.min(np.abs(phase._mesh - switch_scaled)) < 2e-2

    var, info = ipm.solve(system, var)
    assert info["status"] == 0
    assert info["obj_val"] == pytest.approx(2.0, abs=2e-4)

    # iterate refine/solve until both checks pass
    for _ in range(4):
        if system.check(var):
            break
        var = system.refine(var)
        var, info = ipm.solve(system, var)
        assert info["status"] == 0
    assert phase.check_discontinuous(var)
    assert info["obj_val"] == pytest.approx(2.0, abs=1e-7)
    # control saturates at the bounds on both arcs
    u = var.u[0]
    t_u = var.t_u
    assert np.all(np.abs(u[(t_u < 0.95)] - 1.0) < 1e-3)
    assert np.all(np.abs(u[(t_u > 1.05)] + 1.0) < 1e-3)


def test_lobatto_rejects_discontinuous_machinery():
    system = lobatto.System(0)
    phase = system.new_phase(["x", "v"], ["u"])
    x, v = phase.x
    (u,) = phase.u
    phase.set_dynamics([v, u])
    phase.set_integral([1])
    phase.set_boundary_condition([0.0, 0.0], [1.0, 0.0], 0.0, None)
    phase.set_discretization(4, 6)
    system.set_phase([phase])
    system.set_objective(phase.I[0])
    guess = lobatto.linear_guess(phase, 0.5)
    with pytest.raises(NotImplementedError):
        phase.check_discontinuous(guess)
    with pytest.raises(NotImplementedError):
        phase.refine_discontinuous(guess)
    with pytest.raises(NotImplementedError):
        system.check_discontinuous(guess)
    with pytest.raises(NotImplementedError):
        system.refine_discontinuous(guess)
