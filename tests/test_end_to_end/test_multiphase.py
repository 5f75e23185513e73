"""Multi-phase assembly gate.

The README LQR problem solved as THREE linked phases over [0, 1/3],
[1/3, 2/3], [2/3, 1], stitched with static linkage parameters through FUNC
boundary conditions, must reproduce the single-phase objective
0.2319139744522318 — this exercises the multi-phase vector layout, FUNC
boundary coupling into the static tail, and the system-level integral
symbol table (reference: ``systembase.py:258-318``).
"""

import numpy as np
import pytest

import pockit_tpu.lobatto as lobatto
from pockit_tpu.optimizer import ipm

LQR_OBJECTIVE = 0.2319139744522318


def test_three_phase_lqr_matches_single_phase():
    a, b, s_, q, r = -1, 1, 1, 1, 0.1
    system = lobatto.System(["x_a", "x_b", "x_f"])
    x_a, x_b, x_f = system.s

    breaks = [0.0, 1.0 / 3.0, 2.0 / 3.0, 1.0]
    links = [(1.0, x_a), (x_a, x_b), (x_b, x_f)]
    phases = []
    for i in range(3):
        ph = system.new_phase(["x"], ["u"])
        (x,) = ph.x
        (u,) = ph.u
        ph.set_dynamics([a * x + b * u])
        ph.set_integral([q * x**2 + r * u**2])
        ph.set_boundary_condition(
            [links[i][0]], [links[i][1]], breaks[i], breaks[i + 1]
        )
        ph.set_discretization(4, 10)
        phases.append(ph)

    system.set_phase(phases)
    system.set_objective(
        phases[0].I[0] + phases[1].I[0] + phases[2].I[0] + s_ * x_f**2 / 2
    )

    guesses = [lobatto.constant_guess(p, 0.5) for p in phases]
    result, info = ipm.solve(system, guesses + [[0.5, 0.3, 0.1]])
    assert info["status"] == 0, info
    assert info["obj_val"] == pytest.approx(LQR_OBJECTIVE, abs=1e-8)

    vars_, statics = result[:3], result[3]
    # state continuity at the phase joints
    assert vars_[0].x[0][-1] == pytest.approx(float(statics[0]), abs=1e-9)
    assert vars_[1].x[0][0] == pytest.approx(float(statics[0]), abs=1e-9)
    assert vars_[1].x[0][-1] == pytest.approx(float(statics[1]), abs=1e-9)
    assert vars_[2].x[0][0] == pytest.approx(float(statics[1]), abs=1e-9)
    # times stitched
    assert vars_[0].t_f == pytest.approx(vars_[1].t_0)
    assert vars_[1].t_f == pytest.approx(vars_[2].t_0)


def test_three_phase_lqr_with_static_bound():
    """A plain-symbol phase constraint on a FUNC-boundary value must be
    promoted to a system constraint (reference: ``systembase.py:292-318``)."""
    a, b, s_, q, r = -1, 1, 1, 1, 0.1
    system = lobatto.System(["x_a", "x_f"])
    x_a, x_f = system.s

    ph1 = system.new_phase(["x"], ["u"])
    (x1,) = ph1.x
    (u1,) = ph1.u
    ph1.set_dynamics([a * x1 + b * u1])
    ph1.set_integral([q * x1**2 + r * u1**2])
    # bound the state everywhere; since the terminal BC is x_a (FUNC), the
    # bound must also apply to x_a through a promoted system constraint
    ph1.set_phase_constraint([x1], [0.2], [2.0])
    ph1.set_boundary_condition([1.0], [x_a], 0.0, 0.5)
    ph1.set_discretization(4, 8)

    ph2 = system.new_phase(["x"], ["u"])
    (x2,) = ph2.x
    (u2,) = ph2.u
    ph2.set_dynamics([a * x2 + b * u2])
    ph2.set_integral([q * x2**2 + r * u2**2])
    ph2.set_boundary_condition([x_a], [x_f], 0.5, 1.0)
    ph2.set_discretization(4, 8)

    system.set_phase([ph1, ph2])
    system.set_objective(ph1.I[0] + ph2.I[0] + s_ * x_f**2 / 2)

    # the promoted row is a plain static symbol, so it tightens the bound
    # on x_a instead of adding a constraint row (systembase.py:335-341)
    assert system.n_c == 0
    assert system.v_lb[system.l_s] == pytest.approx(0.2)
    assert system.v_ub[system.l_s] == pytest.approx(2.0)

    guesses = [
        lobatto.constant_guess(ph1, 0.6),
        lobatto.constant_guess(ph2, 0.5),
    ]
    result, info = ipm.solve(system, guesses + [[0.6, 0.3]])
    assert info["status"] == 0, info
    statics = result[-1]
    # the unconstrained trajectory dips below 0.2 at the joint; the bound
    # must clamp the linkage value at 0.2
    assert float(statics[0]) >= 0.2 - 1e-7
    # with the state bound active the objective must exceed the free one
    assert info["obj_val"] > LQR_OBJECTIVE
