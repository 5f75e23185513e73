"""Exact bound-vector layout (mirrors ``tests/test_radau/test_bound_radau.py``):
plain-symbol phase constraints tighten variable/time/static bounds; system
bounds concatenate phases then statics; constraint bounds order is
[system rows, per phase: dynamic zeros, path bounds repeated L_m times]."""

import numpy as np

import pockit_tpu.lobatto as lobatto
import pockit_tpu.radau as radau


def _system(mod):
    system = mod.System(["p"])
    (p_sym,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    t = phase.t
    phase.set_dynamics([u])
    # mixed: bounds from plain symbols, one expression row
    phase.set_phase_constraint(
        [x, u, t, p_sym, x + u],
        [-2.0, -1.0, 0.0, 0.5, -np.inf],
        [2.0, 1.0, 5.0, 3.0, 4.0],
    )
    phase.set_boundary_condition([0.0], [None], 0.0, None)
    phase.set_discretization(2, 3)
    system.set_phase([phase])
    system.set_objective(p_sym)
    return system, phase


def test_variable_bounds_layout():
    for mod in (lobatto, radau):
        system, phase = _system(mod)
        v_lb, v_ub = system.v_lb, system.v_ub
        assert len(v_lb) == system.L
        Lx = phase.d.L_x_var
        Lu = phase.d.L_u_var
        # state bounds
        np.testing.assert_array_equal(v_lb[:Lx], -2.0)
        np.testing.assert_array_equal(v_ub[:Lx], 2.0)
        # control bounds
        np.testing.assert_array_equal(v_lb[Lx : Lx + Lu], -1.0)
        np.testing.assert_array_equal(v_ub[Lx : Lx + Lu], 1.0)
        # time bounds apply to both t_0 and t_f entries
        assert v_lb[phase.L - 2] == 0.0 and v_ub[phase.L - 2] == 5.0
        assert v_lb[phase.L - 1] == 0.0 and v_ub[phase.L - 1] == 5.0
        # static bounds at the tail
        assert v_lb[-1] == 0.5 and v_ub[-1] == 3.0


def test_constraint_bounds_layout():
    for mod in (lobatto, radau):
        system, phase = _system(mod)
        c_lb, c_ub = system.c_lb, system.c_ub
        n_dyn = phase.n_x * phase.d.L_d
        # no system rows; dynamic rows are equalities at zero
        np.testing.assert_array_equal(c_lb[:n_dyn], 0.0)
        np.testing.assert_array_equal(c_ub[:n_dyn], 0.0)
        # the single expression row (x + u <= 4) repeats over L_m points
        assert phase.n_c == 1
        np.testing.assert_array_equal(c_lb[n_dyn:], -np.inf)
        np.testing.assert_array_equal(c_ub[n_dyn:], 4.0)
        assert len(c_lb) == n_dyn + phase.L_m


def test_tightest_bound_wins():
    system, phase = _system(lobatto)
    (x,) = phase.x
    (u,) = phase.u
    (p_sym,) = system.s
    # re-apply with overlapping bounds: intersection is kept
    phase.set_phase_constraint(
        [x, x], [-2.0, -1.5], [2.0, 3.0]
    )
    system.update()
    Lx = phase.d.L_x_var
    np.testing.assert_array_equal(system.v_lb[:Lx], -1.5)
    np.testing.assert_array_equal(system.v_ub[:Lx], 2.0)


def test_pinned_variable_becomes_parameter():
    """lb == ub plain-symbol constraints pin the variable: no bounds are
    emitted (an equal-bound box has an empty barrier interior in f32) and
    every slot joins the FIXED substitution tables after the BC slots."""
    for mod in (lobatto, radau):
        system = mod.System(0)
        phase = system.new_phase(["x"], ["u"])
        (x,) = phase.x
        (u,) = phase.u
        phase.set_dynamics([u])
        phase.set_integral([x**2])
        phase.set_phase_constraint([u], [0.75], [0.75])
        phase.set_boundary_condition([1.0], [None], 0.0, 1.0)
        phase.set_discretization(2, 3)
        system.set_phase([phase])
        system.set_objective(phase.I[0])

        Lx = phase.d.L_x_var
        Lu = phase.d.L_u_var
        # no box on the pinned control
        assert np.all(np.isinf(system.v_lb[Lx : Lx + Lu]))
        assert np.all(np.isinf(system.v_ub[Lx : Lx + Lu]))
        # all control slots pinned at 0.75
        pins = phase.pinned_variable_slots
        assert len(pins) == Lu
        assert all(v == 0.75 for _, v in pins)

        cp = system.compiled.phases[0]
        # bc vector layout: BC slots first (x0 fixed, t0, tf), pins after
        n_bc = 3
        assert len(cp.fixed_vals) == n_bc + Lu
        np.testing.assert_array_equal(cp.fixed_vals[n_bc:], 0.75)

        # solve: pinned control must come back exactly, dynamics obeyed
        from pockit_tpu.optimizer import ipm

        res, info = ipm.solve(system, mod.constant_guess(phase, 0.5))
        assert info["status"] == 0
        np.testing.assert_allclose(np.asarray(res.u[0]), 0.75, atol=1e-12)
        # x' = u = 0.75, x(0) = 1 -> x(1) = 1.75
        np.testing.assert_allclose(
            float(np.asarray(res.x[0])[-1]), 1.75, atol=1e-8
        )


def test_pin_conflicts_are_reported():
    """A pin that contradicts another box on the same variable, a second
    different pin, or a FIXED boundary condition at the shared slot makes
    the problem infeasible — report it at configure/compile time instead
    of silently substituting one of the values (advisor r4)."""
    import pytest

    def fresh():
        system = lobatto.System(0)
        phase = system.new_phase(["x"], ["u"])
        (x,) = phase.x
        (u,) = phase.u
        phase.set_dynamics([u])
        phase.set_integral([x**2])
        return system, phase, u

    # pin outside a second box on the same variable
    system, phase, u = fresh()
    with pytest.raises(ValueError, match="pinned to 2.0 but another"):
        phase.set_phase_constraint([u, u], [0.0, 2.0], [1.0, 2.0])

    # two different pins
    system, phase, u = fresh()
    with pytest.raises(ValueError, match="conflicting values"):
        phase.set_phase_constraint([u, u], [2.0, 3.0], [2.0, 3.0])

    # pin inside the box is fine (pin wins, box redundant)
    system, phase, u = fresh()
    phase.set_phase_constraint([u, u], [0.0, 0.5], [1.0, 0.5])

    # pin disagreeing with a FIXED boundary condition at the overlap slot
    system, phase, u = fresh()
    phase.set_phase_constraint([phase.x[0]], [2.0], [2.0])
    phase.set_boundary_condition([1.0], [None], 0.0, 1.0)
    phase.set_discretization(2, 3)
    system.set_phase([phase])
    system.set_objective(phase.I[0])
    with pytest.raises(ValueError, match="boundary\ncondition fixes it|boundary condition fixes it"):
        system.compiled
