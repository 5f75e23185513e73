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
