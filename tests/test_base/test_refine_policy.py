"""hp-refinement policy (reference ``phasebase.py:1483-1578``): raise the
interval degree while it fits under num_point_max, else split the interval
into num_point_min-degree pieces."""

import numpy as np

import pockit_tpu.radau as radau


def _setup(deg):
    system = radau.System(0)
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([x])
    phase.set_boundary_condition([1.0], [None], 0.0, 1.0)
    phase.set_discretization(2, deg)
    system.set_phase([phase])
    system.set_objective(0)
    v = radau.constant_guess(phase, 0.0)
    # x = e^t is not polynomial: residual = truncation error at any degree
    v.x[0] = np.exp(phase.t_x)
    v.u[0] = np.exp(phase.t_u)
    return system, phase, v


def test_p_refinement_raises_degree():
    system, phase, v = _setup(deg=6)
    assert not phase.check_continuous(v, None, 1e-12, 1e-12)
    phase.refine_continuous(
        v, None, 1e-12, 1e-12, num_point_min=6, num_point_max=12
    )
    # still 2 intervals, higher degree
    assert phase.N == 2
    assert np.all(phase._num_point > 6)
    assert np.all(phase._num_point <= 12)


def test_h_refinement_splits_at_degree_cap():
    system, phase, v = _setup(deg=8)
    phase.refine_continuous(
        v, None, 1e-13, 1e-13, num_point_min=4, num_point_max=8
    )
    # degree already at cap and error demands more -> failing intervals
    # split into num_point_min-degree pieces (a passing interval may keep
    # its degree)
    assert phase.N > 2
    assert np.sum(phase._num_point == 4) >= 2


def test_refined_mesh_respects_length_bounds():
    system, phase, v = _setup(deg=8)
    phase.refine_continuous(
        v,
        None,
        1e-13,
        1e-13,
        num_point_min=4,
        num_point_max=8,
        mesh_length_min=0.2,
        mesh_length_max=1.0,
    )
    widths = np.diff(phase._mesh)
    assert np.all(widths >= 0.2 - 1e-12)
