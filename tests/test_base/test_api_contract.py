"""API-contract errors (mirrors the reference's eager ValueError behavior,
``phasebase.py:252-255``, ``systembase.py:177-181``, ``_common.py:14-15``)."""

import numpy as np
import pytest

import pockit_tpu.lobatto as lobatto
from pockit_tpu.optimizer import ipm


def test_reserved_time_symbol():
    system = lobatto.System(0)
    with pytest.raises(ValueError, match="time symbol"):
        system.new_phase(["t"], ["u"])
    with pytest.raises(ValueError, match="time symbol"):
        system.new_phase(["x"], ["t"])


def test_dynamics_length_mismatch():
    system = lobatto.System(0)
    phase = system.new_phase(["x", "y"], ["u"])
    (u,) = phase.u
    with pytest.raises(ValueError, match="one expression per state"):
        phase.set_dynamics([u])


def test_phase_constraint_length_mismatch():
    system = lobatto.System(0)
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    with pytest.raises(ValueError, match="parallel"):
        phase.set_phase_constraint([x], [0.0], [1.0, 2.0])


def test_boundary_condition_length_mismatch():
    system = lobatto.System(0)
    phase = system.new_phase(["x", "y"], ["u"])
    with pytest.raises(ValueError, match="per state variable"):
        phase.set_boundary_condition([0.0], [None, None], 0.0, 1.0)


def test_bang_bang_requires_finite_strict_bounds():
    system = lobatto.System(0)
    phase = system.new_phase(["x"], ["u"])
    (u,) = phase.u
    with pytest.raises(ValueError, match="finite"):
        phase.set_phase_constraint([u], [-np.inf], [1.0], bang_bang_control=True)
    with pytest.raises(ValueError, match="upper_bound > lower_bound"):
        phase.set_phase_constraint([u], [1.0], [1.0], bang_bang_control=True)


def test_num_point_mesh_mismatch():
    system = lobatto.System(0)
    phase = system.new_phase(["x"], ["u"])
    with pytest.raises(ValueError, match="per mesh subinterval"):
        phase.set_discretization(np.array([0.0, 0.5, 1.0]), np.array([4]))


def test_incomplete_phase_rejected_by_system():
    system = lobatto.System(0)
    phase = system.new_phase(["x"], ["u"])
    (u,) = phase.u
    phase.set_dynamics([u])  # no BCs, no mesh
    with pytest.raises(ValueError, match="missing required settings"):
        system.set_phase([phase])


def test_solve_guess_shape_checks():
    system = lobatto.System(["p"])
    (p_sym,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (u,) = phase.u
    phase.set_dynamics([u])
    phase.set_boundary_condition([0.0], [None], 0.0, 1.0)
    phase.set_discretization(2, 4)
    system.set_phase([phase])
    system.set_objective(p_sym**2)
    guess = lobatto.constant_guess(phase, 0.0)
    # statics present: a bare Variable guess is rejected
    with pytest.raises(ValueError, match="phase Variable"):
        ipm.solve(system, guess)


def test_unconfigured_system_rejected():
    system = lobatto.System(0)
    phase = system.new_phase(["x"], ["u"])
    (u,) = phase.u
    phase.set_dynamics([u])
    phase.set_boundary_condition([0.0], [None], 0.0, 1.0)
    phase.set_discretization(2, 4)
    system.set_phase([phase])
    # no objective set
    guess = lobatto.constant_guess(phase, 0.0)
    with pytest.raises(ValueError, match="setup is incomplete"):
        ipm.solve(system, guess)


def test_static_parameter_required_for_check():
    system = lobatto.System(["p"])
    (p_sym,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (u,) = phase.u
    phase.set_dynamics([u + p_sym])
    phase.set_boundary_condition([0.0], [None], 0.0, 1.0)
    phase.set_discretization(2, 4)
    system.set_phase([phase])
    system.set_objective(p_sym**2)
    guess = lobatto.constant_guess(phase, 0.0)
    with pytest.raises(ValueError, match="static"):
        phase.check_continuous(guess, None)
