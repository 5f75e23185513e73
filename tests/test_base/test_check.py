"""Error-check semantics (mirrors the reference's ``test_check_radau.py``):
exact solutions pass the continuous check, under-resolved ones fail;
bang-bang saturation accepts/rejects around the tolerance."""

import numpy as np
import pytest

import pockit_tpu.lobatto as lobatto
import pockit_tpu.radau as radau


def _phase_linear(mod, deg=5):
    system = mod.System(0)
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([u])
    phase.set_boundary_condition([0.0], [None], 0.0, 1.0)
    phase.set_discretization(2, deg)
    system.set_phase([phase])
    system.set_objective(0)
    return mod, system, phase


@pytest.mark.parametrize("mod", [lobatto, radau], ids=["lobatto", "radau"])
def test_continuous_check_exact_polynomial_passes(mod):
    mod, system, phase = _phase_linear(mod)
    v = mod.constant_guess(phase, 0.0)
    # x(t) = t^2, u = x' = 2t: representable exactly at degree 5
    v.x[0] = phase.t_x**2
    v.u[0] = 2.0 * phase.t_u
    assert phase.check_continuous(v, None)


@pytest.mark.parametrize("mod", [lobatto, radau], ids=["lobatto", "radau"])
def test_continuous_check_inconsistent_fails(mod):
    mod, system, phase = _phase_linear(mod)
    v = mod.constant_guess(phase, 0.0)
    # x' != u everywhere: residual is O(1)
    v.x[0] = phase.t_x**2
    v.u[0] = 0.0 * phase.t_u
    assert not phase.check_continuous(v, None)


@pytest.mark.parametrize("mod", [lobatto, radau], ids=["lobatto", "radau"])
def test_continuous_check_truncation_scale(mod):
    """exp dynamics on a coarse mesh: fails at tight tolerance, passes at
    a loose one (the residual is the truncation error)."""
    system = mod.System(0)
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([x])
    phase.set_boundary_condition([1.0], [None], 0.0, 1.0)
    phase.set_discretization(1, 4)
    system.set_phase([phase])
    system.set_objective(0)
    v = mod.constant_guess(phase, 0.0)
    v.x[0] = np.exp(phase.t_x)
    v.u[0] = 0.0
    assert not phase.check_continuous(v, None, 1e-10, 1e-10)
    assert phase.check_continuous(v, None, 1e-1, 1e-1)


def test_bang_bang_saturation_tolerance():
    system = radau.System(0)
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([u])
    phase.set_phase_constraint([u], [-1.0], [1.0], bang_bang_control=True)
    phase.set_boundary_condition([0.0], [None], 0.0, 1.0)
    phase.set_discretization(2, 5)
    system.set_phase([phase])
    system.set_objective(0)

    v = radau.constant_guess(phase, 0.0)
    # saturated: u = -1 on interval 1, +1 on interval 2 (scaled: 0 and 1)
    v.u[0] = np.where(phase.t_u < 0.5, -1.0, 1.0)
    assert phase.check_discontinuous(v, None)

    # near-saturated within tolerance
    phase._discontinuous_check_passed = False
    v.u[0] = np.where(phase.t_u < 0.5, -1.0 + 1e-4, 1.0 - 1e-4)
    assert phase.check_discontinuous(v, None, tolerance_discontinuous=1e-3)

    # beyond tolerance: rejected
    phase._discontinuous_check_passed = False
    v.u[0] = np.where(phase.t_u < 0.5, -0.9, 0.9)
    assert not phase.check_discontinuous(v, None, tolerance_discontinuous=1e-3)


def test_check_skips_tiny_intervals():
    """Intervals narrower than tolerance_mesh are skipped by the check."""
    mod, system, phase = _phase_linear(radau)
    phase.set_discretization(np.array([0.0, 1e-5, 1.0]), np.array([4, 5]))
    system.update()
    v = radau.constant_guess(phase, 0.0)
    # garbage in the tiny first interval only
    v.x[0] = phase.t_x**2
    v.u[0] = 2.0 * phase.t_u
    v.x[0][2] = 5.0  # perturb inside the tiny interval (not the fixed BC)
    assert phase.check_continuous(v, None, tolerance_mesh=1e-4)
    # without the mesh-width skip the same data fails
    assert not phase.check_continuous(v, None, tolerance_mesh=0.0)
