"""Variable container: interpolation matrices, adapt, guesses.

Mirrors the reference's test strategy (``tests/test_base/test_variable_base.py``):
V/D interpolation reproduce function values/derivatives; adapt round-trips
across meshes; guesses honor FIXED boundary conditions.
"""

import numpy as np
import pytest
import sympy as sp

import pockit_tpu.lobatto as lobatto
import pockit_tpu.radau as radau


def _phase(mod, mesh=4, deg=7):
    system = mod.System(0)
    phase = system.new_phase(["x", "y"], ["u"])
    x, y = phase.x
    (u,) = phase.u
    phase.set_dynamics([y, u])
    phase.set_boundary_condition([0.0, 1.0], [None, None], 0.0, 2.0)
    phase.set_discretization(mesh, deg)
    return mod, phase


@pytest.fixture(params=[lobatto, radau], ids=["lobatto", "radau"])
def mod_phase(request):
    return _phase(request.param)


def test_interpolation_values_and_derivatives(mod_phase):
    mod, phase = mod_phase
    v = mod.constant_guess(phase, 0.0)
    # t in [0, 2]; fill states with sin/cos samples at the nodes
    v.x[0] = np.sin(v.t_x)
    v.x[1] = np.cos(v.t_x)
    v.u[0] = np.exp(-v.t_u)
    t_out = np.linspace(0.0, 2.0, 41)
    np.testing.assert_allclose(
        v.V_x(t_out) @ v.x[0], np.sin(t_out), atol=1e-6
    )
    np.testing.assert_allclose(
        v.V_u(t_out) @ v.u[0], np.exp(-t_out), atol=1e-5
    )
    # D is with respect to scaled time tau = (t - t_0) / (t_f - t_0)
    span = v.t_f - v.t_0
    np.testing.assert_allclose(
        v.D_x(t_out) @ v.x[0] / span, np.cos(t_out), atol=1e-5
    )


def test_adapt_roundtrip(mod_phase):
    mod, phase = mod_phase
    v = mod.constant_guess(phase, 0.0)
    v.x[0] = v.t_x**3 - v.t_x
    v.x[1] = 2.0 * v.t_x
    v.u[0] = np.cos(v.t_u)
    # refine onto a different mesh, then interpolate back
    system = mod.System(0)
    phase2 = system.new_phase(["x", "y"], ["u"])
    x, y = phase2.x
    (u,) = phase2.u
    phase2.set_dynamics([y, u])
    phase2.set_boundary_condition([0.0, 1.0], [None, None], 0.0, 2.0)
    phase2.set_discretization(np.array([0.0, 0.3, 0.7, 1.0]), np.array([8, 6, 9]))
    v2 = v.adapt(phase2)
    np.testing.assert_allclose(v2.x[0], v2.t_x**3 - v2.t_x, atol=1e-7)
    np.testing.assert_allclose(v2.u[0], np.cos(v2.t_u), atol=1e-5)
    assert v2.t_0 == v.t_0 and v2.t_f == v.t_f


def test_guesses_honor_fixed_bcs(mod_phase):
    mod, phase = mod_phase
    c = mod.constant_guess(phase, 5.0)
    assert c.x[0][0] == 0.0  # FIXED initial
    assert c.x[1][0] == 1.0
    assert c.x[0][-1] == 5.0  # FREE terminal keeps the constant
    assert c.t_0 == 0.0 and c.t_f == 2.0

    l = mod.linear_guess(phase, 3.0)
    # x has only the initial FIXED -> constant at bc value
    np.testing.assert_allclose(l.x[0], 0.0)
    np.testing.assert_allclose(l.x[1], 1.0)


def test_batch_index_array(mod_phase):
    mod, phase = mod_phase
    v = mod.constant_guess(phase, 0.0)
    assert len(v.x) == 2 and len(v.u) == 1
    v.x[1] = 7.0
    np.testing.assert_allclose(v.data[phase.l_v[1] : phase.r_v[1]], 7.0)


def test_guard_t_errors(mod_phase):
    mod, phase = mod_phase
    v = mod.constant_guess(phase, 0.0)
    with pytest.raises(ValueError):
        v.V_x(np.array([1.0, 0.5]))  # not ascending
    with pytest.raises(ValueError):
        v.V_x(np.array([-0.5, 1.0]))  # before t_0
    with pytest.raises(ValueError):
        v.V_x(np.array([0.0, 2.5]))  # after t_f


def test_radau_control_discontinuity_sampling():
    """A repeated output time at an interval border samples the control
    from both sides (reference: ``variablebase.py:140-156``)."""
    mod, phase = _phase(radau, mesh=2, deg=4)
    v = radau.constant_guess(phase, 0.0)
    # piecewise control: -1 on first interval, +1 on second
    u = np.where(phase.t_u < 0.5, -1.0, 1.0)
    v.u[0] = u
    t_border = 1.0  # scaled 0.5 -> physical 1.0
    V = v.V_u(np.array([0.5, t_border, t_border, 1.5]))
    vals = V @ v.u[0]
    assert vals[0] == pytest.approx(-1.0)
    assert vals[1] == pytest.approx(-1.0)  # left limit
    assert vals[2] == pytest.approx(1.0)  # right limit
    assert vals[3] == pytest.approx(1.0)
