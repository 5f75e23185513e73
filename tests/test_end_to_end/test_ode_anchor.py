"""Transcription-independent ODE-integration anchors (VERDICT round-2
item 6).

The committed golden pack was recorded with scipy trust-constr driven
through pockit_tpu's OWN transcription, so a transcription bug that
distorts the NLP consistently would fool both solvers. These tests close
that hole for the two gates without analytic oracles (orbit transfer,
Goddard ascent): the solved CONTROL trajectory is re-interpolated with
scipy's BarycentricInterpolator (never pockit code) and the dynamics —
hand-written numpy, never the sympy lowering — are integrated with
``scipy.integrate.solve_ivp`` at tight tolerance from the solved initial
state. If the transcription were wrong, the solved control would not
steer the *true* ODE onto the solved/published terminal conditions.

LQR and brachistochrone already carry analytic anchors (Riccati
integration, the cycloid closed form); bang-bang has the exact T=2
switch structure (`tests/test_end_to_end/`).
"""

import numpy as np
import pytest
import sympy as sp
from scipy.integrate import solve_ivp
from scipy.interpolate import BarycentricInterpolator


def _piecewise_controls(phase, var, unwrap=()):
    """Per-interval scipy interpolants of every control, plus the physical
    interval boundaries. Interval node membership comes from the exact
    index layout (shared borders for Lobatto controls, per-interval blocks
    for Radau); the interpolation itself is pure scipy — independent of
    pockit's Lagrange code."""
    from pockit_tpu.numerics.layout import lr_c, lr_nc

    t0, tf = float(var.t_0), float(var.t_f)
    bounds = t0 + np.asarray(phase._mesh) * (tf - t0)
    t_u = np.asarray(var.t_u)
    num_point = np.asarray(phase._num_point)
    l, r = (lr_c if phase._family == "lobatto" else lr_nc)(num_point)
    u_vals = [np.asarray(var.u[i]) for i in range(phase.n_u)]
    for i in unwrap:
        # angular controls entering only through sin/cos: the NLP is free
        # to pick 2*pi-equivalent branches per node, which would wreck a
        # polynomial interpolation; unwrap to the smooth representative
        # (an equally valid solution of the same NLP)
        u_vals[i] = np.unwrap(u_vals[i])
    interps = []
    for k in range(len(bounds) - 1):
        idx = np.arange(l[k], r[k])
        nodes = t_u[idx]
        interps.append(
            [
                BarycentricInterpolator(nodes, u_vals[i][idx])
                for i in range(phase.n_u)
            ]
        )
    return bounds, interps


def _integrate_phase(phase, var, rhs, x_start, unwrap=()):
    """Integrate ``x' = rhs(t, x, u(t))`` interval-by-interval over the
    phase span, with u(t) from the independent piecewise interpolants.
    Returns the terminal state."""
    bounds, interps = _piecewise_controls(phase, var, unwrap=unwrap)
    x = np.asarray(x_start, dtype=float)
    for k in range(len(bounds) - 1):
        fk = interps[k]

        def f(t, xv):
            u = [float(f_i(t)) for f_i in fk]
            return rhs(t, xv, u)

        sol = solve_ivp(
            f,
            (bounds[k], bounds[k + 1]),
            x,
            method="DOP853",
            rtol=1e-11,
            atol=1e-11,
        )
        assert sol.success
        x = sol.y[:, -1]
    return x


# ---------------------------------------------------------------------------
# Orbit transfer (Bryson & Ho §2.4): max-radius low thrust
# ---------------------------------------------------------------------------

T_THRUST = 0.1405
MDOT = 0.0749
TF = 3.32
R_F_KNOWN = 1.5253


def test_orbit_solution_satisfies_true_ode():
    import pockit_tpu.lobatto as lobatto
    from pockit_tpu.optimizer import ipm

    system = lobatto.System(["r_f"])
    (r_f,) = system.s
    phase = system.new_phase(["r", "u", "v"], ["phi"])
    r, u, v = phase.x
    (phi,) = phase.u
    t = phase.t
    acc = T_THRUST / (1 - MDOT * t)
    phase.set_dynamics(
        [
            u,
            v**2 / r - 1 / r**2 + acc * sp.sin(phi),
            -u * v / r + acc * sp.cos(phi),
        ]
    )
    phase.set_boundary_condition(
        [1.0, 0.0, 1.0], [r_f, 0.0, 1 / sp.sqrt(r_f)], 0.0, TF
    )
    phase.set_discretization(15, 8)
    system.set_phase([phase])
    system.set_objective(-r_f)

    guess = lobatto.linear_guess(phase, 1.0)
    guess.x[0] = 1.0 + 0.5 * phase.t_x
    guess.x[1] = 0.1
    guess.x[2] = 1.0
    guess.u[0] = 0.5
    result, info = ipm.solve(system, [guess, [1.5]])
    assert info["status"] == 0, info
    var, statics = result
    r_f_solved = float(statics[0])

    # hand-written dynamics: never touches the sympy->jax lowering
    def rhs(tt, xv, uu):
        rr, uv, vv = xv
        a = T_THRUST / (1 - MDOT * tt)
        (p,) = uu
        return [
            uv,
            vv**2 / rr - 1 / rr**2 + a * np.sin(p),
            -uv * vv / rr + a * np.cos(p),
        ]

    x_end = _integrate_phase(phase, var, rhs, [1.0, 0.0, 1.0], unwrap=(0,))

    # the independently integrated trajectory under the solved control
    # reaches the solved/published terminal circular orbit
    assert x_end[0] == pytest.approx(r_f_solved, abs=5e-5)
    assert x_end[0] == pytest.approx(R_F_KNOWN, abs=2e-3)
    assert x_end[1] == pytest.approx(0.0, abs=5e-5)
    assert x_end[2] == pytest.approx(1.0 / np.sqrt(x_end[0]), abs=5e-5)


# ---------------------------------------------------------------------------
# Goddard three-phase ascent: bang-singular-bang
# ---------------------------------------------------------------------------


def test_goddard_solution_satisfies_true_ode():
    from test_goddard import BETA, C_EX, D0, H_STAR, MF, _build, _guesses

    from pockit_tpu.optimizer import ipm

    system, phases = _build()
    result, info = ipm.solve(system, _guesses(system, phases))
    assert info["status"] == 0, info
    statics = result[-1]
    h_f_solved = float(statics[-1])

    def rhs(tt, xv, uu):
        h, v, m = xv
        (u,) = uu
        drag = D0 * v**2 * np.exp(-BETA * (h - 1))
        return [v, (u - drag) / m - 1 / h**2, -u / C_EX]

    x = np.array([1.0, 0.0, 1.0])
    for ph, var in zip(phases, result[:3]):
        x = _integrate_phase(ph, var, rhs, x)
        # state continuity at phase joins / terminal point: the solved
        # phase-end state matches the true integration
        x_solved_end = np.array([np.asarray(var.x[i])[-1] for i in range(3)])
        np.testing.assert_allclose(x, x_solved_end, atol=2e-4)

    # independently integrated apex matches the solved and published optima
    assert x[0] == pytest.approx(h_f_solved, abs=2e-4)
    assert x[0] == pytest.approx(H_STAR, abs=5e-4)
    assert x[1] == pytest.approx(0.0, abs=2e-4)  # v(t_f) = 0
    assert x[2] == pytest.approx(MF, abs=1e-6)  # mass exhausted to m_f
