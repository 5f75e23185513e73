"""Maximum-radius low-thrust orbit transfer (Bryson & Ho, Sec. 2.4).

Canonical units: r(0)=1, u(0)=0, v(0)=1, thrust T=0.1405, mass-flow
0.0749, fixed t_f=3.32. Terminal conditions u(t_f)=0, v(t_f)=1/sqrt(r_f)
(circular orbit) are expressed pockit-style through a static parameter
``r_f`` in FUNC boundary conditions; objective = -r_f. The classic
published optimum is r_f ~= 1.5253.

Note: the thrust angle phi is left unbounded here; the optimizer may use
2*pi-equivalent branches pointwise, which is irrelevant for the objective
gate (phi enters only through sin/cos). The refine-to-tolerance loop is
exercised on the brachistochrone and bang-bang gates, whose controls are
branch-free.
"""

import numpy as np
import pytest
import sympy as sp

import pockit_tpu.lobatto as lobatto
from pockit_tpu.optimizer import ipm

T_THRUST = 0.1405
MDOT = 0.0749
TF = 3.32
R_F_KNOWN = 1.5253


def _build_guess(phase):
    guess = lobatto.linear_guess(phase, 1.0)
    # keep r away from the 1/r^2 singularity; sweep phi over the transfer
    guess.x[0] = 1.0 + 0.5 * phase.t_x
    guess.x[1] = 0.1
    guess.x[2] = 1.0
    guess.u[0] = 0.5
    return guess


def test_orbit_transfer_max_radius():
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
        [1.0, 0.0, 1.0],
        [r_f, 0.0, 1 / sp.sqrt(r_f)],
        0.0,
        TF,
    )
    phase.set_discretization(15, 8)
    system.set_phase([phase])
    system.set_objective(-r_f)

    result, info = ipm.solve(system, [_build_guess(phase), [1.5]])
    assert info["status"] == 0, info
    (var, statics) = result
    assert float(statics[0]) == pytest.approx(R_F_KNOWN, abs=2e-3)
    # terminal circular-orbit conditions hold
    assert var.x[1][-1] == pytest.approx(0.0, abs=1e-7)
    assert var.x[2][-1] == pytest.approx(
        1 / np.sqrt(float(statics[0])), abs=1e-7
    )
    # the scipy cross-check solver agrees on the objective
    from pockit_tpu.optimizer import scipy as opt_scipy

    _, res = opt_scipy.solve(
        system, [_build_guess(phase), [1.5]], {"maxiter": 500, "gtol": 1e-10}
    )
    assert res.fun == pytest.approx(-float(statics[0]), abs=1e-6)
