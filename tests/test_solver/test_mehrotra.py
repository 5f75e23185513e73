"""Mehrotra probing + second-order corrector (mu_strategy="mehrotra").

The decision harness is tools/compare_mu.py; these tests pin the result:
on the inequality-active bang-bang gate the corrector must converge in no
more iterations than the monotone ladder, and the IPOPT shim must route
IPOPT's 'adaptive' (whose default mu_oracle is a Mehrotra-type probe) to
the native 'mehrotra' rather than the weaker LOQO rule.
"""

import numpy as np

import pockit_tpu.radau as radau
from pockit_tpu.optimizer import ipm, ipopt
from pockit_tpu.solver import IPOptions


def _bang():
    system = radau.System(0)
    phase = system.new_phase(["x", "v"], ["u"])
    x, v = phase.x
    (u,) = phase.u
    t = phase.t
    phase.set_dynamics([v, u])
    phase.set_integral([1])
    phase.set_phase_constraint(
        [u, t], [-1.0, 0.5], [1.0, 6.0], bang_bang_control=[True, False]
    )
    phase.set_boundary_condition([0.0, 0.0], [1.0, 0.0], 0.0, None)
    phase.set_discretization(3, 6)
    system.set_phase([phase])
    system.set_objective(phase.I[0])
    guess = radau.linear_guess(phase, 0.5)
    guess.t_f = 3.0
    return system, guess


def test_mehrotra_beats_or_ties_monotone_on_bang_bang():
    results = {}
    for strat in ("monotone", "mehrotra"):
        system, guess = _bang()
        _, info = ipm.solve(
            system, guess, IPOptions(tol=1e-8, mu_strategy=strat)
        )
        assert info["status"] == 0, (strat, info)
        assert abs(info["obj_val"] - 2.0) < 5e-3, (strat, info["obj_val"])
        results[strat] = info["iterations"]
    assert results["mehrotra"] <= results["monotone"], results


def test_ipopt_shim_routes_adaptive_to_mehrotra():
    opts = ipopt._translate({"mu_strategy": "adaptive", "tol": 1e-8})
    assert opts.mu_strategy == "mehrotra"
    system, guess = _bang()
    _, info = ipopt.solve(system, guess, {"mu_strategy": "adaptive"})
    assert info["status"] == 0


def test_mehrotra_batched_matches_single():
    system, guess = _bang()
    opts = IPOptions(tol=1e-8, mu_strategy="mehrotra")
    _, info = ipm.solve(system, guess, opts)
    B = 4
    gb = np.tile(guess.data, (B, 1))
    res = ipm.solve_batch(system, gb, optimizer_options=opts)
    assert np.all(np.asarray(res.status) == 0)
    np.testing.assert_allclose(
        np.asarray(res.obj), info["obj_val"], rtol=0, atol=1e-9
    )
