"""Batched hp-refinement with mesh bucketing (SURVEY hard-part #5).

A sweep of minimum-time double integrators with per-instance terminal
positions: every instance needs a mesh border at its own switch time
t* = sqrt(x_f) (scaled t*/T with T = 2 sqrt(x_f)), so refinement drives
the meshes apart and the driver must bucket, recompile per bucket, and
converge every lane.
"""

import numpy as np

import pockit_tpu.radau as radau
from pockit_tpu.parallel import solve_refine_batch


def _build():
    system = radau.System(0)
    phase = system.new_phase(["x", "v"], ["u"])
    x, v = phase.x
    (u,) = phase.u
    t = phase.t
    phase.set_dynamics([v, u])
    phase.set_integral([1])
    # the time bound keeps the free-t_f minimum-time problem bounded (the
    # spurious negative-span branch is otherwise unbounded below)
    phase.set_phase_constraint(
        [u, t], [-1.0, 0.5], [1.0, 6.0], bang_bang_control=[True, False]
    )
    phase.set_boundary_condition([0.0, 0.0], [1.0, 0.0], 0.0, None)
    phase.set_discretization(3, 6)
    system.set_phase([phase])
    system.set_objective(phase.I[0])
    return system, phase


def test_refine_sweep_buckets_and_converges():
    system, phase = _build()
    guess = radau.linear_guess(phase, 0.5)
    guess.t_f = 3.0

    # per-instance initial velocity: the switch FRACTION s* varies with
    # v0, so per-instance refinement places different borders and the
    # sweep must bucket by mesh signature
    B = 12
    rng = np.random.default_rng(5)
    v0 = rng.uniform(-0.5, 0.5, B)
    compiled = system.compiled
    bc = np.tile(np.asarray(compiled.phases[0].fixed_vals), (B, 1))
    slot_v0 = list(np.asarray(compiled.phases[0].fixed_idx)).index(
        int(phase.l_v[1])
    )
    bc[:, slot_v0] = v0
    # analytic: peak speed vp = sqrt(x_f + v0^2/2), T* = 2 vp - v0,
    # switch time t1 = vp - v0
    vp = np.sqrt(1.0 + v0**2 / 2)
    T_star = 2 * vp - v0
    s_star = (vp - v0) / T_star

    res = solve_refine_batch(
        system,
        guess,
        bc_overrides=(bc,),
        max_refine_rounds=4,
        # practitioner tolerances: the 1e-8 continuous default is
        # unattainable on the sliver intervals bang-bang refinement
        # introduces around the switch (pre-existing solver behavior)
        check_kw=dict(
            tolerance_discontinuous=1e-3,
            absolute_tolerance_continuous=1e-5,
            relative_tolerance_continuous=1e-5,
        ),
    )

    assert np.all(res.status == 0), res.status
    np.testing.assert_allclose(res.obj, T_star, atol=5e-4)
    # at least the bang-bang (discontinuous) check must pass everywhere
    assert np.all(res.passed), res.passed
    # meshes genuinely diverged: the sweep needed more than one bucket
    assert res.n_bucket_solves > 1
    # per-instance final meshes carry a border near each instance's own
    # scaled switch time
    for i in range(B):
        var = res.values[i]
        mesh = np.asarray(var._mesh)
        assert np.min(np.abs(mesh - s_star[i])) < 2e-2, (i, s_star[i], mesh)


def test_refine_sweep_single_instance_matches_loop():
    """B=1 sweep reproduces the host solve->refine->solve loop."""
    system, phase = _build()
    guess = radau.linear_guess(phase, 0.5)
    guess.t_f = 3.0
    res = solve_refine_batch(system, guess, max_refine_rounds=3)
    assert res.status[0] == 0 and res.passed[0]
    assert abs(res.obj[0] - 2.0) < 1e-5
