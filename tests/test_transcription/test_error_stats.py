"""Device-side batched error statistics vs the host check/plan path.

`transcription/error.py` evaluates the refine-sweep error residuals on
device for a whole batch at once; the host path in `base/phase.py` is the
behavioral reference (itself mirroring ``phasebase.py:1316-1347``). Every
statistic the device program returns must agree with the host computation
for arbitrary (not just converged) iterates, including NaN lanes and
per-instance FIXED boundary overrides.
"""

import numpy as np
import pytest

import pockit_tpu.lobatto as lobatto
import pockit_tpu.radau as radau
from pockit_tpu.parallel.refine_batch import _fixed_bc_values
from pockit_tpu.transcription.error import make_error_stats


def _double_integrator():
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
    phase.set_discretization([0, 0.45, 0.8, 1.0], [5, 6, 4])
    system.set_phase([phase])
    system.set_objective(phase.I[0])
    return system, phase


def _lqr_lobatto():
    system = lobatto.System(0)
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([-x + u])
    phase.set_integral([x**2 + u**2])
    phase.set_boundary_condition([1.0], [None], 0.0, 1.0)
    phase.set_discretization(3, 5)
    system.set_phase([phase])
    system.set_objective(phase.I[0])
    return system, phase


def _host_ratio(phase, T_x, I_f):
    """Per-interval scaled error ratio for ALL intervals (the host plan
    loop computes it only for failing ones; the device returns all)."""
    abs_err = np.abs(T_x - I_f)
    out = np.zeros(phase.N)
    for i in range(phase.N):
        a, b = phase.l_m_aug[i], phase.r_m_aug[i]
        scale = 1.0 + np.abs(I_f[:, a:b]).max(axis=1, keepdims=True)
        out[i] = float(np.max(abs_err[:, a:b] / scale))
    return out


@pytest.mark.parametrize("build", [_double_integrator, _lqr_lobatto])
def test_stats_match_host(build):
    system, phase = build()
    compiled = system.compiled
    cp = compiled.phases[0]

    atol, rtol, dtol, mtol = 1e-5, 1e-4, 1e-3, 1e-4
    B = 7
    rng = np.random.default_rng(42)
    z = rng.normal(size=(B, system.L))
    z[:, system.r_p[0] - 2] = 0.0  # t_0
    z[:, system.r_p[0] - 1] = rng.uniform(1.5, 3.0, B)  # t_f
    z[3, 5] = np.nan  # a NaN lane must fail the check on both paths

    # per-instance FIXED boundary overrides
    bc = np.tile(np.asarray(cp.fixed_vals), (B, 1))
    bc += rng.normal(scale=0.1, size=bc.shape)

    fn = make_error_stats(system)
    (stats,) = [
        tuple(np.asarray(a) for a in trip) for trip in fn(z, (bc,), (atol, rtol, dtol))
    ]
    cont_ok, ratio, disc_sat = stats
    tiny = phase._tiny_intervals(mtol)

    for j in range(B):
        with _fixed_bc_values(phase, bc[j]):
            zv = z[j, : system.r_p[0]]
            s = np.zeros(0)
            T_x, I_f = phase._error_estimation_data_continuous(zv, s)
            ec_host = phase._error_check_interval_continuous(
                T_x, I_f, atol, rtol, mtol
            )
            np.testing.assert_array_equal(cont_ok[j] | tiny, ec_host, err_msg=str(j))
            with np.errstate(invalid="ignore"):
                r_host = _host_ratio(phase, T_x, I_f)
            np.testing.assert_allclose(
                ratio[j], r_host, rtol=1e-12, atol=0, err_msg=str(j)
            )
            if phase.n_b:
                f_bb = phase._error_estimation_data_discontinuous(zv, s)
                ed_host = phase._error_check_interval_discontinuous(
                    f_bb, dtol, mtol
                )
                np.testing.assert_array_equal(
                    disc_sat[j] | tiny, ed_host, err_msg=str(j)
                )


def test_stats_tolerances_are_runtime():
    """Different tolerance triples reuse one compiled program and change
    the pass/fail pattern accordingly (no retrace needed for the plan
    pass of a sweep)."""
    system, phase = _lqr_lobatto()
    B = 4
    rng = np.random.default_rng(0)
    z = rng.normal(scale=0.01, size=(B, system.L))
    z[:, -2] = 0.0
    z[:, -1] = 1.0
    cp = system.compiled.phases[0]
    bc = np.tile(np.asarray(cp.fixed_vals), (B, 1))

    fn = make_error_stats(system)
    tight = np.asarray(fn(z, (bc,), (1e-12, 1e-12, 1e-3))[0][0])
    loose = np.asarray(fn(z, (bc,), (1e6, 1e6, 1e-3))[0][0])
    assert not tight.any()
    assert loose.all()
