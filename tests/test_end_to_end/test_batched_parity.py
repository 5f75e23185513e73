"""Batched solves must agree with single solves lane by lane, and the
IPOPT-compat shim must accept reference-style option dicts."""

import numpy as np
import jax.numpy as jnp
import pytest

import pockit_tpu.lobatto as lobatto
from pockit_tpu.optimizer import ipm, ipopt
from pockit_tpu.optimizer._common import preprocess
from pockit_tpu.solver import IPOptions


def _build(x0_val):
    a, b, s_, q, r = -1, 1, 1, 1, 0.1
    system = lobatto.System(["x_f"])
    (x_f,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([a * x + b * u])
    phase.set_integral([q * x**2 + r * u**2])
    phase.set_boundary_condition([x0_val], [x_f], 0, 1)
    phase.set_discretization(6, 6)
    system.set_phase([phase])
    system.set_objective(phase.I[0] + s_ * x_f**2 / 2)
    return system, phase


def test_batched_lane_equals_single_solve():
    system, phase = _build(1.0)
    guess = lobatto.constant_guess(phase, 0)
    x0, _ = preprocess(system, [guess, [0.0]])
    compiled = system.compiled

    x0_vals = np.array([0.7, 1.0, 1.3])
    bc = np.tile(compiled.phases[0].fixed_vals, (3, 1))
    bc[:, 0] = x0_vals
    res = ipm.solve_batch(
        system, np.tile(x0, (3, 1)), bc_overrides=(jnp.asarray(bc),)
    )
    assert np.all(np.asarray(res.status) == 0)

    # single solves of separately-built systems with those x(0) values
    for k, v in enumerate(x0_vals):
        sys_k, phase_k = _build(float(v))
        guess_k = lobatto.constant_guess(phase_k, 0)
        _, info = ipm.solve(sys_k, [guess_k, [0.0]])
        assert info["status"] == 0
        assert float(res.obj[k]) == pytest.approx(info["obj_val"], abs=1e-10)


def test_ipopt_shim_accepts_reference_options():
    system, phase = _build(1.0)
    guess = lobatto.constant_guess(phase, 0)
    [var_p, var_s], info = ipopt.solve(
        system,
        [guess, [0.0]],
        {"tol": 1e-8, "max_iter": 80, "print_level": 0, "sb": "yes"},
    )
    assert info["status"] == 0
    assert info["obj_val"] == pytest.approx(0.2319139744522318, abs=1e-6)


def test_unknown_ipopt_option_warns():
    system, phase = _build(1.0)
    guess = lobatto.constant_guess(phase, 0)
    with pytest.warns(UserWarning, match="no equivalent"):
        ipopt.solve(system, [guess, [0.0]], {"derivative_test": "second-order"})


def test_solve_batch_drained():
    system, phase = _build(1.0)
    guess = lobatto.constant_guess(phase, 0)
    x0, _ = preprocess(system, [guess, [0.0]])
    compiled = system.compiled
    B = 24
    rng = np.random.default_rng(5)
    bc = np.tile(compiled.phases[0].fixed_vals, (B, 1))
    bc[:, 0] = rng.uniform(0.5, 1.5, B)
    status, obj, iters, z = ipm.solve_batch_drained(
        system, np.tile(x0, (B, 1)), bc_overrides=(bc,), first_pass_iters=2
    )
    assert np.all(status == 0)
    J1 = 0.2319139744522318
    np.testing.assert_allclose(obj, J1 * bc[:, 0] ** 2, rtol=1e-6)


def test_solve_batch_drained_forced_rounds():
    """first_pass_iters=1 leaves every lane unconverged, forcing the fused
    drain rounds (one jitted gather->solve->scatter dispatch per round) to
    produce the full result set."""
    system, phase = _build(1.0)
    guess = lobatto.constant_guess(phase, 0)
    x0, _ = preprocess(system, [guess, [0.0]])
    compiled = system.compiled
    B = 24
    rng = np.random.default_rng(11)
    bc = np.tile(compiled.phases[0].fixed_vals, (B, 1))
    bc[:, 0] = rng.uniform(0.5, 1.5, B)
    status, obj, iters, z, mask1 = ipm.solve_batch_drained(
        system,
        np.tile(x0, (B, 1)),
        bc_overrides=(bc,),
        first_pass_iters=1,
        drain_frac=4,  # B_drain=8 < pending: exercises >1 round
        max_drain_rounds=4,
        return_first_pass_mask=True,
    )
    assert not mask1.any()
    assert np.all(status == 0)
    J1 = 0.2319139744522318
    np.testing.assert_allclose(obj, J1 * bc[:, 0] ** 2, rtol=1e-6)
    zh = np.asarray(z)
    assert zh.shape == (B, system.L) and np.isfinite(zh).all()
