"""The block KKT path must reproduce the dense path's convergence.

For exact-pattern problems (krylov_rank == 0) both paths solve the same
linear systems, so iteration counts and iterates must agree to float
noise; for low-rank-coupled problems the matrix-free PCG makes the solve
exact, so results must still match at solution level.
"""

import dataclasses

import numpy as np
import pytest

import pockit_tpu.lobatto as lobatto
import pockit_tpu.radau as radau
from pockit_tpu.optimizer import ipm
from pockit_tpu.optimizer._common import preprocess


def _lqr():
    system = lobatto.System(["x_f"])
    (x_f,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([-x + u])
    phase.set_integral([x**2 + 0.1 * u**2])
    phase.set_boundary_condition([1], [x_f], 0, 1)
    phase.set_discretization(6, 8)
    system.set_phase([phase])
    system.set_objective(phase.I[0] + x_f**2 / 2)
    guess = lobatto.constant_guess(phase, 0)
    return system, [guess, [0.0]]


def _constrained_radau():
    system = radau.System(0)
    phase = system.new_phase(["x", "v"], ["u"])
    x, v = phase.x
    (u,) = phase.u
    phase.set_dynamics([v, u])
    phase.set_integral([u**2])
    phase.set_phase_constraint([u], [-8.0], [8.0])
    phase.set_boundary_condition([0.0, 0.0], [1.0, 0.0], 0.0, 1.0)
    phase.set_discretization(4, 6)
    system.set_phase([phase])
    system.set_objective(phase.I[0])
    guess = radau.linear_guess(phase, 0.2)
    return system, guess


def _with_system_rows():
    system = radau.System(["a"])
    (a,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([a * x + u])
    phase.set_integral([x**2 + u**2])
    phase.set_boundary_condition([1.0], [0.2], 0.0, 1.0)
    phase.set_discretization(3, 6)
    system.set_phase([phase])
    system.set_system_constraint([a], [-2.0], [-0.5])
    system.set_objective(phase.I[0] + a**2)
    guess = radau.constant_guess(phase, 0.5)
    return system, [guess, [-1.0]]


@pytest.mark.parametrize(
    "builder,obj_tol",
    [(_lqr, 1e-10), (_constrained_radau, 1e-10), (_with_system_rows, 1e-8)],
    ids=["lqr", "constrained", "system-rows"],
)
def test_block_matches_dense(builder, obj_tol):
    system, guess = builder()
    base = ipm.default_options()
    dense = dataclasses.replace(base, kkt_solver="dense")
    blockopts = dataclasses.replace(base, kkt_solver="block")

    v_d, info_d = ipm.solve(system, guess, dense)
    v_b, info_b = ipm.solve(system, guess, blockopts)

    assert info_d["status"] == 0 and info_b["status"] == 0
    assert abs(info_d["obj_val"] - info_b["obj_val"]) < obj_tol
    # exact-pattern problems take the same path step for step
    from pockit_tpu.solver.structured import structured_layout

    if structured_layout(system).krylov_rank == 0:
        assert info_d["iterations"] == info_b["iterations"]
        np.testing.assert_allclose(info_d["x"], info_b["x"], atol=1e-8)


def test_batched_block_path():
    """solve_batch on the default (auto -> block) path, varied FIXED bcs."""
    system, guess = _lqr()
    x0, _ = preprocess(system, guess)
    B = 8
    x0b = np.tile(x0, (B, 1))
    compiled = system.compiled
    bc = np.tile(np.asarray(compiled.phases[0].fixed_vals), (B, 1))
    rng = np.random.default_rng(0)
    bc[:, 0] = rng.uniform(0.5, 1.5, B)
    res = ipm.solve_batch(system, x0b, bc_overrides=(bc,))
    assert np.all(np.asarray(res.status) == 0)
    # LQR cost scales with x0^2 (plus the x_f static term handled inside)
    ref = np.asarray(res.obj)[0] / bc[0, 0] ** 2
    np.testing.assert_allclose(
        np.asarray(res.obj), ref * bc[:, 0] ** 2, rtol=1e-6
    )
