"""Sharded batched solves on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import pockit_tpu.lobatto as lobatto
from pockit_tpu.optimizer import ipm
from pockit_tpu.optimizer._common import preprocess
from pockit_tpu.parallel import make_sharded_batch_solver
from pockit_tpu.parallel.sharding import replicate_for_batch
from pockit_tpu.solver import Bounds, IPOptions

LQR_OBJECTIVE = 0.2319139744522318


def _build_lqr():
    a, b, s_, q, r = -1, 1, 1, 1, 0.1
    system = lobatto.System(["x_f"])
    (x_f,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([a * x + b * u])
    phase.set_integral([q * x**2 + r * u**2])
    phase.set_boundary_condition([1], [x_f], 0, 1)
    phase.set_discretization(6, 6)
    system.set_phase([phase])
    system.set_objective(phase.I[0] + s_ * x_f**2 / 2)
    return system, phase


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_batch_matches_unsharded():
    system, phase = _build_lqr()
    guess = lobatto.constant_guess(phase, 0)
    x0, _ = preprocess(system, [guess, [0.0]])
    compiled = system.compiled
    B = 16

    rng = np.random.default_rng(0)
    bc = np.tile(compiled.phases[0].fixed_vals, (B, 1))
    bc[:, 0] = rng.uniform(0.5, 1.5, B)  # perturbed x(0)

    # unsharded reference
    res_ref = ipm.solve_batch(
        system, np.tile(x0, (B, 1)), bc_overrides=(jnp.asarray(bc),)
    )
    assert np.all(np.asarray(res_ref.status) == 0)

    # sharded over a dp x ep mesh
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("dp", "ep"))
    step = make_sharded_batch_solver(compiled, mesh)
    bounds = Bounds(
        jnp.asarray(compiled.z_lb),
        jnp.asarray(compiled.z_ub),
        jnp.asarray(compiled.c_lb),
        jnp.asarray(compiled.c_ub),
    )
    bounds_b = Bounds(*[jnp.broadcast_to(b, (B,) + b.shape) for b in bounds])
    rt = {"bc": (jnp.asarray(bc),)}
    res, n_conv = step(jnp.tile(jnp.asarray(x0), (B, 1)), bounds_b, rt)
    assert int(n_conv) == B
    np.testing.assert_allclose(
        np.asarray(res.obj), np.asarray(res_ref.obj), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(res.z), np.asarray(res_ref.z), atol=1e-12
    )
    # the nominal instance matches the reference objective
    i_nom = int(np.argmin(np.abs(bc[:, 0] - 1.0)))
    # perturbed instances differ; just sanity-bound the nominal one
    assert abs(float(res.obj[i_nom]) - LQR_OBJECTIVE * bc[i_nom, 0] ** 2) < 0.05


def test_replicate_for_batch():
    tree = {"a": jnp.ones((3,)), "b": (jnp.zeros((2, 2)),)}
    out = replicate_for_batch(tree, 5)
    assert out["a"].shape == (5, 3)
    assert out["b"][0].shape == (5, 2, 2)
