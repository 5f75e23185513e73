"""Time-axis-sharded structured KKT solve on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import sympy as sp
from jax.sharding import Mesh

import pockit_tpu.lobatto as lobatto
from pockit_tpu.solver.structured import (
    make_sharded_structured_solve,
    make_structured_solve,
    structured_layout,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_structured_matches_dense():
    system = lobatto.System(["r_f"])
    (r_f,) = system.s
    phase = system.new_phase(["r", "u", "v"], ["phi"])
    r, u, v = phase.x
    (phi,) = phase.u
    t = phase.t
    acc = 0.1405 / (1 - 0.0749 * t)
    phase.set_dynamics(
        [u, v**2 / r - 1 / r**2 + acc * sp.sin(phi), -u * v / r + acc * sp.cos(phi)]
    )
    phase.set_boundary_condition(
        [1.0, 0.0, 1.0], [r_f, 0.0, 1 / sp.sqrt(r_f)], 0.0, 3.32
    )
    phase.set_discretization(16, 7)  # 16 intervals -> 2 per device
    system.set_phase([phase])
    system.set_objective(-r_f)

    layout = structured_layout(system)
    assert layout is not None and layout.interior.shape[0] % 8 == 0

    rng = np.random.default_rng(0)
    compiled = system.compiled
    z = rng.uniform(0.5, 1.2, system.L)
    lam = rng.normal(0, 1, compiled.m)
    W = np.asarray(compiled.hessian(z, lam, 1.0))
    J = np.asarray(compiled.jacobian(z))
    K = W + np.diag(rng.uniform(0.1, 5.0, system.L)) + (J.T * rng.uniform(0.1, 10.0, compiled.m)) @ J
    ev = np.linalg.eigvalsh(K)
    if ev.min() < 1e-6:
        K = K + (1e-3 - min(ev.min(), 0)) * np.eye(system.L)
    rhs = rng.normal(size=system.L)

    mesh = Mesh(np.array(jax.devices()[:8]), ("time",))
    solve_sh = make_sharded_structured_solve(layout, mesh, "time")
    x_sh = jax.jit(solve_sh)(jnp.asarray(K), jnp.asarray(rhs))

    x_dense = np.linalg.solve(K, rhs)
    np.testing.assert_allclose(np.asarray(x_sh), x_dense, rtol=1e-8, atol=1e-9)

    # and agrees with the unsharded structured path bitwise-ish
    x_un, _, _ = make_structured_solve(layout)(jnp.asarray(K), jnp.asarray(rhs))
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_un), atol=1e-10)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_structured_unrolled_core():
    """The expander-free (TPU production) primitive set must give the same
    sharded solution as the lax path."""
    system = lobatto.System([])
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([-x + u])
    phase.set_integral([x**2 + u**2])
    phase.set_boundary_condition([1.0], [None], 0.0, 1.0)
    phase.set_discretization(8, 6)  # 8 intervals -> 1 per device
    system.set_phase([phase])
    system.set_objective(phase.I[0])

    layout = structured_layout(system)
    assert layout is not None and layout.interior.shape[0] % 8 == 0

    rng = np.random.default_rng(3)
    compiled = system.compiled
    z = rng.uniform(0.5, 1.2, system.L)
    lam = rng.normal(0, 1, compiled.m)
    W = np.asarray(compiled.hessian(z, lam, 1.0))
    J = np.asarray(compiled.jacobian(z))
    K = (
        W
        + np.diag(rng.uniform(0.1, 5.0, system.L))
        + (J.T * rng.uniform(0.1, 10.0, compiled.m)) @ J
    )
    ev = np.linalg.eigvalsh(K)
    if ev.min() < 1e-6:
        K = K + (1e-3 - min(ev.min(), 0)) * np.eye(system.L)
    rhs = rng.normal(size=system.L)

    mesh = Mesh(np.array(jax.devices()[:8]), ("time",))
    xs = {}
    for method in ("lax", "unrolled"):
        solve_sh = make_sharded_structured_solve(layout, mesh, "time", method=method)
        xs[method] = np.asarray(jax.jit(solve_sh)(jnp.asarray(K), jnp.asarray(rhs)))
        np.testing.assert_allclose(K @ xs[method], rhs, rtol=0, atol=1e-8)
    np.testing.assert_allclose(xs["unrolled"], xs["lax"], rtol=1e-9, atol=1e-11)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_structured_ragged():
    """Ragged (phantom-padded) layout through the time-axis-sharded solve:
    padded gathers read the zero extension, never clamp."""
    system = lobatto.System(["x_f"])
    (x_f,) = system.s
    phase = system.new_phase(["x", "v"], ["u"])
    x, v = phase.x
    (u,) = phase.u
    phase.set_dynamics([v, -x + u])
    phase.set_integral([x**2 + 0.1 * u**2])
    phase.set_boundary_condition([1.0, 0.0], [x_f, None], 0.0, 1.0)
    mesh_pts = np.linspace(0.0, 1.0, 9)
    degs = np.array([5, 6, 5, 6, 5, 6, 5, 6])  # 8 intervals -> 1/device
    phase.set_discretization(mesh_pts, degs)
    system.set_phase([phase])
    system.set_objective(phase.I[0] + x_f**2 / 2)

    layout = structured_layout(system)
    assert layout is not None
    assert (np.asarray(layout.interior) >= int(system.L)).any()

    rng = np.random.default_rng(4)
    compiled = system.compiled
    z = rng.uniform(0.5, 1.2, system.L)
    lam = rng.normal(0, 1, compiled.m)
    W = np.asarray(compiled.hessian(z, lam, 1.0))
    J = np.asarray(compiled.jacobian(z))
    K = (
        W
        + np.diag(rng.uniform(0.1, 5.0, system.L))
        + (J.T * rng.uniform(0.1, 10.0, compiled.m)) @ J
    )
    ev = np.linalg.eigvalsh(K)
    if ev.min() < 1e-6:
        K = K + (1e-3 - min(ev.min(), 0)) * np.eye(system.L)
    rhs = rng.normal(size=system.L)

    mesh = Mesh(np.array(jax.devices()[:8]), ("time",))
    solve_sh = make_sharded_structured_solve(layout, mesh, "time")
    x_sh = jax.jit(solve_sh)(jnp.asarray(K), jnp.asarray(rhs))
    np.testing.assert_allclose(
        np.asarray(x_sh), np.linalg.solve(K, rhs), rtol=1e-8, atol=1e-9
    )
