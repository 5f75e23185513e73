"""Unit tests of the interior-point solver on small analytic NLPs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pockit_tpu.solver import Bounds, IPOptions, make_ip_solver


def _no_con(z, rt):
    return jnp.zeros((0,))


def test_bound_constrained_quadratic():
    f = lambda z, rt: (z[0] - 1.0) ** 2 + (z[1] + 2.0) ** 2
    solve = jax.jit(make_ip_solver(f, _no_con, 2, 0))
    b = Bounds(
        jnp.array([2.0, -jnp.inf]),
        jnp.array([jnp.inf, jnp.inf]),
        jnp.zeros(0),
        jnp.zeros(0),
    )
    r = solve(jnp.array([5.0, 5.0]), b)
    assert int(r.status) == 0
    np.testing.assert_allclose(np.asarray(r.z), [2.0, -2.0], atol=1e-6)
    # active lower bound -> positive bound dual pressure, inactive -> ~0
    assert float(r.kkt_error) < 1e-8


def test_equality_constrained_linear_objective():
    f = lambda z, rt: z[0] + z[1]
    c = lambda z, rt: jnp.array([z[0] ** 2 + z[1] ** 2])
    solve = jax.jit(make_ip_solver(f, c, 2, 1))
    b = Bounds(
        jnp.full(2, -jnp.inf), jnp.full(2, jnp.inf), jnp.array([1.0]), jnp.array([1.0])
    )
    r = solve(jnp.array([0.5, 0.1]), b)
    assert int(r.status) == 0
    np.testing.assert_allclose(
        np.asarray(r.z), [-np.sqrt(0.5), -np.sqrt(0.5)], atol=1e-8
    )
    # multiplier of the active equality: y* = 1/sqrt(2)
    np.testing.assert_allclose(np.asarray(r.y), [np.sqrt(0.5)], atol=1e-7)


def test_inequality_active_at_solution():
    f = lambda z, rt: (z[0] + 1.0) ** 2
    c = lambda z, rt: jnp.array([z[0] ** 2])
    solve = jax.jit(make_ip_solver(f, c, 1, 1))
    b = Bounds(
        jnp.full(1, -jnp.inf),
        jnp.full(1, jnp.inf),
        jnp.array([4.0]),
        jnp.array([jnp.inf]),
    )
    r = solve(jnp.array([-5.0]), b)
    assert int(r.status) == 0
    np.testing.assert_allclose(np.asarray(r.z), [-2.0], atol=1e-6)


def test_rosenbrock_in_box():
    f = lambda z, rt: (1 - z[0]) ** 2 + 100 * (z[1] - z[0] ** 2) ** 2
    solve = jax.jit(make_ip_solver(f, _no_con, 2, 0))
    b = Bounds(
        jnp.array([-2.0, -2.0]), jnp.array([2.0, 2.0]), jnp.zeros(0), jnp.zeros(0)
    )
    r = solve(jnp.array([-1.2, 1.0]), b)
    assert int(r.status) == 0
    np.testing.assert_allclose(np.asarray(r.z), [1.0, 1.0], atol=1e-6)


def test_hs071():
    """Hock-Schittkowski 71 (the IPOPT documentation example):
    min x0*x3*(x0+x1+x2) + x2  s.t.  x0*x1*x2*x3 >= 25,
    sum(x^2) = 40, 1 <= x <= 5; optimum ~17.0140173."""
    f = lambda z, rt: z[0] * z[3] * (z[0] + z[1] + z[2]) + z[2]
    c = lambda z, rt: jnp.array(
        [z[0] * z[1] * z[2] * z[3], z[0] ** 2 + z[1] ** 2 + z[2] ** 2 + z[3] ** 2]
    )
    solve = jax.jit(make_ip_solver(f, c, 4, 2))
    b = Bounds(
        jnp.full(4, 1.0),
        jnp.full(4, 5.0),
        jnp.array([25.0, 40.0]),
        jnp.array([jnp.inf, 40.0]),
    )
    r = solve(jnp.array([1.0, 5.0, 5.0, 1.0]), b)
    assert int(r.status) == 0
    assert float(r.obj) == pytest.approx(17.0140173, abs=1e-5)
    np.testing.assert_allclose(
        np.asarray(r.z), [1.0, 4.742999, 3.821150, 1.379408], atol=1e-4
    )


def test_infeasible_start_recovers():
    """Start far outside the feasible region of an equality constraint."""
    f = lambda z, rt: jnp.sum(z**2)
    c = lambda z, rt: jnp.array([z[0] + z[1] - 4.0])
    solve = jax.jit(make_ip_solver(f, c, 2, 1))
    b = Bounds(
        jnp.full(2, -jnp.inf), jnp.full(2, jnp.inf), jnp.array([0.0]), jnp.array([0.0])
    )
    r = solve(jnp.array([100.0, -200.0]), b)
    assert int(r.status) == 0
    np.testing.assert_allclose(np.asarray(r.z), [2.0, 2.0], atol=1e-7)


def test_runtime_parameter_threading():
    """rt pytree parameters reach the callables (vmappable sweeps)."""
    f = lambda z, rt: (z[0] - rt["target"]) ** 2
    solve = make_ip_solver(f, _no_con, 1, 0)
    b = Bounds(jnp.full(1, -jnp.inf), jnp.full(1, jnp.inf), jnp.zeros(0), jnp.zeros(0))
    targets = jnp.arange(5.0)
    res = jax.jit(
        jax.vmap(lambda t: solve(jnp.array([0.0]), b, {"target": t}))
    )(targets)
    assert np.all(np.asarray(res.status) == 0)
    np.testing.assert_allclose(np.asarray(res.z)[:, 0], np.arange(5.0), atol=1e-7)


def test_trace_records_iterations():
    f = lambda z, rt: (1 - z[0]) ** 2 + 100 * (z[1] - z[0] ** 2) ** 2
    solve = jax.jit(make_ip_solver(f, _no_con, 2, 0, IPOptions(max_iter=50)))
    b = Bounds(
        jnp.array([-2.0, -2.0]), jnp.array([2.0, 2.0]), jnp.zeros(0), jnp.zeros(0)
    )
    r = solve(jnp.array([-1.2, 1.0]), b)
    it = int(r.iterations)
    tr = np.asarray(r.trace)
    assert tr.shape == (50, 6)
    # kkt column is recorded and (weakly) decreasing toward the end
    assert tr[0, 0] > tr[it - 1, 0]
    # mu column is non-increasing
    mus = tr[:it, 1]
    assert np.all(np.diff(mus) <= 1e-12)


def test_matrix_free_ls_init_converges(monkeypatch):
    """Force the matrix-free CG multiplier initialization (used when the
    per-lane Jacobian would be a memory hazard) and check the LQR gate
    still converges to the reference objective."""
    import pockit_tpu.solver.ipm as sipm
    import pockit_tpu.lobatto as lob
    from pockit_tpu.lobatto import constant_guess
    from pockit_tpu.optimizer import ipm as oipm
    from pockit_tpu.solver import IPOptions

    monkeypatch.setattr(sipm, "_LS_INIT_DENSE_MAX_BYTES", 0)
    system = lob.System(["x_f"])
    (x_f,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([-x + u])
    phase.set_integral([x**2 + 0.1 * u**2])
    phase.set_boundary_condition([1], [x_f], 0, 1)
    phase.set_discretization(10, 10)
    system.set_phase([phase])
    system.set_objective(phase.I[0] + x_f**2 / 2)
    guess = constant_guess(phase, 0)
    _, info = oipm.solve(
        system,
        [guess, [0.0]],
        optimizer_options=IPOptions(tol=1e-9, kkt_solver="block"),
    )
    assert info["status"] == 0
    assert abs(float(info["obj_val"]) - 0.2319139744522318) < 1e-9
