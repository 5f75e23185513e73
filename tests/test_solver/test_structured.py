"""Structured (interval-Schur) KKT solve vs the dense oracle.

Builds real KKT matrices K = W + Σ_z + Jᵀ D J from compiled systems
(random multipliers/weights), asserts the block-arrow pattern is exact,
and checks the structured solve matches the dense solve to roundoff.
"""

import numpy as np
import pytest
import sympy as sp

import pockit_tpu.lobatto as lobatto
import pockit_tpu.radau as radau
from pockit_tpu.solver.structured import (
    make_structured_solve,
    pattern_violation,
    structured_layout,
)


def _orbit(mod, mesh=5, deg=6):
    system = mod.System(["r_f"])
    (r_f,) = system.s
    phase = system.new_phase(["r", "u", "v"], ["phi"])
    r, u, v = phase.x
    (phi,) = phase.u
    t = phase.t
    acc = 0.1405 / (1 - 0.0749 * t)
    phase.set_dynamics(
        [
            u,
            v**2 / r - 1 / r**2 + acc * sp.sin(phi),
            -u * v / r + acc * sp.cos(phi),
        ]
    )
    phase.set_phase_constraint([phi + 0.1 * r], [-10.0], [10.0])
    phase.set_boundary_condition(
        [1.0, 0.0, 1.0], [r_f, 0.0, 1 / sp.sqrt(r_f)], 0.0, 3.32
    )
    phase.set_discretization(mesh, deg)
    system.set_phase([phase])
    system.set_objective(-r_f)
    return system, phase


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
    return system, phase


def _build_K(system, seed=0):
    rng = np.random.default_rng(seed)
    compiled = system.compiled
    L, m = compiled.L, compiled.m
    z = rng.uniform(0.5, 1.2, L)
    lam = rng.normal(0, 1, m)
    W = np.asarray(system.compiled.hessian(z, lam, 1.0))
    J = np.asarray(system.compiled.jacobian(z))
    D = rng.uniform(0.1, 10.0, m)
    sigma = rng.uniform(0.01, 5.0, L)
    K = W + np.diag(sigma) + (J.T * D) @ J
    # make it PD so the Cholesky-based solves apply
    evals = np.linalg.eigvalsh(K)
    if evals.min() < 1e-6:
        K = K + (1e-3 - min(evals.min(), 0)) * np.eye(L)
    return K


@pytest.mark.parametrize(
    "builder", [lambda: _orbit(lobatto), lambda: _orbit(radau), _lqr],
    ids=["orbit-lobatto", "orbit-radau", "lqr"],
)
def test_structured_matches_dense(builder):
    system, phase = builder()
    layout = structured_layout(system)
    assert layout is not None
    K = _build_K(system)
    # the block-arrow pattern must be exact
    assert float(pattern_violation(K, layout)) < 1e-10

    rng = np.random.default_rng(1)
    rhs = rng.normal(size=system.L)
    solve = make_structured_solve(layout)
    x, p_min, p_max = solve(K, rhs)
    x_dense = np.linalg.solve(K, rhs)
    np.testing.assert_allclose(np.asarray(x), x_dense, rtol=1e-8, atol=1e-9)
    assert float(p_min) > 0


def test_layout_low_rank_and_rejects():
    # nonlinear-in-I objective: I0 is Hessian-involved -> rank 1
    system, phase = _lqr()
    (x_f,) = system.s
    system.set_objective(phase.I[0] ** 2)
    layout = structured_layout(system)
    assert layout is not None and layout.krylov_rank == 1
    # a system row LINEAR in an integral: only its dense Jacobian row
    # counts (the y_sys-weighted first-order curvature is assembled
    # in-pattern at the current multipliers) -> rank n_c = 1
    system2, phase2 = _lqr()
    system2.set_system_constraint([phase2.I[0] * 2.0], [0.0], [10.0])
    layout2 = structured_layout(system2)
    assert layout2 is not None and layout2.krylov_rank == 1
    # a system row NONLINEAR in an integral adds the Hessian involvement
    system2b, phase2b = _lqr()
    system2b.set_system_constraint([phase2b.I[0] ** 2], [0.0], [10.0])
    layout2b = structured_layout(system2b)
    assert layout2b is not None and layout2b.krylov_rank == 2
    # cross-phase and I-s couplings are counted (regression: the old scan
    # was within-phase only)
    system2c, phase2c = _lqr()
    (x_fc,) = system2c.s
    system2c.set_objective(phase2c.I[0] * x_fc)
    layout2c = structured_layout(system2c)
    assert layout2c is not None and layout2c.krylov_rank == 2  # I0 + x_f
    # non-uniform degrees: padded (phantom-column) layout, not a rejection
    system3, phase3 = _lqr()
    phase3.set_discretization(np.array([0.0, 0.4, 1.0]), np.array([6, 8]))
    system3.update()
    layout3 = structured_layout(system3)
    assert layout3 is not None
    pad3 = np.asarray(layout3.interior) >= int(system3.L)
    assert pad3.any() and not pad3[:, 0].any()  # padded, at the tail only
    real3 = np.asarray(layout3.interior)[~pad3]
    covered = np.concatenate([real3, np.asarray(layout3.reduced)])
    assert len(np.unique(covered)) == int(system3.L) == len(covered)


def test_pcg_handles_low_rank_coupling():
    """Nonlinear-in-I objective + a system constraint produce dense
    low-rank coupling outside the pattern; the pattern-preconditioned CG
    solve must still match the dense oracle."""
    system, phase = _lqr()
    system.set_objective(phase.I[0] ** 2 + system.s[0] ** 2)
    system.set_system_constraint([phase.I[0] * 1.5], [-10.0], [10.0])
    layout = structured_layout(system)
    assert layout is not None and layout.krylov_rank >= 2
    K = _build_K(system, seed=7)
    # the pattern is NOT exact here
    from pockit_tpu.solver.structured import pattern_violation

    assert float(pattern_violation(K, layout)) > 1e-8
    rng = np.random.default_rng(11)
    rhs = rng.normal(size=system.L)
    solve = make_structured_solve(layout)
    x, p_min, _ = solve(K, rhs)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(K, rhs), rtol=1e-7, atol=1e-8
    )


def test_multiphase_layout():
    """Two linked phases: each phase contributes its own blocks; statics
    and both time pairs land in the reduced set."""
    system = lobatto.System(["x_a"])
    (x_a,) = system.s
    phases = []
    for bc0, bcf, t0, t1 in [(1.0, x_a, 0.0, 0.5), (x_a, None, 0.5, 1.0)]:
        ph = system.new_phase(["x"], ["u"])
        (x,) = ph.x
        (u,) = ph.u
        ph.set_dynamics([-x + u])
        ph.set_integral([x**2 + u**2])
        ph.set_boundary_condition([bc0], [bcf], t0, t1)
        ph.set_discretization(3, 7)
        phases.append(ph)
    system.set_phase(phases)
    system.set_objective(phases[0].I[0] + phases[1].I[0])
    layout = structured_layout(system)
    assert layout is not None
    K = _build_K(system, seed=3)
    assert float(pattern_violation(K, layout)) < 1e-10
    rhs = np.random.default_rng(2).normal(size=system.L)
    solve = make_structured_solve(layout)
    x, p_min, _ = solve(K, rhs)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(K, rhs), rtol=1e-8, atol=1e-9
    )


def test_unrolled_core_matches_lax():
    """The unrolled (expander-free) factor/apply must match the LAPACK-backed
    lax path to roundoff, batched over leading axes, and surface non-SPD
    blocks as nan pivots. The unrolled form is the TPU production path: the
    XLA cholesky/triangular_solve expanders produced batch-shape-dependent
    float32 directions inside the solver loop on v5e (B>=1024 regression)."""
    import jax.numpy as jnp

    from pockit_tpu.solver.structured import make_block_arrow_core

    rng = np.random.default_rng(3)
    nb, ni, nr = 5, 9, 12
    n = nb * ni + nr
    interior = np.arange(nb * ni).reshape(nb, ni)
    reduced = np.arange(nb * ni, n)
    M = rng.normal(size=(n, n))
    K = M @ M.T + n * np.eye(n)
    allowed = np.zeros((n, n), bool)
    for b in range(nb):
        allowed[np.ix_(interior[b], interior[b])] = True
    allowed[:, reduced] = True
    allowed[reduced, :] = True
    K = np.where(allowed, K, 0.0)
    K = (K + K.T) / 2 + n * np.eye(n)
    K_ii = np.stack([K[np.ix_(interior[b], interior[b])] for b in range(nb)])
    K_ir = np.stack([K[np.ix_(interior[b], reduced)] for b in range(nb)])
    K_rr = K[np.ix_(reduced, reduced)]
    rhs = rng.normal(size=n)

    results = {}
    for method in ("lax", "unrolled"):
        factor, apply_ = make_block_arrow_core(
            interior, reduced, n, method=method
        )
        fac, p_min, p_max = factor(
            jnp.asarray(K_ii), jnp.asarray(K_ir), jnp.asarray(K_rr)
        )
        x = np.asarray(apply_(fac, jnp.asarray(rhs)))
        assert float(p_min) > 0 and np.isfinite(float(p_max))
        np.testing.assert_allclose(K @ x, rhs, rtol=0, atol=1e-8)
        results[method] = x
    np.testing.assert_allclose(
        results["unrolled"], results["lax"], rtol=1e-10, atol=1e-12
    )

    # an indefinite interior block must surface as nan pivots (the solver's
    # inertia-escalation loop keys off this)
    K_bad = K_ii.copy()
    K_bad[2] -= 10.0 * n * np.eye(ni)
    factor, _ = make_block_arrow_core(interior, reduced, n, method="unrolled")
    _, p_min, _ = factor(
        jnp.asarray(K_bad), jnp.asarray(K_ir), jnp.asarray(K_rr)
    )
    assert np.isnan(float(p_min))


def test_blocked_core_matches_lax_wide_reduced():
    """Wide reduced blocks (nr >= _BLOCKED_MIN — wide meshes / many
    linked phases) route the unrolled method through the BLOCKED
    panel factorization (compile-light: the fully-unrolled trace at
    orbit's nr=126 took >1 h of XLA compile on chip). Parity vs the
    LAPACK path plus the nan-pivot contract must hold there too."""
    import jax.numpy as jnp

    from pockit_tpu.solver.structured import (
        _BLOCKED_MIN,
        make_block_arrow_core,
    )

    rng = np.random.default_rng(9)
    nb, ni, nr = 4, 7, _BLOCKED_MIN + 9  # non-multiple of the panel width
    n = nb * ni + nr
    interior = np.arange(nb * ni).reshape(nb, ni)
    reduced = np.arange(nb * ni, n)
    M = rng.normal(size=(n, n))
    K = M @ M.T + n * np.eye(n)
    allowed = np.zeros((n, n), bool)
    for b in range(nb):
        allowed[np.ix_(interior[b], interior[b])] = True
    allowed[:, reduced] = True
    allowed[reduced, :] = True
    K = np.where(allowed, K, 0.0)
    K = (K + K.T) / 2 + n * np.eye(n)
    K_ii = np.stack([K[np.ix_(interior[b], interior[b])] for b in range(nb)])
    K_ir = np.stack([K[np.ix_(interior[b], reduced)] for b in range(nb)])
    K_rr = K[np.ix_(reduced, reduced)]
    rhs = rng.normal(size=n)

    results = {}
    for method in ("lax", "unrolled"):
        factor, apply_ = make_block_arrow_core(
            interior, reduced, n, method=method
        )
        fac, p_min, p_max = factor(
            jnp.asarray(K_ii), jnp.asarray(K_ir), jnp.asarray(K_rr)
        )
        x = np.asarray(apply_(fac, jnp.asarray(rhs)))
        assert float(p_min) > 0 and np.isfinite(float(p_max))
        np.testing.assert_allclose(K @ x, rhs, rtol=0, atol=1e-8)
        results[method] = x
    np.testing.assert_allclose(
        results["unrolled"], results["lax"], rtol=1e-9, atol=1e-11
    )

    # indefinite REDUCED Schur block -> nan pivots through the blocked path
    K_rr_bad = K_rr - 10.0 * n * np.eye(nr)
    factor, _ = make_block_arrow_core(interior, reduced, n, method="unrolled")
    _, p_min, _ = factor(
        jnp.asarray(K_ii), jnp.asarray(K_ir), jnp.asarray(K_rr_bad)
    )
    assert np.isnan(float(p_min))


def test_structured_matches_dense_ragged():
    """Dense-K structured solve on a RAGGED (phantom-padded) layout: the
    padded gather must read zeros (not clamp) and carry unit pivots."""
    system, phase = _lqr()
    phase.set_discretization(np.array([0.0, 0.3, 0.7, 1.0]), np.array([6, 8, 7]))
    system.update()
    layout = structured_layout(system)
    assert layout is not None
    assert (np.asarray(layout.interior) >= int(system.L)).any()
    K = _build_K(system)
    assert float(pattern_violation(K, layout)) < 1e-10

    rng = np.random.default_rng(5)
    rhs = rng.normal(size=system.L)
    solve = make_structured_solve(layout)
    x, p_min, p_max = solve(K, rhs)
    x_dense = np.linalg.solve(K, rhs)
    np.testing.assert_allclose(np.asarray(x), x_dense, rtol=1e-8, atol=1e-9)
    assert float(p_min) > 0
