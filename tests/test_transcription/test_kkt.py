"""Oracle tests: block-arrow KKT assembly vs whole-vector dense AD.

For every problem here, ``K = W(lam, fct_o) + J^T diag(D) J`` is computed
two ways — dense (``compiled.hessian`` + ``compiled.jacobian``) and via
``make_block_kkt.assemble`` — and the block-arrow storage must gather to
identical values after the dense oracle subtracts the analytic low-rank
remainder the assembly leaves to the CG correction (whose rank must stay
within ``layout.krylov_rank`` — asserted here).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pockit_tpu.lobatto as lobatto
import pockit_tpu.radau as radau
from pockit_tpu.solver.structured import pattern_violation
from pockit_tpu.transcription.kkt import make_block_kkt


def _lqr():
    system = lobatto.System(["x_f"])
    (x_f,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([-x + u])
    phase.set_integral([x**2 + 0.1 * u**2])
    phase.set_boundary_condition([1], [x_f], 0, 1)
    phase.set_discretization(4, 6)
    system.set_phase([phase])
    system.set_objective(phase.I[0] + x_f**2 / 2)
    return system


def _radau_messy():
    import sympy as sp

    system = radau.System(["p"])
    (p_,) = system.s
    phase = system.new_phase(["x", "v"], ["u"])
    x, v = phase.x
    (u,) = phase.u
    t = phase.t
    phase.set_dynamics([v, sp.sin(u) + p_ * x + 0.1 * t])
    phase.set_integral([x**2 + u**2, sp.cos(v)])
    phase.set_phase_constraint([u + x * v], [-2.0], [2.0])
    phase.set_boundary_condition([0.0, p_], [1.0, None], 0.0, None)
    phase.set_discretization(3, 5)
    system.set_phase([phase])
    system.set_objective(phase.I[0] + 0.3 * p_ * phase.I[1] + p_**4)
    return system


def _two_phase():
    system = lobatto.System(["s0"])
    (s0,) = system.s
    phases = []
    for k in range(2):
        ph = system.new_phase(["x"], ["u"])
        (x,) = ph.x
        (u,) = ph.u
        ph.set_dynamics([-0.5 * x + (k + 1) * u])
        ph.set_integral([x**2 + u**2])
        ph.set_boundary_condition(
            [1.0 if k == 0 else s0], [s0 if k == 0 else None], float(k), float(k + 1)
        )
        ph.set_discretization(3, 5)
        phases.append(ph)
    system.set_phase(phases)
    system.set_objective(phases[0].I[0] + phases[1].I[0])
    return system


def _lqr_ragged():
    """hp-refined-style mesh: per-interval degrees differ (LGL)."""
    system = lobatto.System(["x_f"])
    (x_f,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([-x + u])
    phase.set_integral([x**2 + 0.1 * u**2])
    phase.set_boundary_condition([1], [x_f], 0, 1)
    phase.set_discretization([0, 0.25, 0.6, 1.0], [4, 7, 5])
    system.set_phase([phase])
    system.set_objective(phase.I[0] + x_f**2 / 2)
    return system


def _radau_ragged_messy():
    """Ragged Radau mesh + path constraint + FUNC bc + nonlinear head."""
    import sympy as sp

    system = radau.System(["p"])
    (p_,) = system.s
    phase = system.new_phase(["x", "v"], ["u"])
    x, v = phase.x
    (u,) = phase.u
    t = phase.t
    phase.set_dynamics([v, sp.sin(u) + p_ * x + 0.1 * t])
    phase.set_integral([x**2 + u**2, sp.cos(v)])
    phase.set_phase_constraint([u + x * v], [-2.0], [2.0])
    phase.set_boundary_condition([0.0, p_], [1.0, None], 0.0, None)
    phase.set_discretization([0, 0.4, 1.0], [6, 4])
    system.set_phase([phase])
    system.set_objective(phase.I[0] + 0.3 * p_ * phase.I[1] + p_**4)
    return system


def _two_phase_mixed_degree():
    """Phases of DIFFERENT uniform degree: cross-phase ragged blocks."""
    system = lobatto.System(["s0"])
    (s0,) = system.s
    phases = []
    for k, deg in enumerate([4, 6]):
        ph = system.new_phase(["x"], ["u"])
        (x,) = ph.x
        (u,) = ph.u
        ph.set_dynamics([-0.5 * x + (k + 1) * u])
        ph.set_integral([x**2 + u**2])
        ph.set_boundary_condition(
            [1.0 if k == 0 else s0], [s0 if k == 0 else None], float(k), float(k + 1)
        )
        ph.set_discretization(3, deg)
        phases.append(ph)
    system.set_phase(phases)
    system.set_objective(phases[0].I[0] + phases[1].I[0])
    return system


def _with_system_rows():
    system = radau.System(["a", "b"])
    a, b = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([a * x + u])
    phase.set_integral([x**2 + u**2])
    phase.set_boundary_condition([1.0], [b], 0.0, 1.0)
    phase.set_discretization(3, 5)
    system.set_phase([phase])
    system.set_system_constraint([a + b**2], [0.0], [1.5])
    system.set_objective(phase.I[0] + a**2 + b**2)
    return system


def _dense_pattern_oracle(system, ops, z, lam, D, fct_o, rt):
    """Expected pattern matrix: the TRUE dense K minus the analytic
    low-rank remainder the assembly deliberately leaves to the CG —

        K_pattern = K_true - B^T H_II B - B^T H_Is S - (B^T H_Is S)^T
                    - J_sys^T diag(D_sys) J_sys

    with B = dI/dz, S the statics selector, and H the second derivatives
    of the Lagrangian head Phi = fct_o*F_o + y_sys.c_sys at the current
    (I(z), s). Also asserts rank(remainder) <= layout.krylov_rank."""
    compiled = system.compiled
    n_sys = compiled.n_sys_rows
    L = compiled.L
    W = np.asarray(compiled.hessian(z, lam, fct_o))
    J = np.asarray(compiled.jacobian(z))
    K = W + (J.T * D) @ J

    n_I = int(sum(p.n_I for p in system.p))
    n_s = system.n_s
    l_s, r_s = int(system.l_s), int(system.r_s)
    s_val = jnp.asarray(z[l_s:r_s])
    y_sys = jnp.asarray(lam[:n_sys])

    def Phi(I_vec, s_vec):
        args = [I_vec[j] for j in range(n_I)] + [s_vec[k] for k in range(n_s)]
        val = fct_o * jnp.asarray(system.F_o(args)).reshape(())
        for r, fc in enumerate(system.F_c):
            val = val + y_sys[r] * jnp.asarray(fc(args)).reshape(())
        return val

    remainder = np.zeros((L, L))
    if n_I:
        I_val = ops.integrals(jnp.asarray(z), rt)
        B = np.asarray(jax.jacrev(lambda zz: ops.integrals(zz, rt))(jnp.asarray(z)))
        H_II = np.asarray(jax.hessian(lambda Iv: Phi(Iv, s_val))(I_val))
        remainder += B.T @ H_II @ B
        if n_s:
            H_sI = np.asarray(
                jax.jacfwd(lambda sv: jax.grad(lambda Iv: Phi(Iv, sv))(I_val))(
                    s_val
                )
            )  # (n_I, n_s)
            cross = B.T @ H_sI  # (L, n_s)
            remainder[:, l_s:r_s] += cross
            remainder[l_s:r_s, :] += cross.T
    if n_sys:
        J_sys = J[:n_sys]
        remainder += J_sys.T @ (D[:n_sys, None] * J_sys)

    if remainder.any():
        rank = np.linalg.matrix_rank(remainder, tol=1e-8)
        assert rank <= ops.layout.krylov_rank, (rank, ops.layout.krylov_rank)
    return K - remainder


def _expected_blocks(K, layout):
    """Gather the block-arrow pattern out of a dense K, phantom-aware:
    padded slots read zero off-diagonal and carry the unit pivot the
    factor cores expect on the diagonal."""
    L = K.shape[0]
    K_ext = np.zeros((L + 1, L + 1))
    K_ext[:L, :L] = K
    interior, reduced = layout.interior, layout.reduced
    exp_ii = K_ext[interior[:, :, None], interior[:, None, :]]
    exp_ir = K_ext[interior[:, :, None], reduced[None, None, :]]
    pad = interior >= L
    ni = interior.shape[1]
    exp_ii = exp_ii * ~(pad[:, :, None] | pad[:, None, :]) + np.eye(ni)[
        None
    ] * pad[:, :, None]
    exp_rr = K[np.ix_(reduced, reduced)]
    return exp_ii, exp_ir, exp_rr


@pytest.mark.parametrize(
    "builder",
    [
        _lqr,
        _radau_messy,
        _two_phase,
        _with_system_rows,
        _lqr_ragged,
        _radau_ragged_messy,
        _two_phase_mixed_degree,
    ],
    ids=[
        "lqr",
        "radau-messy",
        "two-phase",
        "system-rows",
        "lqr-ragged",
        "radau-ragged",
        "mixed-degree-phases",
    ],
)
def test_block_assembly_matches_dense(builder):
    system = builder()
    ops = make_block_kkt(system)
    assert ops is not None
    layout = ops.layout
    compiled = system.compiled
    rng = np.random.default_rng(7)
    z = rng.normal(0.6, 0.4, compiled.L)
    lam = rng.normal(0, 1, compiled.m)
    D = rng.uniform(0.5, 2.0, compiled.m)
    fct_o = 1.3
    rt = compiled.default_runtime()

    K = _dense_pattern_oracle(system, ops, z, lam, D, fct_o, rt)

    K_ii, K_ir, K_rr = jax.jit(
        lambda z_, y_, D_: ops.assemble(z_, y_, D_, rt, fct_o)
    )(jnp.asarray(z), jnp.asarray(lam), jnp.asarray(D))
    K_ii, K_ir, K_rr = map(np.asarray, (K_ii, K_ir, K_rr))

    exp_ii, exp_ir, exp_rr = _expected_blocks(K, layout)
    for b in range(layout.interior.shape[0]):
        np.testing.assert_allclose(
            K_ii[b], exp_ii[b], atol=1e-9, err_msg=f"K_ii block {b}"
        )
        np.testing.assert_allclose(
            K_ir[b], exp_ir[b], atol=1e-9, err_msg=f"K_ir block {b}"
        )
    np.testing.assert_allclose(K_rr, exp_rr, atol=1e-9, err_msg="K_rr")

    if layout.krylov_rank == 0:
        # the pattern must then be exact: no dense K entries outside it
        assert float(pattern_violation(jnp.asarray(K), layout)) < 1e-9


def test_runtime_bc_values_flow_into_blocks():
    """FIXED boundary values arrive via rt at runtime (batched sweeps);
    the assembled blocks must follow them, not the configured constants."""
    system = _lqr()
    ops = make_block_kkt(system)
    compiled = system.compiled
    rng = np.random.default_rng(3)
    z = rng.normal(0.5, 0.3, compiled.L)
    lam = rng.normal(0, 1, compiled.m)
    D = rng.uniform(0.5, 2.0, compiled.m)

    rt2 = {"bc": tuple(np.asarray(v) * 0 + 1.7 for v in compiled.default_runtime()["bc"])}
    # dense oracle with the same overridden bc
    W = np.asarray(compiled._jitted("hessian")(jnp.asarray(z), jnp.asarray(lam), 1.0, rt2))
    J = np.asarray(compiled._jitted("jacobian")(jnp.asarray(z), rt2))
    K = W + (J.T * D) @ J

    K_ii, K_ir, K_rr = ops.assemble(jnp.asarray(z), jnp.asarray(lam), jnp.asarray(D), rt2)
    exp_ii, _, exp_rr = _expected_blocks(K, ops.layout)
    np.testing.assert_allclose(np.asarray(K_rr), exp_rr, atol=1e-9)
    for b in range(ops.layout.interior.shape[0]):
        np.testing.assert_allclose(np.asarray(K_ii)[b], exp_ii[b], atol=1e-9)


@pytest.mark.parametrize(
    "builder",
    [
        _lqr,
        _radau_messy,
        _two_phase,
        _with_system_rows,
        _lqr_ragged,
        _radau_ragged_messy,
        _two_phase_mixed_degree,
    ],
    ids=[
        "lqr",
        "radau-messy",
        "two-phase",
        "system-rows",
        "lqr-ragged",
        "radau-ragged",
        "mixed-degree-phases",
    ],
)
def test_pointwise_matches_interval_ad(builder):
    """The production pointwise assembly must equal the whole-interval
    AD oracle exactly (same pattern, same values)."""
    system = builder()
    ops = make_block_kkt(system)
    compiled = system.compiled
    rng = np.random.default_rng(11)
    z = rng.normal(0.4, 0.5, compiled.L)
    lam = rng.normal(0, 1, compiled.m)
    D = rng.uniform(0.5, 2.0, compiled.m)
    rt = compiled.default_runtime()
    out_pt = ops.assemble(jnp.asarray(z), jnp.asarray(lam), jnp.asarray(D), rt, 0.7)
    out_ad = ops.assemble_ad(jnp.asarray(z), jnp.asarray(lam), jnp.asarray(D), rt, 0.7)
    for a, b, name in zip(out_pt, out_ad, ["K_ii", "K_ir", "K_rr"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10, err_msg=name)
