"""Pallas fused block-arrow KKT path (interpret mode on the CPU mesh).

Validates the batch-in-lanes factorization/back-solve kernels
(``solver/pallas_kkt.py``) against the XLA block-arrow core and f64
ground truth, the ``custom_vmap`` closure-threading interface, and
end-to-end solver parity with ``kkt_solver="block"``.

Reference analog: MUMPS inside IPOPT
(``/root/reference/pockit/optimizer/ipopt.py:41-53``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pockit_tpu.solver.pallas_kkt import make_newton_dir

F32 = jnp.float32


def _block_arrow_problem(seed, nb=4, ni=6, nr=7, B=8, coupling=0.3):
    rng = np.random.default_rng(seed)
    n = nb * ni + nr
    interior = np.arange(nb * ni).reshape(nb, ni)
    reduced = np.arange(nb * ni, n)

    def spd(m, batch):
        A = rng.standard_normal((batch, m, m))
        return A @ np.swapaxes(A, -1, -2) + m * np.eye(m)

    K_ii = spd(ni, B * nb).reshape(B, nb, ni, ni).astype(np.float32)
    K_ir = (rng.standard_normal((B, nb, ni, nr)) * coupling).astype(np.float32)
    K_rr = (spd(nr, B) + 4 * nr * np.eye(nr)).astype(np.float32)
    rhs = rng.standard_normal((B, n)).astype(np.float32)
    return interior, reduced, n, K_ii, K_ir, K_rr, rhs


def _dense(interior, reduced, n, K_ii, K_ir, K_rr, b):
    K = np.zeros((n, n))
    for k in range(interior.shape[0]):
        idx = interior[k]
        K[np.ix_(idx, idx)] += K_ii[b, k]
        K[np.ix_(idx, reduced)] += K_ir[b, k]
        K[np.ix_(reduced, idx)] += K_ir[b, k].T
    K[np.ix_(reduced, reduced)] += K_rr[b]
    return K


def _make(interior, reduced, n, **kw):
    opts = dict(
        pivot_rtol=1e-7,
        max_reg_tries=8,
        delta_w_floor=1e-8,
        delta_w_max=1e10,
        interpret=True,
    )
    opts.update(kw)
    return make_newton_dir(interior, reduced, n, **opts)


class TestNewtonDir:
    def test_batched_matches_dense_truth(self):
        interior, reduced, n, K_ii, K_ir, K_rr, rhs = _block_arrow_problem(0)
        newton, apply_one, _ = _make(interior, reduced, n)
        B = rhs.shape[0]

        def body(kii, kir, krr, b):
            dz, fac, delta, ok = newton(
                kii, kir, krr, b, jnp.asarray(0.0, F32), jnp.asarray(1e6, F32),
                jnp.asarray(True),
            )
            x2 = apply_one(fac, b + 0.5 * dz)  # closure-threaded factors
            return dz, x2, delta, ok

        dz, x2, delta, ok = jax.jit(jax.vmap(body))(
            *(jnp.asarray(a) for a in (K_ii, K_ir, K_rr, rhs))
        )
        assert bool(jnp.all(ok))
        assert float(jnp.max(delta)) == 0.0
        for b in range(0, B, 3):
            K = _dense(interior, reduced, n, K_ii, K_ir, K_rr, b)
            ref = np.linalg.solve(K, rhs[b])
            ref2 = np.linalg.solve(K, rhs[b] + 0.5 * np.asarray(dz[b]))
            denom = np.abs(ref).max()
            assert np.abs(np.asarray(dz[b]) - ref).max() / denom < 5e-5
            assert np.abs(np.asarray(x2[b]) - ref2).max() / denom < 5e-5

    def test_per_lane_fallback(self):
        interior, reduced, n, K_ii, K_ir, K_rr, rhs = _block_arrow_problem(1)
        newton, apply_one, _ = _make(interior, reduced, n)
        dz, fac, delta, ok = jax.jit(newton)(
            *(jnp.asarray(a[0]) for a in (K_ii, K_ir, K_rr, rhs)),
            jnp.asarray(0.0, F32),
            jnp.asarray(1e6, F32),
            jnp.asarray(True),
        )
        assert bool(ok)
        K = _dense(interior, reduced, n, K_ii, K_ir, K_rr, 0)
        ref = np.linalg.solve(K, rhs[0])
        assert np.abs(np.asarray(dz) - ref).max() / np.abs(ref).max() < 5e-5
        x2 = jax.jit(apply_one)(fac, jnp.asarray(rhs[0]))
        assert np.abs(np.asarray(x2) - ref).max() / np.abs(ref).max() < 5e-5

    def test_non_multiple_of_128_batch(self):
        # lane padding path: B=8 pads to 128 internally
        interior, reduced, n, K_ii, K_ir, K_rr, rhs = _block_arrow_problem(
            2, B=5
        )
        newton, _, supports = _make(interior, reduced, n)
        assert supports(5)
        dz, _, _, ok = jax.jit(jax.vmap(
            lambda a, b, c, d: newton(
                a, b, c, d, jnp.asarray(0.0, F32), jnp.asarray(1e6, F32),
                jnp.asarray(True),
            )
        ))(*(jnp.asarray(a) for a in (K_ii, K_ir, K_rr, rhs)))
        assert bool(jnp.all(ok))
        K = _dense(interior, reduced, n, K_ii, K_ir, K_rr, 3)
        ref = np.linalg.solve(K, rhs[3])
        assert np.abs(np.asarray(dz[3]) - ref).max() / np.abs(ref).max() < 5e-5

    def test_inertia_escalation_per_lane_delta(self):
        interior, reduced, n, K_ii, K_ir, K_rr, rhs = _block_arrow_problem(3)
        K_bad = K_ii.copy()
        # spd() floors the min eigenvalue near ni; a shift well past it
        # makes lane 2's first interior block decisively indefinite
        K_bad[2, 0] -= (K_ii.shape[-1] + 40.0) * np.eye(
            K_ii.shape[-1], dtype=np.float32
        )

        newton, _, _ = _make(interior, reduced, n, delta_w_floor=1e-2)
        dz, _, delta, ok = jax.jit(jax.vmap(
            lambda a, b, c, d: newton(
                a, b, c, d, jnp.asarray(0.0, F32), jnp.asarray(1e6, F32),
                jnp.asarray(True),
            )
        ))(*(jnp.asarray(a) for a in (K_bad, K_ir, K_rr, rhs)))
        delta = np.asarray(delta)
        # only the indefinite lane escalates; healthy lanes keep delta=0
        assert delta[2] > 0.0
        assert np.delete(delta, 2).max() == 0.0
        assert bool(jnp.all(ok))


    def test_in_kernel_retry_ladder(self):
        """The block-local retry ladder (attempts > 1) resolves an
        indefinite block inside ONE factor call: the kernel re-factors
        only the failing block at a bumped per-block delta, reports the
        per-block levels in d_blk, passes the block-local acceptance, and
        the factors solve the block-shifted system to f32 accuracy."""
        from pockit_tpu.solver.pallas_kkt import _make_pallas_core

        interior, reduced, n, K_ii, K_ir, K_rr, rhs = _block_arrow_problem(5)
        nb, ni = interior.shape
        B = rhs.shape[0]
        K_bad = K_ii.copy()
        # make interior block 1 of EVERY lane mildly indefinite (min eig
        # ~ -0.5) so the base factorization must retry that block (and
        # only that block) within the in-kernel ladder's reach
        # (floor -> x10 -> x10: max 1.0 at attempts=4)
        K_bad[:, 1] -= (ni + 0.5) * np.eye(ni, dtype=np.float32)

        floor = 1e-2
        core = _make_pallas_core(
            interior, reduced, n, interpret=True,
            pivot_rtol=1e-7, delta_w_floor=floor, attempts=4,
        )
        Kt = core.pad_move(*(jnp.asarray(a) for a in (K_bad, K_ir, K_rr)))
        delta0 = jnp.zeros((Kt[0].shape[-1],), F32)
        fac, pmin, pmax, dused, dblk, okl = core.factor(*Kt, delta0)
        dblk = np.asarray(dblk)[:, :B]
        assert bool(np.asarray(okl)[:B].all()), "retries must restore SPD"
        # only block 1 escalates (most lanes; a lane whose shifted block
        # happens to stay SPD keeps 0); every other block stays at base 0
        assert (dblk[1] >= floor).sum() >= B - 2
        mask = np.ones(nb + 1, bool)
        mask[1] = False
        assert np.abs(dblk[mask]).max() == 0.0
        assert np.allclose(np.asarray(dused)[:B], dblk[1])

        # back-solve + per-block-shift parity vs dense f64 ground truth
        x = np.asarray(core.apply(fac, jnp.asarray(rhs)))
        for lane in range(B):
            K = _dense(interior, reduced, n, K_bad, K_ir, K_rr, lane)
            for k in range(nb):
                K[np.ix_(interior[k], interior[k])] += dblk[k, lane] * np.eye(ni)
            K[np.ix_(reduced, reduced)] += dblk[nb, lane] * np.eye(len(reduced))
            x_ref = np.linalg.solve(K, rhs[lane])
            rel = np.max(np.abs(x[lane] - x_ref)) / max(np.max(np.abs(x_ref)), 1e-30)
            assert rel < 5e-4, (lane, rel)


def _lqr():
    import pockit_tpu.lobatto as lobatto

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


class TestSolverParity:
    def test_e2e_pallas_matches_block(self):
        """kkt_solver='pallas' reproduces the block path's solution
        (reference solve semantics:
        /root/reference/pockit/optimizer/ipopt.py:41-53)."""
        import dataclasses

        from pockit_tpu.optimizer import ipm

        system, guess = _lqr()
        base = ipm.default_options()
        res = {}
        for mode in ("block", "pallas"):
            opts = dataclasses.replace(base, kkt_solver=mode)
            _, info = ipm.solve(system, guess, opts)
            assert info["status"] == 0, mode
            res[mode] = info
        assert (
            abs(res["pallas"]["obj_val"] - res["block"]["obj_val"]) < 1e-8
        )
        np.testing.assert_allclose(
            res["pallas"]["x"], res["block"]["x"], atol=1e-6
        )

    def test_batched_pallas_path(self):
        """solve_batch with kkt_solver='pallas', varied FIXED bcs — the
        custom_vmap batched rule drives the fused kernels."""
        import dataclasses

        from pockit_tpu.optimizer import ipm
        from pockit_tpu.optimizer._common import preprocess

        system, guess = _lqr()
        x0, _ = preprocess(system, guess)
        B = 8
        x0b = np.tile(x0, (B, 1))
        compiled = system.compiled
        bc = np.tile(np.asarray(compiled.phases[0].fixed_vals), (B, 1))
        bc[:, 0] = np.random.default_rng(0).uniform(0.5, 1.5, B)
        opts = dataclasses.replace(
            ipm.default_options(), kkt_solver="pallas"
        )
        res = ipm.solve_batch(
            system, x0b, bc_overrides=(bc,), optimizer_options=opts
        )
        assert np.all(np.asarray(res.status) == 0)
        ref = np.asarray(res.obj)[0] / bc[0, 0] ** 2
        np.testing.assert_allclose(
            np.asarray(res.obj), ref * bc[:, 0] ** 2, rtol=1e-6
        )


def _lqr_ragged():
    import pockit_tpu.lobatto as lobatto

    system = lobatto.System(["x_f"])
    (x_f,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([-x + u])
    phase.set_integral([x**2 + 0.1 * u**2])
    phase.set_boundary_condition([1], [x_f], 0, 1)
    phase.set_discretization([0, 0.3, 0.7, 1.0], [6, 8, 7])
    system.set_phase([phase])
    system.set_objective(phase.I[0] + x_f**2 / 2)
    guess = lobatto.constant_guess(phase, 0)
    return system, [guess, [0.0]]


class TestRaggedPallas:
    def test_e2e_ragged_pallas_matches_dense(self):
        """Phantom-padded (ragged hp-mesh) blocks through the fused
        kernels: padded lanes must behave as decoupled unit pivots."""
        import dataclasses

        from pockit_tpu.optimizer import ipm

        system, guess = _lqr_ragged()
        base = ipm.default_options()
        res = {}
        for mode in ("dense", "pallas"):
            opts = dataclasses.replace(base, kkt_solver=mode)
            _, info = ipm.solve(system, guess, opts)
            assert info["status"] == 0, mode
            res[mode] = info
        assert abs(res["pallas"]["obj_val"] - res["dense"]["obj_val"]) < 1e-8
        np.testing.assert_allclose(
            res["pallas"]["x"], res["dense"]["x"], atol=1e-6
        )

    def test_batched_ragged_pallas(self):
        import dataclasses

        from pockit_tpu.optimizer import ipm
        from pockit_tpu.optimizer._common import preprocess

        system, guess = _lqr_ragged()
        x0, _ = preprocess(system, guess)
        B = 8
        x0b = np.tile(x0, (B, 1))
        compiled = system.compiled
        bc = np.tile(np.asarray(compiled.phases[0].fixed_vals), (B, 1))
        bc[:, 0] = np.random.default_rng(0).uniform(0.5, 1.5, B)
        opts = dataclasses.replace(ipm.default_options(), kkt_solver="pallas")
        res = ipm.solve_batch(
            system, x0b, bc_overrides=(bc,), optimizer_options=opts
        )
        assert np.all(np.asarray(res.status) == 0)
        ref = np.asarray(res.obj)[0] / bc[0, 0] ** 2
        np.testing.assert_allclose(
            np.asarray(res.obj), ref * bc[:, 0] ** 2, rtol=1e-6
        )


class TestDeltaWMin:
    def test_floor_applies_while_globalizing_and_releases(self):
        """``delta_w_min`` clamps the factored regularization while theta
        is above the endgame threshold and releases near feasibility so
        the tolerance stays reachable (the f32 inertia-detectability
        floor; BENCH_NOTES r5). Verified on the LQR system through both
        the pallas and block paths via the recorded delta_w trace."""
        import numpy as np

        from pockit_tpu.optimizer import ipm
        from pockit_tpu.solver import IPOptions

        system, guess = _lqr()
        for solver in ("pallas", "block"):
            opts = IPOptions(
                tol=1e-8, max_iter=30, kkt_solver=solver,
                delta_w_min=1e-3,
            )
            val, info = ipm.solve(system, guess, optimizer_options=opts)
            assert info["status"] == 0
            trace = np.asarray(info["trace"])  # [kkt, mu, alpha, dw, theta, phi]
            dw, theta = trace[:, 3], trace[:, 4]
            # iteration 0 starts infeasible -> the floor must be active
            assert theta[0] > 1e-4
            assert dw[0] >= 1e-3 - 1e-12, (solver, dw[0])
            # converged => the endgame release let kkt reach tolerance
            # (a permanently clamped delta biases the step and stalls)
            assert info["kkt_error"] <= 1e-8
