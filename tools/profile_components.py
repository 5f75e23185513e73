#!/usr/bin/env python
"""Marginal per-component cost of the batched IPM iteration body.

``profile_iter.py`` showed the ablation deltas are small and every
microbench wall sits on a ~0.3 s fixed tunnel floor (dispatch + fetch), so
absolute walls are useless for attributing the ~68 ms/batched-iteration
body cost. This tool times each component CHAINED K times inside one jit
(step k's input depends on step k-1's output, so XLA cannot hoist or cache
repetitions) at two values of K; the difference is the true marginal cost
per call, with the fixed floor subtracted exactly.

Components: block assemble (interval-local AD), Pallas newton
(factor + inertia escalation), back-solve apply, the body's AD bundle
(grad + c linearize + vjp + Lagrangian-gradient linearize), a single c_fn
evaluation, and the filter's phi/theta evaluation.

Usage: python tools/profile_components.py [B] [K_LO] [K_HI]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    from jax import lax

    from bench import build_lqr
    from pockit_tpu.optimizer._common import preprocess
    from pockit_tpu.transcription.kkt import make_block_kkt

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    K_LO = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    K_HI = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    # matmul precision context — the production solver runs its whole body
    # under "highest" (bf16x6 on TPU), so component costs must be compared
    # at the same precision to attribute the body's wall time honestly
    precision = sys.argv[4] if len(sys.argv) > 4 else None

    system, phase, guess = build_lqr()
    compiled = system.compiled
    x0, _ = preprocess(system, [guess, [0.0]])
    block = make_block_kkt(system)
    n, m = compiled.L, compiled.m
    dtype = jnp.float32

    f_fn = compiled.objective_fn
    c_fn = compiled.constraints_fn

    # inputs are generated ON DEVICE from a scalar seed: host->device
    # transfer of (B, n) arrays over the axon tunnel is minutes-slow and
    # would dominate every timed repetition
    x0_dev = jnp.asarray(np.tile(x0, (1, 1)), dtype)  # (1, n), tiny upload
    fixed_dev = jnp.asarray(
        np.tile(compiled.phases[0].fixed_vals, (1, 1)), dtype
    )

    @jax.jit
    def _draw_dev(seed):
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
        z = x0_dev + 0.01 * jax.random.normal(k1, (B, n), dtype)
        y = 0.01 * jax.random.normal(k2, (B, m), dtype)
        D = jnp.abs(jax.random.normal(k3, (B, m), dtype)) + 1.0
        bc = jnp.tile(fixed_dev, (B, 1))
        bc = bc.at[:, 0].set(jax.random.uniform(k4, (B,), dtype, 0.5, 1.5))
        return z, y, D, bc

    _seed = [0]

    def draw():
        _seed[0] += 1
        return _draw_dev(_seed[0])

    def rt_for(bc):
        return {"bc": (bc,)}

    eps = float(np.finfo(np.float32).eps)
    from pockit_tpu.solver.pallas_kkt import make_newton_dir

    newton, apply_one, _ = make_newton_dir(
        block.interior_pad,
        block.layout.reduced,
        n,
        pivot_rtol=2.0 * np.sqrt(eps),
        max_reg_tries=10,
        delta_w_floor=10.0 * eps,
        delta_w_max=1e10,
        interpret=jax.default_backend() != "tpu",
    )

    def chain(z, out_scalar):
        # data-dependence between reps; tiny enough not to change branches
        return z + 1e-9 * out_scalar

    def _jit_p(run):
        if precision:
            def run_p(*a, _run=run):
                with jax.default_matmul_precision(precision):
                    return _run(*a)

            return jax.jit(run_p)
        return jax.jit(run)

    # every step fn takes (z, y, D, bc) carry and returns a scalar
    def mk_scan(step, K):
        def run(z, y, D, bc):
            def body(carry, _):
                z_ = carry
                sc = step(z_, y, D, bc)
                return chain(z_, sc), sc

            zf, outs = lax.scan(body, z, None, length=K)
            return outs.sum() + zf.sum()

        return _jit_p(run)

    def time_fn(fn, reps=3):
        args = draw()
        t0 = time.time()
        np.asarray(fn(*args))
        comp = time.time() - t0
        walls = []
        for _ in range(reps):
            args = draw()
            t0 = time.time()
            np.asarray(fn(*args))
            walls.append(time.time() - t0)
        return float(np.median(walls)), comp

    def marginal(name, step):
        lo, c_lo = time_fn(mk_scan(step, K_LO))
        hi, c_hi = time_fn(mk_scan(step, K_HI))
        per = (hi - lo) / (K_HI - K_LO)
        print(
            f"{name:14s} marginal={per * 1e3:8.3f} ms/call "
            f"({per / B * 1e6:7.3f} us/lane)  "
            f"wall K={K_LO}:{lo:6.3f}s K={K_HI}:{hi:6.3f}s "
            f"compile={c_lo:5.1f}/{c_hi:5.1f}s",
            flush=True,
        )
        return per

    vas = jax.vmap(
        lambda z, y, D, bc: block.assemble(z, y, D, rt_for(bc))
    )

    def step_assemble(z, y, D, bc):
        K_ii, K_ir, K_rr = vas(z, y, D, bc)
        return K_ii.sum() + K_ir.sum() + K_rr.sum()

    # newton's factors are batch-last and marked unbatched by its
    # custom_vmap rule — they cannot cross the vmap boundary, so newton
    # and apply must live inside ONE vmapped per-lane function (exactly
    # how the solver consumes them).
    def step_asm_newton(z, y, D, bc):
        def one(zz, yy, dd, b):
            K_ii, K_ir, K_rr = block.assemble(zz, yy, dd, rt_for(b))
            dz, fac, dw, ok = newton(
                K_ii, K_ir, K_rr, zz,
                jnp.asarray(0.0, dtype), jnp.asarray(1e9, dtype),
                jnp.asarray(True),
            )
            return dz.sum()

        return jax.vmap(one)(z, y, D, bc).sum()

    def step_asm_newton_apply4(z, y, D, bc):
        def one(zz, yy, dd, b):
            K_ii, K_ir, K_rr = block.assemble(zz, yy, dd, rt_for(b))
            dz, fac, dw, ok = newton(
                K_ii, K_ir, K_rr, zz,
                jnp.asarray(0.0, dtype), jnp.asarray(1e9, dtype),
                jnp.asarray(True),
            )
            acc = dz
            for _ in range(4):
                acc = apply_one(fac, acc)
            return acc.sum()

        return jax.vmap(one)(z, y, D, bc).sum()

    def step_cfn(z, y, D, bc):
        v = jax.vmap(lambda zz, b: c_fn(zz, rt_for(b)))(z, bc)
        return v.sum()

    def step_ad_bundle(z, y, D, bc):
        def one(zz, yy, b):
            rt = rt_for(b)
            g = jax.grad(f_fn)(zz, rt)
            c0, j_mv = jax.linearize(lambda v: c_fn(v, rt), zz)
            _, _cvjp = jax.vjp(lambda v: c_fn(v, rt), zz)
            lag_g, w_mv = jax.linearize(
                jax.grad(lambda v: f_fn(v, rt) + c_fn(v, rt) @ yy), zz
            )
            return (
                g.sum()
                + c0.sum()
                + j_mv(zz).sum()
                + _cvjp(c0)[0].sum()
                + lag_g.sum()
                + w_mv(zz).sum()
            )

        return jax.vmap(one)(z, y, bc).sum()

    def step_wmv3(z, y, D, bc):
        def one(zz, yy, b):
            rt = rt_for(b)
            lag_g, w_mv = jax.linearize(
                jax.grad(lambda v: f_fn(v, rt) + c_fn(v, rt) @ yy), zz
            )
            acc = zz
            for _ in range(3):
                acc = w_mv(acc)
            return acc.sum() + lag_g.sum()

        return jax.vmap(one)(z, y, bc).sum()

    def step_phitheta(z, y, D, bc):
        def one(zz, b):
            rt = rt_for(b)
            ph = f_fn(zz, rt)
            th = jnp.sum(jnp.abs(c_fn(zz, rt)))
            return ph + th

        return jax.vmap(one)(z, bc).sum()

    # ---- direct core factor/apply benches (batch-last layout, no
    # custom_vmap, no data-dependent escalation rounds) -----------------
    from pockit_tpu.solver.pallas_kkt import _make_pallas_core

    core = _make_pallas_core(
        block.interior_pad,
        block.layout.reduced,
        n,
        interpret=jax.default_backend() != "tpu",
    )

    def _padded_blocks(z, y, D, bc):
        K_ii, K_ir, K_rr = vas(z, y, D, bc)
        return core.pad_move(K_ii, K_ir, K_rr)

    def step_padmove(z, y, D, bc):
        Kt = _padded_blocks(z, y, D, bc)
        return Kt[0].sum() + Kt[1].sum() + Kt[2].sum()

    def mk_factor_scan(K):
        def run(z, y, D, bc):
            Kii_t, Kir_t, Krr_t = _padded_blocks(z, y, D, bc)

            def body(carry, _):
                fac, pmin, pmax, dused, dblk, okl = core.factor(
                    Kii_t + carry * 1e-7, Kir_t, Krr_t,
                    jnp.zeros((Kii_t.shape[-1],), dtype),
                )
                return carry + pmin.sum() * 1e-12, pmin.sum()

            _, outs = lax.scan(body, jnp.asarray(0.0, dtype), None, length=K)
            return outs.sum()

        return _jit_p(run)

    def mk_apply_scan(K):
        def run(z, y, D, bc):
            Kt = _padded_blocks(z, y, D, bc)
            fac, pmin, pmax, dused, dblk, okl = core.factor(*Kt, jnp.zeros((Kt[0].shape[-1],), dtype))

            def body(carry, _):
                x = core.apply(fac, carry)
                return 0.5 * carry + x, x.sum()

            _, outs = lax.scan(body, z, None, length=K)
            return outs.sum()

        return _jit_p(run)

    def marginal_mk(name, mk):
        lo, c_lo = time_fn(mk(K_LO))
        hi, c_hi = time_fn(mk(K_HI))
        per = (hi - lo) / (K_HI - K_LO)
        print(
            f"{name:14s} marginal={per * 1e3:8.3f} ms/call "
            f"({per / B * 1e6:7.3f} us/lane)  "
            f"wall K={K_LO}:{lo:6.3f}s K={K_HI}:{hi:6.3f}s "
            f"compile={c_lo:5.1f}/{c_hi:5.1f}s",
            flush=True,
        )
        return per

    print(f"B={B} K={K_LO}->{K_HI} backend={jax.default_backend()} precision={precision}", flush=True)
    t_asm = marginal("assemble", step_assemble)
    marginal("pad_move", step_padmove)
    marginal_mk("core.factor", mk_factor_scan)
    marginal_mk("core.apply", mk_apply_scan)
    t_an = marginal("asm+newton", step_asm_newton)
    t_ana = marginal("asm+nt+4apply", step_asm_newton_apply4)
    t_c = marginal("cfn", step_cfn)
    t_ad = marginal("ad_bundle", step_ad_bundle)
    t_w = marginal("lag+3wmv", step_wmv3)
    t_pt = marginal("phi_theta", step_phitheta)
    print(
        f"derived: newton={1e3 * (t_an - t_asm):.3f} ms  "
        f"apply_chain={1e3 * (t_ana - t_an) / 4:.3f} ms",
        flush=True,
    )
    print("done", flush=True)


if __name__ == "__main__":
    main()
