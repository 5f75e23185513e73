#!/usr/bin/env python
"""On-chip cost breakdown of the batched IPM iteration body.

Times the full fixed-iteration batched solve under ablations (refinement
steps, SOC, feasibility fallback, line-search budget) plus isolated
component microbenches (block assembly, Pallas newton/apply, c_fn/f_fn
passes), so optimization effort goes where the wall time actually is.

Protocol (per CLAUDE.md tunnel rules): every timed repetition uses fresh
inputs (identical-input executions can be served from a cache end-to-end)
and completion is forced with a host fetch of a small reduction
(``jax.block_until_ready`` does not block over the axon tunnel).

Usage: python tools/profile_iter.py [B] [iters] [configs...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(x):
    return float(np.asarray(x if x.ndim == 0 else x.reshape(-1)[0]))


def time_fn(fn, make_args, reps=3):
    """Median wall of fn(*make_args()) with fresh args per rep; first call
    (compile) separately."""
    args = make_args()
    t0 = time.time()
    out = fn(*args)
    _fetch(out)
    compile_s = time.time() - t0
    walls = []
    for _ in range(reps):
        args = make_args()
        t0 = time.time()
        out = fn(*args)
        _fetch(out)
        walls.append(time.time() - t0)
    return float(np.median(walls)), compile_s


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import dataclasses

    import jax.numpy as jnp

    from bench import build_lqr
    from pockit_tpu.optimizer import ipm
    from pockit_tpu.optimizer._common import preprocess
    from pockit_tpu.solver import IPOptions

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    only = set(sys.argv[3:])

    system, phase, guess = build_lqr()
    x0, _ = preprocess(system, [guess, [0.0]])
    compiled = system.compiled
    x0b = jnp.asarray(np.tile(x0, (B, 1)))
    rng = np.random.default_rng(0)

    def draw_bc():
        bc = np.tile(compiled.phases[0].fixed_vals, (B, 1))
        bc[:, 0] = rng.uniform(0.5, 1.5, B)
        return (jnp.asarray(bc),)

    base = dict(tol=1e-12, max_iter=ITERS, refine_steps=3, max_ls=8)
    configs = {
        "full_r3": IPOptions(**base),
        "refine1": IPOptions(**{**base, "refine_steps": 1}),
        "refine0": IPOptions(**{**base, "refine_steps": 0}),
        "nosoc": IPOptions(**{**base, "soc": False}),
        "nofb": IPOptions(**{**base, "feasibility_fallback": False}),
        "ls1": IPOptions(**{**base, "max_ls": 1}),
        "reg1": IPOptions(**{**base, "max_reg_tries": 1}),
        "prec_high": IPOptions(**{**base, "matmul_precision": "high"}),
        "min": IPOptions(
            **{
                **base,
                "refine_steps": 0,
                "soc": False,
                "feasibility_fallback": False,
                "max_ls": 1,
            }
        ),
    }

    results = {}
    for name, opts in configs.items():
        if only and name not in only and "solve" not in only:
            continue

        def run(bc, _opts=opts):
            res = ipm.solve_batch(
                system, x0b, bc_overrides=(bc,), optimizer_options=_opts
            )
            return res.obj.sum()  # small reduction; fetch forces completion

        wall, comp = time_fn(lambda bc: run(bc), lambda: draw_bc())
        per = wall / (B * ITERS) * 1e6
        results[name] = (wall, per)
        print(
            f"{name:12s} wall={wall:7.3f}s  per-lane-iter={per:7.2f}us  "
            f"compile={comp:6.1f}s",
            flush=True,
        )

    # ---- component microbenches ------------------------------------
    from pockit_tpu.transcription.kkt import make_block_kkt

    block = make_block_kkt(system)
    n, m = compiled.L, compiled.m
    dtype = jnp.float32

    rt0 = compiled.default_runtime()

    def rt_for(bc):
        return {"bc": (bc,)}

    def fresh_state():
        bc = draw_bc()[0]
        z = x0b + 0.01 * jnp.asarray(rng.standard_normal(x0b.shape), dtype)
        y = jnp.asarray(rng.standard_normal((B, m)), dtype) * 0.01
        D = jnp.abs(jnp.asarray(rng.standard_normal((B, m)), dtype)) + 1.0
        return z, y, D, bc

    if not only or "assemble" in only:
        asm = jax.jit(
            jax.vmap(
                lambda z, y, D, bc: block.assemble(z, y, D, rt_for(bc))[0].sum()
            )
        )
        wall, comp = time_fn(
            lambda z, y, D, bc: asm(z, y, D, bc), fresh_state
        )
        print(
            f"{'assemble':12s} wall={wall:7.3f}s  per-lane-call="
            f"{wall / B * 1e6:7.2f}us  compile={comp:6.1f}s",
            flush=True,
        )

    if not only or "newton" in only:
        from pockit_tpu.solver.pallas_kkt import make_newton_dir

        eps = float(np.finfo(np.float32).eps)
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

        def newton_full(z, y, D, bc):
            K_ii, K_ir, K_rr = jax.vmap(
                lambda zz, yy, dd, b: block.assemble(zz, yy, dd, rt_for(b))
            )(z, y, D, bc)
            rhs = z  # any (B, n) vector works as a rhs
            dz, fac, dw, ok = jax.vmap(
                newton, in_axes=(0, 0, 0, 0, None, None)
            )(K_ii, K_ir, K_rr, rhs, jnp.asarray(0.0, dtype), jnp.asarray(1e9, dtype))
            return dz.sum()

        wall, comp = time_fn(jax.jit(newton_full), fresh_state)
        print(
            f"{'asm+newton':12s} wall={wall:7.3f}s  per-lane-call="
            f"{wall / B * 1e6:7.2f}us  compile={comp:6.1f}s",
            flush=True,
        )

    if not only or "cfn" in only:
        # K sequential batched c_fn evals via scan (the per-iteration
        # line-search/SOC evaluation pattern)
        def c_scan(z, bc):
            def step(c, _):
                v = jax.vmap(lambda zz, b: compiled.constraints_fn(zz, {"bc": (b,)}))(
                    c, bc
                )
                c = c + 1e-6 * jnp.pad(v, ((0, 0), (0, n - m)))
                return c, v.sum()

            _, outs = jax.lax.scan(step, z, None, length=8)
            return outs.sum()

        wall, comp = time_fn(
            jax.jit(c_scan), lambda: (fresh_state()[0], draw_bc()[0])
        )
        print(
            f"{'cfn x8':12s} wall={wall:7.3f}s  per-lane-eval="
            f"{wall / (B * 8) * 1e6:7.2f}us  compile={comp:6.1f}s",
            flush=True,
        )

    print("done")


if __name__ == "__main__":
    main()
