#!/usr/bin/env python
"""Benchmark: batched LQR solves/s on one chip.

Solves B instances of the README LQR problem (10 subintervals x 10 LGL
points — the reference's headline configuration, ``/root/reference/
README.md:70-89``) with perturbed initial conditions, using the native
batched interior-point solver in float32 on the TPU.

Methodology notes:
- every timed repetition uses DIFFERENT boundary-condition draws (the
  execution environment may cache identical requests end-to-end, which
  would inflate the number);
- the batch drains in two stages: a short-iteration first pass plus a
  straggler pass, because one slow lane otherwise holds the whole batch
  in the while_loop (wall time follows the max, not the mean).

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": "solves/s", "vs_baseline": ...}
vs_baseline is measured against the BASELINE.json target of 4096 batched
solves/s per host.
"""

import json
import os
import sys
import time

import numpy as np


def build_lqr():
    from pockit_tpu.lobatto import System, constant_guess

    a, b, s_, q, r = -1, 1, 1, 1, 0.1
    system = System(["x_f"])
    (x_f,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([a * x + b * u])
    phase.set_integral([q * x**2 + r * u**2])
    phase.set_boundary_condition([1], [x_f], 0, 1)
    phase.set_discretization(10, 10)
    system.set_phase([phase])
    system.set_objective(phase.I[0] + s_ * x_f**2 / 2)
    guess = constant_guess(phase, 0)
    return system, phase, guess


def bench_options():
    """The headline two-stage drain configuration (shared with
    tools/export_bench_artifacts.py so AOT artifacts match).

    First pass: LQR is an equality-constrained QP, so one full Newton
    step is exact up to the delta_c perturbation; the saddle refinement
    polishes that away and the post-loop least-squares dual refresh
    certifies the lane in-program. Measured on chip (r5, B=16384,
    interleaved same-window A/B): max_iter=2 + refine_steps=3 completes
    100% of lanes IN THE FIRST PASS (first_pass_frac 1.0 — the drain
    never dispatches) at 0.45 s/batch vs 0.62 s for the r4 max_iter=4
    config; max_iter=1 caps at 50% converged regardless of refinement
    depth (the second iteration's mu drop + fresh linearization is what
    certifies the far-end lanes). The lean flags (soc/fallback off,
    short line search) stay: under vmap every lane pays for globalization
    features each trial round, and the warm LQR batch never needs them;
    the drain rounds retain the full machinery for any lane the lean
    pass cannot finish.

    pallas_attempts=3: the f32 LQR's delta_c-scaled blocks hover at the
    pivot threshold on chip, and the in-kernel per-block micro-bumps
    (floor-level) resolve them without whole-batch escalation rounds —
    measured load-bearing for the 2-iteration budget (attempts=1:
    converged_frac 0.66, parity 1.3e-4; attempts=3: 1.0, 1.7e-7). The
    GLOBAL default stays 1 because nonuniform bumps measurably harm hard
    nonconvex gates (Goddard; see BENCH_NOTES r5) — this is a
    per-workload tuning knob, and the LQR sweep is the workload here.
    """
    from pockit_tpu.solver import IPOptions

    opts_fast = IPOptions(
        tol=5e-6, max_iter=2, refine_steps=3, max_ls=4,
        soc=False, feasibility_fallback=False, pallas_attempts=3,
    )
    opts_drain = IPOptions(
        tol=5e-6, max_iter=80, refine_steps=3, pallas_attempts=3,
    )
    return opts_fast, opts_drain


def main():
    import jax

    # persistent XLA compilation cache: warm starts skip the multi-minute
    # remote compile entirely (cold-start mitigation, VERDICT item 3)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # seed the working cache from the committed entries: together with
    # the StableHLO artifacts this takes a fresh checkout's cold start
    # from 140-280 s of remote XLA compile down to the ~45 s
    # executable-load floor of the tunnel (BENCH_NOTES r5 "AOT cold
    # start"). Copy, don't point the cache dir at the repo: runs write
    # new entries and must not dirty the tree.
    seed_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "artifacts", "xla_cache")
    if os.path.isdir(seed_dir):
        import shutil

        os.makedirs("/root/repo/.jax_cache", exist_ok=True)
        for name in os.listdir(seed_dir):
            dst = os.path.join("/root/repo/.jax_cache", name)
            if not os.path.exists(dst):
                try:
                    shutil.copy2(os.path.join(seed_dir, name), dst)
                except OSError:
                    pass  # cache seeding is best-effort

    import jax.numpy as jnp

    from pockit_tpu.optimizer import ipm
    from pockit_tpu.optimizer._common import preprocess
    from pockit_tpu.solver import IPOptions

    # default batch 16384: throughput keeps improving past 4096 (measured
    # 4.8k/s @ 4096, 5.1k/s @ 8192, 5.7k/s @ 16384 solves/s on v5e) and
    # memory is nowhere near limiting for the block-arrow path
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    n_rep = 3
    system, phase, guess = build_lqr()
    x0, _ = preprocess(system, [guess, [0.0]])
    compiled = system.compiled
    x0b = jnp.asarray(np.tile(x0, (B, 1)))

    rng = np.random.default_rng(0)

    def draw_bc():
        bc = np.tile(compiled.phases[0].fixed_vals, (B, 1))
        bc[:, 0] = rng.uniform(0.5, 1.5, B)
        return bc

    opts_fast, opts_drain = bench_options()

    # AOT artifacts (tools/export_bench_artifacts.py): a committed
    # StableHLO export of the two solver programs skips their trace cost
    # at cold start; XLA compilation still runs (persistently cached).
    # Any failure falls back to the normal trace path below.
    aot_installed = False
    try:
        from pockit_tpu.utils import aot

        art_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "artifacts")
        p1 = os.path.join(art_dir, aot.artifact_name("bench_lqr_firstpass", B))
        p2 = os.path.join(
            art_dir, aot.artifact_name(f"bench_lqr_drain{max(B // 8, 8)}", B)
        )
        if os.path.exists(p1) and os.path.exists(p2):
            aot.install_batch_solver(system, opts_fast, p1)
            aot.install_drain_round(system, opts_drain, p2)
            aot_installed = True
    except Exception:
        aot_installed = False

    def _clear_aot():
        compiled._ipm_cache.pop((opts_fast, "vmap"), None)
        compiled._ipm_cache.pop((opts_drain, "drain_round"), None)

    def solve_all(bc):
        # x0b stays device-resident: np.asarray here would haul the full
        # (B, L) guess host-side and re-upload it every repetition
        status, obj, iters, _, done1 = ipm.solve_batch_drained(
            system,
            x0b,
            bc_overrides=(jnp.asarray(bc),),
            optimizer_options=opts_drain,
            first_pass_options=opts_fast,
            drain_frac=8,
            max_drain_rounds=4,
            return_first_pass_mask=True,
        )
        return status, obj, iters, done1

    t0 = time.time()
    try:
        solve_all(draw_bc())
    except Exception:
        if not aot_installed:
            raise
        # stale/incompatible artifact: fall back to the trace path
        aot_installed = False
        _clear_aot()
        solve_all(draw_bc())
    compile_s = time.time() - t0

    walls, convs, objs, iter_means, frac_first = [], [], [], [], []
    J1 = 0.2319139744522318
    for rep in range(n_rep):
        if rep > 0 and sum(walls) > 120.0:
            break  # degraded interconnect: settle for fewer repetitions
        bc = draw_bc()
        t0 = time.time()
        status, obj, iters, done1 = solve_all(bc)
        walls.append(time.time() - t0)
        convs.append(float((np.asarray(status) == 0).mean()))
        # LQR cost scales as x(0)^2: analytic parity per instance
        objs.append(float(np.max(np.abs(np.asarray(obj) - J1 * bc[:, 0] ** 2))))
        iter_means.append(float(np.asarray(iters).mean()))
        frac_first.append(float(np.asarray(done1).mean()))

    dt = float(np.median(walls))
    solves_per_s = B / dt
    print(
        json.dumps(
            {
                "metric": "batched LQR solves/s (10x10 LGL mesh, f32 TPU)",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / 4096.0, 3),
                "batch": B,
                "converged_frac": round(float(np.mean(convs)), 4),
                "wall_s_per_batch": round(dt, 4),
                "compile_s": round(compile_s, 1),
                "aot": aot_installed,
                "mean_iters": round(float(np.mean(iter_means)), 2),
                "first_pass_frac": round(float(np.mean(frac_first)), 3),
                "max_objective_parity_error": float(np.max(objs)),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # emit a JSON line even on infrastructure failure
        print(
            json.dumps(
                {
                    "metric": "batched LQR solves/s (10x10 LGL mesh, f32 TPU)",
                    "value": 0.0,
                    "unit": "solves/s",
                    "vs_baseline": 0.0,
                    "error": f"{type(exc).__name__}: {exc}"[:300],
                }
            )
        )
        raise
