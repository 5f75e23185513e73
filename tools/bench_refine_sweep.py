"""Host-vs-device time split of a batched refine sweep.

VERDICT r2 item 3's done-criterion: at B >= 4096 the host share of a
refine-sweep's wall time must be < 10%. This script runs an LQR sweep
with per-instance initial states on a deliberately-coarse mesh (so the
continuous check fails and every instance p-refines — few bucket
signatures, the production sweep shape) and reports wall time, device
time (bucket solves + batched error stats), and the host remainder
(adapt/plan/write-back bookkeeping).

Usage: python tools/bench_refine_sweep.py [B] [rounds] [--cpu]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 4096
    rounds = int(args[1]) if len(args) > 1 else 2

    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import pockit_tpu.radau as radau
    from pockit_tpu.optimizer import ipm
    from pockit_tpu.parallel import refine_batch

    # f32 practitioner tolerance: the converged residual on a refined mesh
    # measures ~5e-7 on chip (full-precision error operators), so 1e-5 is
    # comfortably attainable; f64 keeps the 1e-8 default
    f64 = jax.config.read("jax_enable_x64")
    tol = 1e-8 if f64 else 1e-5

    system = radau.System(0)
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([-(x**3) + u])
    phase.set_integral([x**2 + u**2])
    phase.set_boundary_condition([1.0], [None], 0.0, 1.0)
    phase.set_discretization(2, 4)  # coarse: fails 1e-8, p-refines
    system.set_phase([phase])
    system.set_objective(phase.I[0])

    guess = radau.linear_guess(phase, 0.5)

    rng = np.random.default_rng(5)
    x0 = rng.uniform(0.5, 1.5, B)
    compiled = system.compiled
    bc = np.tile(np.asarray(compiled.phases[0].fixed_vals), (B, 1))
    slot_x0 = list(np.asarray(compiled.phases[0].fixed_idx)).index(
        int(phase.l_v[0])
    )
    bc[:, slot_x0] = x0

    # instrument the device-side entry points
    device_t = {"solve": 0.0, "stats": 0.0}
    n_calls = {"solve": 0, "stats": 0}

    real_solve = ipm.solve_batch
    real_stats = refine_batch._bucket_stats

    def timed_solve(*a, **k):
        t0 = time.time()
        out = real_solve(*a, **k)
        np.asarray(out.z)  # force completion (remote links don't block)
        device_t["solve"] += time.time() - t0
        n_calls["solve"] += 1
        return out

    def timed_stats(*a, **k):
        t0 = time.time()
        out = real_stats(*a, **k)  # returns host numpy (already fetched)
        device_t["stats"] += time.time() - t0
        n_calls["stats"] += 1
        return out

    ipm.solve_batch = timed_solve
    refine_batch._bucket_stats = timed_stats
    try:
        t0 = time.time()
        res = refine_batch.solve_refine_batch(
            system,
            guess,
            bc_overrides=(bc,),
            max_refine_rounds=rounds,
            check_kw=dict(
                absolute_tolerance_continuous=tol,
                relative_tolerance_continuous=tol,
            ),
            refine_kw=dict(
                absolute_tolerance_continuous=tol,
                relative_tolerance_continuous=tol,
            ),
        )
        wall = time.time() - t0
    finally:
        ipm.solve_batch = real_solve
        refine_batch._bucket_stats = real_stats

    dev = device_t["solve"] + device_t["stats"]
    host = wall - dev
    print(
        f"B={B} rounds={res.rounds_used} buckets={res.n_bucket_solves} "
        f"converged={int(np.sum(res.status == 0))}/{B} "
        f"passed={int(np.sum(res.passed))}/{B}"
    )
    print(
        f"wall={wall:.2f}s solve={device_t['solve']:.2f}s "
        f"({n_calls['solve']} calls) stats={device_t['stats']:.2f}s "
        f"({n_calls['stats']} calls) host={host:.2f}s "
        f"host_frac={host / wall:.3f}"
    )


if __name__ == "__main__":
    main()
