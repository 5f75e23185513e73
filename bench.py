#!/usr/bin/env python
"""Benchmark: batched LQR solves/s on one chip.

Solves B instances of the README LQR problem (10 subintervals x 10 LGL
points — the reference's headline configuration, ``/root/reference/
README.md:70-89``) with perturbed initial conditions, using the native
batched interior-point solver in float32 on the TPU.

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": "solves/s", "vs_baseline": ...}
vs_baseline is measured against the BASELINE.json target of 4096 batched
solves/s per host.
"""

import json
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


def main():
    import jax
    import jax.numpy as jnp

    from pockit_tpu.optimizer import ipm
    from pockit_tpu.optimizer._common import preprocess
    from pockit_tpu.solver import Bounds, IPOptions

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    system, phase, guess = build_lqr()
    x0, _ = preprocess(system, [guess, [0.0]])
    compiled = system.compiled

    # per-instance perturbed initial condition x(0) in [0.5, 1.5]
    rng = np.random.default_rng(0)
    x0_batch = np.tile(x0, (B, 1))
    bc_vals = np.tile(compiled.phases[0].fixed_vals, (B, 1))
    # FIXED slots for this problem: [x(0), t_0, t_f] (x_f is FUNC-free)
    bc_vals[:, 0] = rng.uniform(0.5, 1.5, B)

    opts = IPOptions(tol=5e-6, max_iter=80, refine_steps=1)
    t0 = time.time()
    res = ipm.solve_batch(
        system, x0_batch, bc_overrides=(jnp.asarray(bc_vals),), optimizer_options=opts
    )
    jax.block_until_ready(res)
    compile_and_first = time.time() - t0

    def run():
        r = ipm.solve_batch(
            system,
            x0_batch,
            bc_overrides=(jnp.asarray(bc_vals),),
            optimizer_options=opts,
        )
        jax.block_until_ready(r)
        return r

    # timed runs
    n_rep = 3
    t0 = time.time()
    for _ in range(n_rep):
        res = run()
    dt = (time.time() - t0) / n_rep

    status = np.asarray(res.status)
    conv = float((status == 0).mean())
    obj = np.asarray(res.obj)
    # objective parity: LQR cost scales as x(0)^2, so every instance has
    # the analytic value J(1) * x0^2 with J(1) the published IPOPT objective
    J1 = 0.2319139744522318
    parity_err = float(np.max(np.abs(obj - J1 * bc_vals[:, 0] ** 2)))
    solves_per_s = B / dt

    print(
        json.dumps(
            {
                "metric": "batched LQR solves/s (10x10 LGL mesh, f32 TPU)",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / 4096.0, 3),
                "batch": B,
                "converged_frac": round(conv, 4),
                "wall_s_per_batch": round(dt, 4),
                "compile_s": round(compile_and_first, 1),
                "mean_iters": float(np.asarray(res.iterations).mean()),
                "max_objective_parity_error": parity_err,
            }
        )
    )


if __name__ == "__main__":
    main()
