"""Minimal on-chip e2e bisection: batched LQR convergence per kkt_solver.

Both the "pallas" and "block" modes share the one-hot block assembly
(transcription/kkt.py); they differ only in the factor/apply core. A
failure in both implicates the assembly; pallas-only failure implicates
the Mosaic kernels.

Usage: python tools/e2e_probe.py [B] [modes...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_lqr
    from pockit_tpu.optimizer import ipm
    from pockit_tpu.optimizer._common import preprocess
    from pockit_tpu.solver import IPOptions

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    modes = sys.argv[2:] or ["pallas", "block"]

    system, phase, guess = build_lqr()
    x0, _ = preprocess(system, [guess, [0.0]])
    compiled = system.compiled
    x0b = jnp.asarray(np.tile(x0, (B, 1)))
    rng = np.random.default_rng(0)
    J1 = 0.2319139744522318

    bc = np.tile(compiled.phases[0].fixed_vals, (B, 1))
    bc[:, 0] = rng.uniform(0.5, 1.5, B)

    for mode in modes:
        opts = IPOptions(tol=5e-6, max_iter=30, refine_steps=3, kkt_solver=mode)
        t0 = time.time()
        res = ipm.solve_batch(
            system,
            x0b,
            bc_overrides=(jnp.asarray(bc),),
            optimizer_options=opts,
        )
        status = np.asarray(res.status)
        obj = np.asarray(res.obj)
        iters = np.asarray(res.iterations)
        parity = np.max(np.abs(obj - J1 * bc[:, 0] ** 2))
        print(
            f"mode={mode}: conv={(status == 0).mean():.4f} "
            f"parity={parity:.3g} mean_iters={iters.mean():.2f} "
            f"wall={time.time() - t0:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
