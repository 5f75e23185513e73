"""Per-iteration solver trace for one pallas-path batched LQR solve.

Prints lane-0 (and a mid-batch lane's) per-iteration rows. Standard rows
are [kkt_error, mu, alpha, delta_w, theta, phi]; with
POCKIT_IPM_DEBUG_TRACE=1 they become Newton internals
[max|rhs|, max|K_ii|, max|dz|, max|dy|, max|J^T y|, max|J dz|].

Run on CPU (interpret-mode pallas, known good) and on the chip; the
first row that differs localizes the on-chip divergence.

Usage: python tools/debug_trace_probe.py [B] [mode] [--cpu]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 256
    mode = args[1] if len(args) > 1 else "pallas"

    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from bench import build_lqr
    from pockit_tpu.optimizer import ipm
    from pockit_tpu.optimizer._common import preprocess
    from pockit_tpu.solver import IPOptions

    system, phase, guess = build_lqr()
    x0, _ = preprocess(system, [guess, [0.0]])
    compiled = system.compiled
    x0b = jnp.asarray(np.tile(x0, (B, 1)))
    rng = np.random.default_rng(0)
    bc = np.tile(compiled.phases[0].fixed_vals, (B, 1))
    bc[:, 0] = rng.uniform(0.5, 1.5, B)

    rs = int(os.environ.get("PROBE_REFINE_STEPS", "3"))
    opts = IPOptions(tol=5e-6, max_iter=8, refine_steps=rs, kkt_solver=mode)
    res = ipm.solve_batch(
        system, x0b, bc_overrides=(jnp.asarray(bc),), optimizer_options=opts
    )
    status = np.asarray(res.status)
    print(
        f"backend={jax.default_backend()} mode={mode} B={B} "
        f"conv={(status == 0).mean():.4f}",
        flush=True,
    )
    trace = np.asarray(res.trace)
    iters = np.asarray(res.iterations)
    for lane in (0, B // 2):
        print(f"lane {lane}: status={status[lane]} iters={iters[lane]}")
        for i in range(min(int(iters[lane]), 8)):
            row = " ".join(f"{v:12.5g}" for v in trace[lane, i])
            print(f"  it{i}: {row}")


if __name__ == "__main__":
    main()
