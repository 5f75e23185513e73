"""Minimal reproduction harness for the in-solver Pallas divergence.

The isolated newton_dir accepts the real iteration-0 KKT system at
delta=1.19e-5 on chip, but the full solver (same inputs verified
identical) escalates to 1.19e-2. The difference left is the compilation
context: newton_dir inlined inside a vmapped lax.while_loop alongside
the apply kernels. This harness mimics that structure with the dumped
real blocks: an outer while_loop whose body calls newton_dir (dreg fed
back from the previous delta, LM-style) and then a few apply calls, all
under vmap+jit.

Usage: python tools/loop_context_probe.py /tmp/kkt0.npz [--cpu]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    path = sys.argv[1]
    d = np.load(path)

    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from bench import build_lqr
    from pockit_tpu.solver.pallas_kkt import make_newton_dir
    from pockit_tpu.transcription import kkt as tkkt

    system, _, _ = build_lqr()
    blk = tkkt.make_block_kkt(system)
    n = int(system.L)

    eps32 = float(np.finfo(np.float32).eps)
    newton_dir, apply_one, _ = make_newton_dir(
        np.asarray(blk.interior_pad),
        np.asarray(blk.layout.reduced),
        n,
        pivot_rtol=2.0 * float(np.sqrt(eps32)),
        max_reg_tries=10,
        delta_w_floor=10.0 * eps32,
        delta_w_max=1e20,
        refine_steps=3,
        interpret=jax.default_backend() != "tpu",
    )

    B = 128
    tile = lambda a: jnp.asarray(np.broadcast_to(np.asarray(a), (B,) + np.asarray(a).shape).copy())
    K_ii = tile(d["K_ii"])
    K_ir = tile(d["K_ir"])
    K_rr = tile(d["K_rr"])
    rhs = tile(d["rhs"])
    cap = tile(d["cap"])

    def lane(K_ii, K_ir, K_rr, rhs, cap):
        def body(carry):
            it, dreg, _, _, _ = carry
            dz, fac, delta, ok = newton_dir(
                K_ii, K_ir, K_rr, rhs, dreg, cap, jnp.asarray(True)
            )
            # a couple of apply calls like the solver's SOC/fallback
            x1 = apply_one(fac, rhs - dz)
            x2 = apply_one(fac, dz)
            probe = jnp.max(jnp.abs(x1)) + jnp.max(jnp.abs(x2))
            # LM-style memory: decay on success like the solver
            dreg_n = jnp.where(ok, delta / 3.0, delta * 10.0)
            return it + 1, dreg_n, delta, ok, probe

        def cond(carry):
            return carry[0] < 3

        _, _, delta, ok, probe = jax.lax.while_loop(
            cond, body, (
                jnp.asarray(0, jnp.int32),
                jnp.asarray(0.0, jnp.float32),
                jnp.asarray(0.0, jnp.float32),
                jnp.asarray(False),
                jnp.asarray(0.0, jnp.float32),
            )
        )
        return delta, ok, probe

    with jax.default_matmul_precision("highest"):
        delta, ok, probe = jax.jit(jax.vmap(lane))(K_ii, K_ir, K_rr, rhs, cap)
        delta = np.asarray(delta)
        ok = np.asarray(ok)
        probe = np.asarray(probe)
    print(
        f"backend={jax.default_backend()}: ok={ok.mean():.4f} "
        f"delta lane0={delta[0]:.4g} med={np.median(delta):.4g} "
        f"max={delta.max():.4g} probe={probe[0]:.4g}",
        flush=True,
    )


if __name__ == "__main__":
    main()
