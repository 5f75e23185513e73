"""Assemble the block KKT on the current backend from dumped solver
state (z, y, D, bc) and compare against the dump's (CPU-assembled)
blocks; then run the Pallas newton_dir escalation ladder on the
locally-assembled blocks. Localizes whether the chip's in-solver
assembly differs enough to flip the pivot test.

Usage: python tools/assemble_compare.py /tmp/kkt0.npz [--cpu]
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

    z = jnp.asarray(d["z"])
    y = jnp.asarray(d["y"])
    D = jnp.asarray(d["D"])
    bc = jnp.asarray(d["bc"])
    rt = {"bc": (bc,)}

    with jax.default_matmul_precision("highest"):
        K_ii, K_ir, K_rr = jax.jit(
            lambda z, y, D: blk.assemble(z, y, D, rt)
        )(z, y, D)
        K_ii = np.asarray(K_ii)
        K_ir = np.asarray(K_ir)
        K_rr = np.asarray(K_rr)

    for name, local, ref in (
        ("K_ii", K_ii, d["K_ii"]),
        ("K_ir", K_ir, d["K_ir"]),
        ("K_rr", K_rr, d["K_rr"]),
    ):
        dd = np.max(np.abs(local.astype(np.float64) - ref.astype(np.float64)))
        s = np.max(np.abs(ref)) + 1e-30
        print(
            f"{name}: max|local-dump|={dd:.4g} rel={dd / s:.3g} "
            f"max|dump|={np.max(np.abs(ref)):.4g}",
            flush=True,
        )

    # escalation ladder on the locally-assembled blocks
    eps32 = float(np.finfo(np.float32).eps)
    newton_dir, _, _ = make_newton_dir(
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
    tile = lambda a: jnp.asarray(np.broadcast_to(a, (B,) + a.shape).copy())
    rhs_b = tile(np.asarray(d["rhs"]))
    dreg_b = tile(np.asarray(d["dreg"]))
    cap_b = tile(np.asarray(d["cap"]))

    def lane(K_ii, K_ir, K_rr, rhs, dreg, cap):
        return newton_dir(K_ii, K_ir, K_rr, rhs, dreg, cap, jnp.asarray(True))

    with jax.default_matmul_precision("highest"):
        dz, _, delta, ok = jax.jit(jax.vmap(lane))(
            tile(K_ii), tile(K_ir), tile(K_rr), rhs_b, dreg_b, cap_b
        )
        dz = np.asarray(dz)
        delta = np.asarray(delta)
        ok = np.asarray(ok)
    print(
        f"backend={jax.default_backend()} local-assembled newton: "
        f"ok={ok.mean():.4f} delta={delta[0]:.4g} max|dz|={np.max(np.abs(dz[0])):.4g}",
        flush=True,
    )


if __name__ == "__main__":
    main()
