"""Replay dumped block-KKT inputs through the Pallas newton_dir.

Feed a POCKIT_DUMP_KKT capture (real solver iteration-0 blocks) to the
kernel on the current backend and report |dz|, delta, ok — run on CPU
(interpret, known-good) and on the chip to localize Mosaic-only
divergence with REAL data.

Usage:
  POCKIT_DUMP_KKT=/tmp/kkt0.npz python tools/debug_trace_probe.py 256 pallas --cpu
  python tools/replay_kkt.py /tmp/kkt0.npz [--cpu]
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
    interior = np.asarray(blk.interior_pad)
    reduced = np.asarray(blk.layout.reduced)
    n = int(system.L)

    eps32 = float(np.finfo(np.float32).eps)
    newton_dir, apply_one, _ = make_newton_dir(
        interior,
        reduced,
        n,
        pivot_rtol=2.0 * float(np.sqrt(eps32)),
        max_reg_tries=10,
        delta_w_floor=10.0 * eps32,
        delta_w_max=1e20,
        refine_steps=int(os.environ.get("REPLAY_REFINE_STEPS", "3")),
        interpret=jax.default_backend() != "tpu",
    )

    K_ii = np.asarray(d["K_ii"])
    K_ir = np.asarray(d["K_ir"])
    K_rr = np.asarray(d["K_rr"])
    rhs = np.asarray(d["rhs"])
    dreg = np.asarray(d["dreg"])
    cap = np.asarray(d["cap"])
    if rhs.ndim == 1:
        # single-lane capture (debug.callback fires per lane under vmap):
        # tile to a full lane tile
        B = 256 if "--vary" in sys.argv else 128
        tile = lambda a: np.broadcast_to(a, (B,) + a.shape).copy()
        K_ii, K_ir, K_rr, rhs = map(tile, (K_ii, K_ir, K_rr, rhs))
        dreg = np.broadcast_to(dreg, (B,)).copy()
        cap = np.broadcast_to(cap, (B,)).copy()
        if "--vary" in sys.argv:
            # per-lane variation like the solver's distinct instances:
            # symmetric relative perturbation of the blocks, scaled rhs
            rng = np.random.default_rng(3)
            s = rng.uniform(0.9, 1.1, B).astype(np.float32)
            K_ii *= s[:, None, None, None]
            K_ir *= s[:, None, None, None]
            K_rr *= s[:, None, None]
            rhs *= rng.uniform(0.9, 1.1, B).astype(np.float32)[:, None]
    K_ii, K_ir, K_rr, rhs, dreg, cap = map(
        jnp.asarray, (K_ii, K_ir, K_rr, rhs, dreg, cap)
    )
    B = rhs.shape[0]

    def lane(K_ii, K_ir, K_rr, rhs, dreg, cap):
        return newton_dir(
            K_ii, K_ir, K_rr, rhs, dreg, cap, jnp.asarray(True)
        )

    with jax.default_matmul_precision("highest"):
        dz, _, delta, ok = jax.jit(jax.vmap(lane))(
            K_ii, K_ir, K_rr, rhs, dreg, cap
        )
        dz = np.asarray(dz)
        delta = np.asarray(delta)
        ok = np.asarray(ok)

    nrm = np.max(np.abs(dz), axis=1)
    # true f64 residual of the REGULARIZED system actually factored:
    # reconstruct dense K from lane-0 blocks at the returned delta
    Kd = np.zeros((n, n))
    Kii0 = np.asarray(K_ii[0], np.float64)
    Kir0 = np.asarray(K_ir[0], np.float64)
    Krr0 = np.asarray(K_rr[0], np.float64)
    for b in range(interior.shape[0]):
        ib = interior[b]
        Kd[np.ix_(ib, ib)] = Kii0[b]
        Kd[np.ix_(ib, reduced)] = Kir0[b]
        Kd[np.ix_(reduced, ib)] = Kir0[b].T
    Kd[np.ix_(reduced, reduced)] = Krr0
    rhs0 = np.asarray(rhs[0], np.float64)
    Kreg = Kd + float(delta[0]) * np.eye(n)
    res = Kreg @ np.asarray(dz[0], np.float64) - rhs0
    relres = np.linalg.norm(res) / np.linalg.norm(rhs0)
    ref = np.linalg.solve(Kreg, rhs0)
    relerr = np.linalg.norm(np.asarray(dz[0], np.float64) - ref) / np.linalg.norm(ref)
    print(
        f"backend={jax.default_backend()} B={B}: ok={ok.mean():.4f} "
        f"max|dz| med={np.median(nrm):.4g} max={nrm.max():.4g} "
        f"delta med={np.median(delta):.3g} max={delta.max():.3g} "
        f"lane0 relres={relres:.3g} relerr={relerr:.3g}",
        flush=True,
    )
    for lane_i in (0, B // 2):
        print(
            f"  lane {lane_i}: ok={ok[lane_i]} max|dz|={nrm[lane_i]:.5g} "
            f"delta={delta[lane_i]:.5g} dz[:4]={np.asarray(dz[lane_i][:4])}",
            flush=True,
        )


if __name__ == "__main__":
    main()
