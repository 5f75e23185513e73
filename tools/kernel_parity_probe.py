"""On-chip parity probe for the Pallas KKT kernels.

Interpret-mode (CPU) parity can pass while real-Mosaic execution
misbehaves; this compares, ON THE CHIP, the Pallas newton_dir/apply
against a host-side numpy dense solve of the same block-arrow system at
production-like batch (default 1024 lanes; pass B to change).

Usage: python tools/kernel_parity_probe.py [B]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 1024

    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pockit_tpu.solver.pallas_kkt import make_newton_dir

    print("backend:", jax.default_backend(), flush=True)

    if "--real-indices" in sys.argv:
        # the flagship LQR's actual (interleaved) interior/reduced column
        # indices — exercises the one-hot placement operators with a real
        # permutation (arange is a near-identity placement)
        from bench import build_lqr
        from pockit_tpu.transcription import kkt as tkkt

        system, _, _ = build_lqr()
        blk = tkkt.make_block_kkt(system)
        interior = np.asarray(blk.interior_pad)
        reduced = np.asarray(blk.layout.reduced)
        nb, ni = interior.shape
        nr = len(reduced)
        n = int(system.L)
        perm = np.concatenate([interior.ravel(), reduced])
        assert len(np.unique(perm)) == n
    else:
        nb, ni, nr = 10, 16, 25
        n = nb * ni + nr
        interior = np.arange(nb * ni).reshape(nb, ni)
        reduced = np.arange(nb * ni, n)

    rng = np.random.default_rng(7)
    A = rng.standard_normal((B, n, n)).astype(np.float64)
    K = (A @ A.transpose(0, 2, 1)) / n + 2.0 * np.eye(n)
    # enforce block-arrow sparsity at the (possibly interleaved) index
    # placement: zero interior-interior cross-block couplings
    mask = np.zeros((n, n), bool)
    for b in range(nb):
        ib = interior[b]
        mask[np.ix_(ib, ib)] = True
        mask[np.ix_(ib, reduced)] = True
        mask[np.ix_(reduced, ib)] = True
    mask[np.ix_(reduced, reduced)] = True
    K = np.where(mask, K, 0.0)
    # re-SPD after masking
    w = np.linalg.eigvalsh(K.astype(np.float64))
    shift = np.maximum(0.0, -w.min(axis=1))[:, None] + 0.5
    K = K + shift[..., None] * np.eye(n)

    K_ii = np.stack(
        [K[:, :, interior[b]][:, interior[b], :] for b in range(nb)], axis=1
    )
    K_ir = np.stack(
        [K[:, :, reduced][:, interior[b], :] for b in range(nb)], axis=1
    )
    K_rr = K[:, :, reduced][:, reduced, :]
    if "--illcond" in sys.argv:
        # drive the pivot-ratio test below the solver's f32 pivot_rtol at
        # delta=0 so the inertia-escalation while_loop actually runs on
        # chip (the well-conditioned default never escalates: delta_max
        # prints 0). Make the first interior block near-rank-1 — Jacobi
        # equilibration cannot fix genuine near-singularity; the huge
        # K_ir^T K_ii^-1 K_ir term also drives the Schur complement
        # indefinite, exercising the nan/retry path like real negative
        # curvature does.
        ib = interior[0]
        u = rng.standard_normal((B, len(ib)))
        blk = u[:, :, None] * u[:, None, :] + 1e-5 * np.eye(len(ib))
        for b_ in range(B):
            K[b_][np.ix_(ib, ib)] = blk[b_]

    rhs = rng.standard_normal((B, n)).astype(np.float64)
    ref = np.linalg.solve(K, rhs[..., None])[..., 0]

    f32 = lambda x: jnp.asarray(x, jnp.float32)

    # the solver's float32 values (ipm.py: max(chol_pivot_rtol,
    # 2 sqrt(eps32)) and max(delta_w_init, 10 eps32))
    eps32 = float(np.finfo(np.float32).eps)
    newton_dir, apply_one, _ = make_newton_dir(
        interior,
        reduced,
        n,
        pivot_rtol=2.0 * float(np.sqrt(eps32)),
        max_reg_tries=10,
        delta_w_floor=10.0 * eps32,
        delta_w_max=1e20,
        refine_steps=2,
        interpret=jax.default_backend() != "tpu",
    )

    # factors never leave the vmapped world (they are threaded as opaque
    # closures — see the pallas_kkt module docstring), so the second
    # apply happens INSIDE the same per-lane function, like the solver
    rhs2 = rng.standard_normal((B, n)).astype(np.float64)
    ref2 = np.linalg.solve(K, rhs2[..., None])[..., 0]

    def lane(K_ii, K_ir, K_rr, rhs, rhs2):
        dz, fac, delta, ok = newton_dir(
            K_ii,
            K_ir,
            K_rr,
            rhs,
            jnp.asarray(0.0, jnp.float32),
            jnp.asarray(1e18, jnp.float32),
            jnp.asarray(True),
        )
        x2 = apply_one(fac, rhs2)
        return dz, x2, delta, ok

    def batched(K_ii, K_ir, K_rr, rhs, rhs2):
        return jax.vmap(lane)(K_ii, K_ir, K_rr, rhs, rhs2)

    # the solver runs everything under matmul precision 'highest'
    # (solver/ipm.py solve()); replicate that here — the placement
    # einsums and refinement matvecs are bf16 garbage otherwise
    with jax.default_matmul_precision("highest"):
        dz, x2, delta, ok = jax.jit(batched)(
            f32(K_ii), f32(K_ir), f32(K_rr), f32(rhs), f32(rhs2)
        )
        dz = np.asarray(dz)
        ok = np.asarray(ok)
        delta = np.asarray(delta)
        x2 = np.asarray(x2)
    # reference against the REGULARIZED system the kernel reports having
    # factored: (K + delta_lane I) — identical to K when delta stays 0
    if delta.max() > 0:
        Kd = K + delta[:, None, None] * np.eye(n)
        ref = np.linalg.solve(Kd, rhs[..., None])[..., 0]
        ref2 = np.linalg.solve(Kd, rhs2[..., None])[..., 0]
    relerr = np.linalg.norm(dz - ref, axis=1) / np.linalg.norm(ref, axis=1)
    print(
        f"newton_dir B={B}: ok={ok.mean():.4f} delta_max={delta.max():.3g} "
        f"esc_frac={(delta > 0).mean():.3f} "
        f"relerr med={np.median(relerr):.3g} max={relerr.max():.3g}",
        flush=True,
    )
    relerr2 = np.linalg.norm(x2 - ref2, axis=1) / np.linalg.norm(ref2, axis=1)
    print(
        f"apply_one  B={B}: relerr med={np.median(relerr2):.3g} "
        f"max={relerr2.max():.3g}",
        flush=True,
    )
    good = (
        ok.mean() > 0.999
        and np.median(relerr) < 1e-3
        and np.median(relerr2) < 1e-3
    )
    print("KERNEL_PARITY_OK" if good else "KERNEL_PARITY_FAIL", flush=True)


if __name__ == "__main__":
    main()
