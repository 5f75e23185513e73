"""Compile-probe the Pallas factor kernel at bench shapes on the TPU.

The block-local-retry factor kernel's scoped-VMEM footprint only
surfaces at Mosaic compile time on the chip (lower-checking on CPU
catches lowering errors but not the 16 MB stack limit). This probe
builds the kernel at the flagship bench structure (LQR 10x10 LGL:
10 interior blocks of 16, reduced size 25) and a Goddard-like wider
structure, compiles factor+apply, and runs one tiny batch to verify
numerics come back finite. Seconds of chip time, no solver involved.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def probe(nb, ni, nr, attempts, B=256):
    from pockit_tpu.solver import pallas_kkt

    n = nb * ni + nr
    interior = np.arange(nb * ni).reshape(nb, ni)
    reduced = np.arange(nb * ni, n)
    core = pallas_kkt._make_pallas_core(
        interior, reduced, n, attempts=attempts
    )
    rng = np.random.default_rng(0)
    dtype = jnp.float32
    # SPD-ish blocks: A A^T + shift
    A = rng.standard_normal((B, nb, ni, ni)).astype(np.float32)
    K_ii = jnp.asarray(A @ np.swapaxes(A, -1, -2) + 3.0 * np.eye(ni, dtype=np.float32))
    K_ir = jnp.asarray(rng.standard_normal((B, nb, ni, nr)).astype(np.float32) * 0.1)
    R = rng.standard_normal((B, nr, nr)).astype(np.float32)
    K_rr = jnp.asarray(R @ np.swapaxes(R, -1, -2) + 3.0 * np.eye(nr, dtype=np.float32))
    delta = jnp.zeros((B,), dtype)

    t0 = time.time()
    Kt = core.pad_move(K_ii, K_ir, K_rr)
    fac, pmin, pmax, dused, dblk, okl = core.factor(*Kt, jnp.pad(delta, (0, Kt[0].shape[-1] - B)))
    rhs = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    x = core.apply(fac, rhs)
    x_h = np.asarray(x)
    pmin_h = np.asarray(pmin)[:B]
    t1 = time.time()
    ok = np.isfinite(x_h).all() and np.isfinite(pmin_h).all()
    print(
        f"probe nb={nb} ni={ni} nr={nr} attempts={attempts}: "
        f"compile+run {t1 - t0:.1f}s finite={ok} pmin_med={np.median(pmin_h):.3g}",
        flush=True,
    )
    return ok


def main():
    print("devices:", jax.devices(), flush=True)
    ok = True
    # flagship bench structure (LQR 10x10 LGL)
    ok &= probe(10, 16, 25, attempts=3)
    # wider reduced block (multi-phase style)
    ok &= probe(6, 24, 40, attempts=3)
    print("VMEM_PROBE_OK" if ok else "VMEM_PROBE_FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
