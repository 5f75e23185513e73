"""Export AOT solver artifacts for the headline bench configuration.

Run ON THE TARGET PLATFORM (artifacts pin platform + jax version + batch
shape). Produces two StableHLO blobs under ``artifacts/`` that bench.py
installs before its first solve, removing the solver trace cost from
cold start (VERDICT r2 item 4):

- the B-wide first pass (short-iteration budget), and
- the straggler drain round at B/8.

Usage: python tools/export_bench_artifacts.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    Bd = max(B // 8, 8)

    import bench
    from pockit_tpu.utils import aot

    system, phase, guess = bench.build_lqr()
    opts_fast, opts_drain = bench.bench_options()

    art_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts")
    os.makedirs(art_dir, exist_ok=True)

    t0 = time.time()
    blob = aot.export_batch_solver(system, B, opts_fast)
    p1 = os.path.join(art_dir, aot.artifact_name("bench_lqr_firstpass", B))
    with open(p1, "wb") as fh:
        fh.write(blob)
    print(f"{p1}: {len(blob) / 1e6:.2f} MB ({time.time() - t0:.1f}s)")

    t0 = time.time()
    blob = aot.export_drain_round(system, B, Bd, opts_drain)
    p2 = os.path.join(art_dir, aot.artifact_name(f"bench_lqr_drain{Bd}", B))
    with open(p2, "wb") as fh:
        fh.write(blob)
    print(f"{p2}: {len(blob) / 1e6:.2f} MB ({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()
