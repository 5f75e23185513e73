"""Homotopy / continuation sweeps over batched problem instances.

A continuation sweep solves a family of problems along a parameter path
(e.g. relaxing a constraint, ramping a boundary condition), warm-starting
every stage from the previous stage's solutions — the standard way to reach
hard targets that defeat cold starts. Here each stage is one batched solve,
so the whole sweep is a handful of device launches regardless of batch
size. No reference analog (pockit re-solves manually; SURVEY §5).

Long sweeps are durable: pass ``checkpoint_path`` and completed stages are
persisted **incrementally** — one small per-stage summary file appended per
stage, the (B, L) warm-start batch overwritten in place, and a tiny
manifest renamed last as the commit point — so per-stage checkpoint cost is
O(1) in the stage count (a 20-stage production sweep writes each record
once, not a growing stack 20 times over). Re-running the same sweep after
a kill resumes from the last stage with a saved warm-start batch — no
manual ``on_stage`` plumbing needed. ``checkpoint_every`` strides the
expensive (B, L) warm-batch host fetch for sweeps where the tunnel fetch
dominates (resume then re-solves at most ``checkpoint_every - 1`` stages).
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from pockit_tpu.optimizer import ipm
from pockit_tpu.solver import IPOptions


class StageSummary(NamedTuple):
    """Lightweight record returned for stages restored from a sweep
    checkpoint (full ``IPResult`` traces/duals are not retained across a
    restart; the fields below are what continuation drivers consume)."""

    status: np.ndarray
    obj: np.ndarray
    iterations: np.ndarray
    kkt_error: np.ndarray
    z: Optional[np.ndarray]  # warm-start batch; kept for the last stage only


def _sweep_digest(guess_batch, bc_stages) -> str:
    """Fingerprint of the sweep definition, so a stale checkpoint from a
    different sweep is never silently resumed."""
    h = hashlib.sha1()
    g = np.asarray(guess_batch)
    h.update(str(g.shape).encode())
    h.update(np.ascontiguousarray(g, dtype=np.float64).tobytes())
    for bc in bc_stages:
        for arr in bc:
            a = np.asarray(arr)
            h.update(str(a.shape).encode())
            h.update(np.ascontiguousarray(a, dtype=np.float64).tobytes())
    return h.hexdigest()


def _atomic_savez(path, **arrays):
    # suffix must stay ".npz" or np.savez appends one to the tmp name
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def _stage_file(ckdir, k):
    return os.path.join(ckdir, f"stage_{k:05d}.npz")


def _commit_stage(ckdir, digest, k, res, warm_stage):
    """Persist stage ``k``: one O(B) summary file, the (B, L) warm batch
    iff ``warm_stage == k``, then the manifest rename as the commit point.
    Every write is write-to-temp + rename, so a kill at any point leaves
    the previous commit intact."""
    _atomic_savez(
        _stage_file(ckdir, k),
        status=np.asarray(res.status),
        obj=np.asarray(res.obj),
        iterations=np.asarray(res.iterations),
        kkt_error=np.asarray(res.kkt_error),
    )
    if warm_stage == k:
        _atomic_savez(os.path.join(ckdir, "warm.npz"), z=np.asarray(res.z))
    _atomic_savez(
        os.path.join(ckdir, "manifest.npz"),
        digest=np.frombuffer(digest.encode(), dtype=np.uint8),
        stage=np.asarray(k),
        warm_stage=np.asarray(warm_stage),
    )


def _load_manifest(ckdir):
    """Returns (digest, warm_stage, stage) or (None, -1, -1)."""
    path = os.path.join(ckdir, "manifest.npz")
    if not os.path.exists(path):
        return None, -1, -1
    with np.load(path) as f:
        return (
            bytes(f["digest"]).decode(),
            int(f["warm_stage"]),
            int(f["stage"]),
        )


def homotopy_sweep(
    system,
    guess_batch: np.ndarray,
    bc_stages: Sequence,
    optimizer_options: Optional[IPOptions] = None,
    on_stage: Optional[Callable] = None,
    checkpoint_path: Optional[str] = None,
    resume: bool = True,
    checkpoint_every: int = 1,
):
    """Solve a batched continuation sweep.

    Args:
        system: fully configured ``System``.
        guess_batch: (B, L) initial vectors for stage 0.
        bc_stages: sequence of per-stage ``bc_overrides`` (each a tuple of
            (B, n_fixed) arrays, one per phase) describing the continuation
            path of the FIXED boundary values.
        optimizer_options: shared solver options.
        on_stage: optional callback ``(stage_index, IPResult) -> None``
            (metrics, extra checkpointing). Not invoked for stages restored
            from a checkpoint.
        checkpoint_path: when set, a checkpoint DIRECTORY: each completed
            stage appends one small summary file and atomically updates the
            warm-start batch + manifest (write-then-rename; the manifest
            rename is the commit point). Per-stage cost is O(1) in the
            stage count.
        resume: when True (default) and ``checkpoint_path`` holds a
            checkpoint whose fingerprint matches this sweep, completed
            stages are skipped and the sweep continues from the saved
            warm-start batch. A non-matching checkpoint is ignored (the
            sweep restarts from stage 0 and overwrites it).
        checkpoint_every: persist the (B, L) warm-start batch only every
            N-th stage (summaries are still written every stage). The
            host fetch of the warm batch is the dominant checkpoint cost
            over a remote-device tunnel; striding it trades resume work
            (at most ``checkpoint_every - 1`` stages re-solved) for
            sweep throughput. The final stage always saves the batch.

    Returns:
        list of per-stage results: restored stages appear as
        :class:`StageSummary`, freshly solved stages as full ``IPResult``;
        stage k+1 warm-starts from stage k's primal solutions.
    """
    bc_stages = list(bc_stages)
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    digest = (
        _sweep_digest(guess_batch, bc_stages) if checkpoint_path else None
    )
    results: list = []
    start = 0
    z = jnp.asarray(guess_batch)

    if checkpoint_path and resume:
        saved_digest, warm_stage, _ = _load_manifest(checkpoint_path)
        if saved_digest is not None and saved_digest == digest and warm_stage >= 0:
            # resume from the last stage with a saved warm batch: stages
            # after it (summary-only commits) are re-solved
            start = warm_stage + 1
            with np.load(os.path.join(checkpoint_path, "warm.npz")) as f:
                z_host = np.asarray(f["z"])
            z = jnp.asarray(z_host)
            for k in range(start):
                with np.load(_stage_file(checkpoint_path, k)) as f:
                    results.append(
                        StageSummary(
                            status=np.asarray(f["status"]),
                            obj=np.asarray(f["obj"]),
                            iterations=np.asarray(f["iterations"]),
                            kkt_error=np.asarray(f["kkt_error"]),
                            z=z_host if k == start - 1 else None,
                        )
                    )
        elif saved_digest is not None and saved_digest != digest:
            import warnings

            warnings.warn(
                "homotopy checkpoint at "
                f"{checkpoint_path!r} belongs to a different sweep "
                "(fingerprint mismatch); restarting from stage 0"
            )

    if checkpoint_path:
        os.makedirs(checkpoint_path, exist_ok=True)
    last_warm = start - 1  # stage whose z is in warm.npz; -1 = none yet

    for k in range(start, len(bc_stages)):
        res = ipm.solve_batch(
            system,
            z,
            bc_overrides=bc_stages[k],
            optimizer_options=optimizer_options,
        )
        if checkpoint_path:
            # durability costs one host fetch of the O(B) stage summaries;
            # the (B, L) warm batch is fetched only on warm-save stages
            save_warm = (
                (k - start) % checkpoint_every == checkpoint_every - 1
                or k == len(bc_stages) - 1
            )
            if save_warm:
                last_warm = k
            _commit_stage(checkpoint_path, digest, k, res, last_warm)
        # no host sync otherwise: stage k+1 chains on res.z device-side, and
        # callers that need host values fetch them (np.asarray) — a
        # block_until_ready would be misleading anyway on remote-tunnel
        # backends where it does not actually block
        if on_stage is not None:
            on_stage(k, res)
        results.append(res)
        z = res.z
    return results
