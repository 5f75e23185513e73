"""Homotopy / continuation sweeps over batched problem instances.

A continuation sweep solves a family of problems along a parameter path
(e.g. relaxing a constraint, ramping a boundary condition), warm-starting
every stage from the previous stage's solutions — the standard way to reach
hard targets that defeat cold starts. Here each stage is one batched solve,
so the whole sweep is a handful of device launches regardless of batch
size. No reference analog (pockit re-solves manually; SURVEY §5).

Long sweeps are durable: pass ``checkpoint_path`` and every completed stage
is persisted atomically (write + rename); re-running the same sweep after a
kill resumes from the first incomplete stage with the saved warm-start
batch — no manual ``on_stage`` plumbing needed.
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


def _save_stage(path, digest, stage, z, hist):
    # suffix must stay ".npz" or np.savez appends one to the tmp name
    tmp = path + ".tmp.npz"
    np.savez(
        tmp,
        digest=np.frombuffer(digest.encode(), dtype=np.uint8),
        stage=np.asarray(stage),
        z=np.asarray(z),
        status=np.stack(hist["status"]),
        obj=np.stack(hist["obj"]),
        iterations=np.stack(hist["iterations"]),
        kkt_error=np.stack(hist["kkt_error"]),
    )
    os.replace(tmp, path)


def homotopy_sweep(
    system,
    guess_batch: np.ndarray,
    bc_stages: Sequence,
    optimizer_options: Optional[IPOptions] = None,
    on_stage: Optional[Callable] = None,
    checkpoint_path: Optional[str] = None,
    resume: bool = True,
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
        checkpoint_path: when set, each completed stage is written there
            atomically (``.npz``; write-then-rename), including the
            warm-start batch for the next stage and per-stage summaries.
        resume: when True (default) and ``checkpoint_path`` holds a
            checkpoint whose fingerprint matches this sweep, completed
            stages are skipped and the sweep continues from the saved
            warm-start batch. A non-matching checkpoint is ignored (the
            sweep restarts from stage 0 and overwrites it).

    Returns:
        list of per-stage results: restored stages appear as
        :class:`StageSummary`, freshly solved stages as full ``IPResult``;
        stage k+1 warm-starts from stage k's primal solutions.
    """
    bc_stages = list(bc_stages)
    digest = (
        _sweep_digest(guess_batch, bc_stages) if checkpoint_path else None
    )
    hist = {"status": [], "obj": [], "iterations": [], "kkt_error": []}
    results: list = []
    start = 0
    z = jnp.asarray(guess_batch)

    if checkpoint_path and resume and os.path.exists(checkpoint_path):
        with np.load(checkpoint_path) as f:
            saved_digest = bytes(f["digest"]).decode()
            if saved_digest == digest:
                start = int(f["stage"]) + 1
                z = jnp.asarray(f["z"])
                for k in range(start):
                    results.append(
                        StageSummary(
                            status=f["status"][k],
                            obj=f["obj"][k],
                            iterations=f["iterations"][k],
                            kkt_error=f["kkt_error"][k],
                            z=np.asarray(f["z"]) if k == start - 1 else None,
                        )
                    )
                for key in hist:
                    hist[key] = list(f[key])
            else:
                import warnings

                warnings.warn(
                    "homotopy checkpoint at "
                    f"{checkpoint_path!r} belongs to a different sweep "
                    "(fingerprint mismatch); restarting from stage 0"
                )

    for k in range(start, len(bc_stages)):
        res = ipm.solve_batch(
            system,
            z,
            bc_overrides=bc_stages[k],
            optimizer_options=optimizer_options,
        )
        if checkpoint_path:
            # durability costs one host fetch of the stage outputs; the
            # rename makes a kill mid-write harmless (old stage survives)
            hist["status"].append(np.asarray(res.status))
            hist["obj"].append(np.asarray(res.obj))
            hist["iterations"].append(np.asarray(res.iterations))
            hist["kkt_error"].append(np.asarray(res.kkt_error))
            _save_stage(checkpoint_path, digest, k, res.z, hist)
        # no host sync otherwise: stage k+1 chains on res.z device-side, and
        # callers that need host values fetch them (np.asarray) — a
        # block_until_ready would be misleading anyway on remote-tunnel
        # backends where it does not actually block
        if on_stage is not None:
            on_stage(k, res)
        results.append(res)
        z = res.z
    return results
