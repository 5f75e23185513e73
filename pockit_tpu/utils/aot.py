"""Ahead-of-time solver artifacts (``jax.export``).

Cold-starting a batched solve costs two things: tracing the solver program
(tens of seconds of pure Python/JAX work — the persistent compilation
cache cannot help with it) and XLA compilation (cached by
``jax_compilation_cache_dir``). Exporting the traced program to a
StableHLO artifact removes the trace cost entirely: production processes
deserialize the artifact (milliseconds) and go straight to (cached)
compilation — the "compile once, deploy everywhere on this platform"
story a serving fleet needs.

The reference has no analog (it JIT-compiles Numba kernels per process,
``/root/reference/pockit/base/fastfunc.py``); this is TPU-deployment
infrastructure.

Caveats:

- an artifact pins the platform it was lowered for (export on TPU to run
  on TPU), the batch size, the mesh/degree layout, and the solver
  options — one artifact per production configuration;
- custom-call compatibility follows jax.export's guarantees (~6 months
  of jaxlib releases).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from pockit_tpu.solver import IPOptions


def _register_result_type() -> None:
    """The artifact's output pytree contains IPResult; namedtuple pytree
    nodes must be registered for (de)serialization. Lazy + idempotent so
    importing pockit_tpu.utils stays light."""
    from pockit_tpu.solver.ipm import IPResult

    try:
        jax_export.register_namedtuple_serialization(
            IPResult, serialized_name="pockit_tpu.solver.ipm.IPResult"
        )
    except ValueError:
        pass


def export_batch_solver(
    system,
    batch_size: int,
    optimizer_options: Optional[IPOptions] = None,
) -> bytes:
    """Trace + lower the batched solve once and serialize it.

    The artifact's calling convention is ``(guess_batch, *bc_batches) ->
    IPResult`` with ``guess_batch (B, L)`` and one ``(B, n_fixed)`` array
    per phase (the FIXED boundary values — the per-instance data of a
    sweep). Bounds are baked in from the system configuration.
    """
    from pockit_tpu.optimizer.ipm import _solver_for
    from pockit_tpu.solver import broadcast_bounds

    _register_result_type()
    compiled, solve_fn, bounds0 = _solver_for(system, optimizer_options)
    B = int(batch_size)
    dtype = np.float64 if jax.config.jax_enable_x64 else np.float32

    bounds_b = broadcast_bounds(bounds0, B)

    def f(z0_batch, *bc_batches):
        return jax.vmap(solve_fn)(z0_batch, bounds_b, {"bc": tuple(bc_batches)})

    z_shape = jax.ShapeDtypeStruct((B, compiled.L), dtype)
    bc_shapes = tuple(
        jax.ShapeDtypeStruct((B,) + np.asarray(v).shape, dtype)
        for v in compiled.default_runtime()["bc"]
    )
    exported = jax_export.export(jax.jit(f))(z_shape, *bc_shapes)
    return exported.serialize()


def save_batch_solver(path, system, batch_size, optimizer_options=None) -> None:
    """``export_batch_solver`` straight to a file."""
    blob = export_batch_solver(system, batch_size, optimizer_options)
    with open(path, "wb") as fh:
        fh.write(blob)


def load_batch_solver(path_or_bytes):
    """Deserialize an exported batch solver; returns ``call(z0, *bc)``.

    No tracing happens — the artifact goes straight to (persistently
    cached) XLA compilation on first call.
    """
    _register_result_type()
    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as fh:
            blob = fh.read()
    exported = jax_export.deserialize(blob)
    return exported.call


def artifact_name(tag: str, batch_size: int) -> str:
    """Canonical artifact filename: pins the platform and the jax version
    (jax.export's compatibility window is ~6 months of jaxlib releases;
    a version-stamped name makes a stale artifact a clean cache miss
    instead of a runtime error)."""
    plat = jax.default_backend()
    prec = "f64" if jax.config.jax_enable_x64 else "f32"
    return f"{tag}_B{batch_size}_{plat}_{prec}_jax{jax.__version__}.stablehlo"


def export_drain_round(
    system,
    batch_size: int,
    drain_size: int,
    optimizer_options: Optional[IPOptions] = None,
) -> bytes:
    """Trace + lower one straggler-drain round (the second program
    ``ipm.solve_batch_drained`` compiles) and serialize it.

    Calling convention: ``(z_full (B, L), idx (B_drain,), *bc_batches) ->
    (z_full', packed (3, B_drain))`` with each ``bc`` batch ``(B,
    n_fixed)`` — gather the straggler rows, re-solve them as a compact
    batch, scatter the solutions back, all in one dispatch; ``packed``
    stacks (status, obj, iterations) so the host needs ONE fetch.
    """
    from pockit_tpu.optimizer.ipm import _solver_for
    from pockit_tpu.solver import broadcast_bounds

    _register_result_type()
    compiled, solve_fn, bounds0 = _solver_for(system, optimizer_options)
    B, Bd = int(batch_size), int(drain_size)
    dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
    bounds_d = broadcast_bounds(bounds0, Bd)

    def f(z_full, idx, *bc_batches):
        zi = z_full[idx]
        bci = tuple(v[idx] for v in bc_batches)
        r = jax.vmap(solve_fn)(zi, bounds_d, {"bc": bci})
        pk = jnp.stack(
            [
                r.status.astype(r.obj.dtype),
                r.obj,
                r.iterations.astype(r.obj.dtype),
            ]
        )
        return z_full.at[idx].set(r.z), pk

    z_shape = jax.ShapeDtypeStruct((B, compiled.L), dtype)
    idx_shape = jax.ShapeDtypeStruct((Bd,), np.int32)
    bc_shapes = tuple(
        jax.ShapeDtypeStruct((B,) + np.asarray(v).shape, dtype)
        for v in compiled.default_runtime()["bc"]
    )
    exported = jax_export.export(jax.jit(f))(z_shape, idx_shape, *bc_shapes)
    return exported.serialize()


def install_batch_solver(system, optimizer_options, path_or_bytes) -> None:
    """Pre-populate ``ipm.solve_batch``'s jit cache with a deserialized
    artifact, so the first batched solve skips tracing entirely.

    The artifact must have been exported by :func:`export_batch_solver`
    for this platform, batch size, mesh layout, and option set — a shape
    or platform mismatch surfaces as an error on the first call (callers
    that want graceful fallback should try/except around install + first
    solve). Bounds were baked at export; the live ``bounds`` argument is
    ignored by the installed entry.
    """
    from pockit_tpu.optimizer.ipm import _solver_for

    call = load_batch_solver(path_or_bytes)
    compiled, _, _ = _solver_for(system, optimizer_options)

    def vmap_entry(z, bounds, rt):
        return call(z, *rt["bc"])

    compiled._ipm_cache[(optimizer_options, "vmap")] = vmap_entry


def install_drain_round(system, optimizer_options, path_or_bytes) -> None:
    """Pre-populate ``ipm.solve_batch_drained``'s drain-round jit cache
    with a deserialized :func:`export_drain_round` artifact (same
    caveats as :func:`install_batch_solver`)."""
    from pockit_tpu.optimizer.ipm import _solver_for

    call = load_batch_solver(path_or_bytes)
    compiled, _, _ = _solver_for(system, optimizer_options)

    def drain_entry(z_full, idx, bc_full_t, bounds):
        return call(z_full, jnp.asarray(idx, jnp.int32), *bc_full_t)

    compiled._ipm_cache[(optimizer_options, "drain_round")] = drain_entry
