"""Native interior-point solve of a configured system (the TPU replacement
for the reference's IPOPT adapter, ``/root/reference/pockit/optimizer/
ipopt.py:11-61``).

``solve`` mirrors the reference's calling convention:

    [var_phase, var_static], info = ipm.solve(system, [guess_phase, guess_s])

``info`` carries ``status`` / ``status_msg`` / ``obj_val`` keys compatible
with scripts written against the reference's cyipopt output.
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pockit_tpu.base.system import SystemBase
from pockit_tpu.base.variable import VariableBase
from pockit_tpu.optimizer._common import postprocess, preprocess
from pockit_tpu.solver import Bounds, IPOptions, broadcast_bounds, make_ip_solver

_STATUS_MSG = {
    0: b"Solve Succeeded (KKT error below tolerance).",
    1: b"Maximum number of iterations reached.",
    2: b"Iterates diverged.",
    3: b"Problem appears locally infeasible (restoration stalled).",
}


def default_options(dtype=None) -> IPOptions:
    """Tolerance-scaled default options: 1e-8 in float64, 2e-5 in float32."""
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if jnp.dtype(dtype) == jnp.float64:
        return IPOptions(tol=1e-8)
    return IPOptions(tol=2e-5)


def _solver_for(system: SystemBase, options: Optional[IPOptions]):
    compiled = system.compiled
    if options is None:
        options = default_options()
    cache = getattr(compiled, "_ipm_cache", None)
    if cache is None:
        cache = {}
        compiled._ipm_cache = cache
    if options not in cache:
        structured = None
        block = None
        if options.kkt_solver == "structured":
            from pockit_tpu.solver.structured import structured_layout

            structured = structured_layout(system)
            if structured is None:
                import warnings

                warnings.warn(
                    "structured KKT solver requested but the problem has "
                    "no interval-interior columns (degenerate tiny mesh); "
                    "falling back to the dense solver"
                )
        elif options.kkt_solver in ("auto", "block", "pallas"):
            from pockit_tpu.transcription.kkt import make_block_kkt

            block = make_block_kkt(system)
            if block is None and options.kkt_solver != "auto":
                import warnings

                warnings.warn(
                    f"{options.kkt_solver} KKT solver requested but the "
                    "problem has no interval-interior columns (degenerate "
                    "tiny mesh); falling back to the dense solver"
                )
        cache[options] = jax.jit(
            make_ip_solver(
                compiled.objective_fn,
                compiled.constraints_fn,
                compiled.L,
                compiled.m,
                options,
                structured=structured,
                block=block,
            )
        )
    bounds = Bounds(
        jnp.asarray(compiled.z_lb),
        jnp.asarray(compiled.z_ub),
        jnp.asarray(compiled.c_lb),
        jnp.asarray(compiled.c_ub),
    )
    return compiled, cache[options], bounds


def solve(
    system: SystemBase,
    guess,
    optimizer_options: Optional[IPOptions] = None,
):
    """Solve the system with the native interior-point method.

    Args:
        system: fully configured ``System``.
        guess: a single ``Variable`` (one phase, no statics) or a list of
            per-phase ``Variable`` s followed by the static-parameter array.
        optimizer_options: an :class:`IPOptions`; ``None`` uses
            dtype-appropriate defaults.

    Returns:
        ``(result, info)`` where ``result`` matches the shape of ``guess``
        and ``info`` is a dict with ``status``, ``status_msg``, ``obj_val``,
        ``iterations``, ``kkt_error``, ``mult_c`` (constraint multipliers).
    """
    x_0, guess_is_variable = preprocess(system, guess)
    compiled, solve_fn, bounds = _solver_for(system, optimizer_options)

    rt = compiled.default_runtime()
    result = solve_fn(jnp.asarray(x_0), bounds, rt)

    x = np.asarray(result.z, dtype=np.float64)
    if guess_is_variable:
        Variable = type(guess)
    else:
        Variable = type(guess[0])
    out = postprocess(Variable, system, x, guess_is_variable)

    info = {
        "status": int(result.status),
        "status_msg": _STATUS_MSG.get(int(result.status), b"Unknown."),
        "obj_val": float(result.obj),
        "iterations": int(result.iterations),
        "kkt_error": float(result.kkt_error),
        "mu": float(result.mu),
        "mult_c": np.asarray(result.y),
        "x": x,
        # per-iteration metrics [kkt, mu, alpha, delta_w, theta, phi]
        "trace": np.asarray(result.trace)[: int(result.iterations)],
    }
    return out, info


def solve_batch(
    system: SystemBase,
    guess_batch: np.ndarray,
    bc_overrides=None,
    optimizer_options: Optional[IPOptions] = None,
    bounds_override: Optional[Bounds] = None,
):
    """Solve a batch of instances of the same discretized system via vmap.

    All instances share the NLP *structure* (mesh, constraint pattern);
    per-instance data varies through the initial guesses, the FIXED
    boundary-condition values, and optionally the bounds.

    Args:
        system: fully configured ``System``.
        guess_batch: (B, L) array of flat initial vectors (build one with
            ``preprocess`` / ``Variable.data`` and tile).
        bc_overrides: optional tuple (one per phase) of (B, n_fixed) arrays
            of FIXED boundary values, replacing the configured ones.
        optimizer_options: solver options shared by the batch.
        bounds_override: optional ``Bounds`` with leading batch dimensions.

    Returns:
        A batched :class:`IPResult` (fields have a leading batch axis).
    """
    compiled, solve_fn, bounds0 = _solver_for(system, optimizer_options)
    B = guess_batch.shape[0]

    rt0 = compiled.default_runtime()
    if bc_overrides is None:
        rt = {"bc": tuple(jnp.broadcast_to(v, (B,) + v.shape) for v in rt0["bc"])}
    else:
        rt = {"bc": tuple(jnp.asarray(v) for v in bc_overrides)}

    if bounds_override is None:
        bounds = broadcast_bounds(bounds0, B)
    else:
        bounds = bounds_override

    cache = compiled._ipm_cache
    key = (optimizer_options, "vmap")
    if key not in cache:
        cache[key] = jax.jit(jax.vmap(solve_fn))
    return cache[key](jnp.asarray(guess_batch), bounds, rt)


def solve_batch_drained(
    system: SystemBase,
    guess_batch: np.ndarray,
    bc_overrides=None,
    optimizer_options: Optional[IPOptions] = None,
    first_pass_iters: int = 8,
    drain_frac: int = 8,
    max_drain_rounds: int = 4,
    first_pass_options: Optional[IPOptions] = None,
    return_first_pass_mask: bool = False,
):
    """Batched solve with straggler draining.

    One ``lax.while_loop`` holds the whole batch until its slowest lane
    converges, so a few hard instances dominate wall time. This runs a
    short-iteration first pass over the full batch, then compacts the
    unconverged lanes into a small (B/drain_frac) batch and finishes them
    there. Returns ``(status, obj, iterations, z)``; ``status``, ``obj``
    and ``iterations`` are host numpy arrays, ``z`` stays a DEVICE array
    (``np.asarray(z)`` to fetch) — the full primal batch is the one large
    buffer, and hauling it host-side costs more than the drain itself on
    a remote-accelerator link (gathers/scatters for the drain happen on
    device). ``first_pass_options`` overrides the first-pass solver
    options entirely; by default the drain options with
    ``max_iter=first_pass_iters``.
    """
    import dataclasses

    if optimizer_options is None:
        optimizer_options = default_options()
    opts_fast = first_pass_options or dataclasses.replace(
        optimizer_options, max_iter=first_pass_iters
    )
    B = guess_batch.shape[0]
    B_drain = max(B // drain_frac, 8)

    res = solve_batch(
        system, guess_batch, bc_overrides=bc_overrides, optimizer_options=opts_fast
    )
    # ONE packed host fetch for (status, obj, iterations): each separate
    # np.array() is its own device->host round trip, and on a remote-
    # accelerator tunnel the per-fetch latency (~0.1 s) dwarfs the bytes
    packed = np.asarray(
        jnp.stack(
            [
                res.status.astype(res.obj.dtype),
                res.obj,
                res.iterations.astype(res.obj.dtype),
            ]
        )
    )
    status = packed[0].astype(np.int32)
    obj = packed[1].copy()  # np.asarray of a device fetch is read-only
    iters = packed[2].astype(np.int64)
    z = res.z  # device-resident; only gathered rows ever cross the link
    first_pass_mask = status == 0

    compiled = system.compiled
    if bc_overrides is None:
        rt0 = compiled.default_runtime()
        bc_full = tuple(
            jnp.broadcast_to(jnp.asarray(v), (B,) + jnp.asarray(v).shape)
            for v in rt0["bc"]
        )
    else:
        bc_full = tuple(jnp.asarray(v) for v in bc_overrides)

    pending = np.where(status != 0)[0]
    if len(pending):
        # one fused jitted program per drain round: gather the straggler
        # rows, solve them as a compact batch, scatter the solutions back —
        # a single device dispatch. Issuing the gather / solve / scatter as
        # separate eager ops costs one link round-trip each, which on a
        # remote-accelerator tunnel (~0.5 s/dispatch) dwarfed the actual
        # drain solve (often 0 iterations — lanes that finished their last
        # improving step exactly at first-pass max_iter).
        compiled_d, solve_fn_d, bounds0 = _solver_for(system, optimizer_options)
        cache = compiled_d._ipm_cache
        key = (optimizer_options, "drain_round")
        if key not in cache:

            def _drain_round(z_full, idx, bc_full_t, bounds):
                zi = z_full[idx]
                bci = tuple(v[idx] for v in bc_full_t)
                bounds_b = broadcast_bounds(bounds, idx.shape[0])
                r = jax.vmap(solve_fn_d)(zi, bounds_b, {"bc": bci})
                # duplicate indices (np.resize tiling) scatter identical
                # rows, so the update is well-defined; (status, obj,
                # iterations) pack into one fetch (link latency >> bytes)
                pk = jnp.stack(
                    [
                        r.status.astype(r.obj.dtype),
                        r.obj,
                        r.iterations.astype(r.obj.dtype),
                    ]
                )
                return z_full.at[idx].set(r.z), pk

            cache[key] = jax.jit(_drain_round)
        drain_round = cache[key]
        rounds = 0
        while len(pending) and rounds < max_drain_rounds:
            take = pending[:B_drain]
            idx = jnp.asarray(np.resize(take, B_drain))
            z, pk2 = drain_round(z, idx, bc_full, bounds0)
            pk2 = np.asarray(pk2)
            uniq = len(take)
            status[take] = pk2[0, :uniq].astype(np.int32)
            obj[take] = pk2[1, :uniq]
            iters[take] = iters[take] + pk2[2, :uniq].astype(np.int64)
            pending = pending[uniq:]
            rounds += 1
    if return_first_pass_mask:
        return status, obj, iters, z, first_pass_mask
    return status, obj, iters, z
