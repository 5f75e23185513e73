"""Batched hp-refinement: mesh bucketing for instance sweeps.

JAX programs have static shapes, so a batched solve requires every
instance on the same mesh — but hp-refinement drives meshes apart
per-instance (SURVEY hard-part #5; reference outer loop:
``/root/reference/pockit/base/systembase.py:1146-1234``, strictly
single-instance). The batched equivalent implemented here:

    solve the batch -> per-instance error check + refinement *plan*
    (pure, no shared-state mutation) -> group instances by their planned
    (mesh, degrees) signature -> per bucket: apply the mesh once,
    warm-start every member by Lagrange re-interpolation (``adapt``),
    re-solve the bucket as one batch -> repeat until all pass.

Compilation cost is per *bucket signature*, not per instance; buckets are
padded to power-of-two sizes so repeated sweeps reuse executables.

Error estimation runs ON DEVICE for the whole bucket at once
(:mod:`pockit_tpu.transcription.error`): one jitted batched program per
(signature, tolerance-triple) returns only the per-interval planning
scalars, so host work per instance is mesh construction, not residual
evaluation. Warm-start re-interpolation matrices are cached per
(source-mesh, target-mesh) signature pair (:meth:`VariableBase.
adapt_matrices`) — they depend only on normalized node layouts.
Per-instance FIXED boundary values are honored by the jitted program's
bc argument (and, for the host-side bang-bang switch-root planner, by
temporarily overriding the phase's configured values).
"""

from __future__ import annotations

from contextlib import ExitStack, contextmanager
from typing import NamedTuple, Optional

import numpy as np

from pockit_tpu.base.bc import BcInfo, BcType


@contextmanager
def _fixed_bc_values(phase, values):
    """Temporarily replace the phase's FIXED boundary values with
    ``values`` (ordered like the compiled runtime bc vector: state
    initials, state terminals, t_0, t_f — FIXED slots only)."""
    saved = (
        phase.info_bc_0,
        phase.info_bc_f,
        phase.info_t_0,
        phase.info_t_f,
    )
    it = iter(np.asarray(values, dtype=np.float64))

    def sub(info):
        if info.t == BcType.FIXED:
            return BcInfo(BcType.FIXED, float(next(it)))
        return info

    phase.info_bc_0 = [sub(i) for i in phase.info_bc_0]
    phase.info_bc_f = [sub(i) for i in phase.info_bc_f]
    phase.info_t_0 = sub(phase.info_t_0)
    phase.info_t_f = sub(phase.info_t_f)
    try:
        yield
    finally:
        (
            phase.info_bc_0,
            phase.info_bc_f,
            phase.info_t_0,
            phase.info_t_f,
        ) = saved


def _phase_signature(phase):
    return (
        tuple(np.round(np.asarray(phase._mesh, dtype=np.float64), 12)),
        tuple(int(n) for n in phase._num_point),
    )


def _var_signature(var):
    """Mesh signature of the (snapshotted) layout a Variable was built on."""
    return (
        tuple(np.round(np.asarray(var._mesh, dtype=np.float64), 12)),
        tuple(int(n) for n in var._num_point),
    )


def _bucket_stats(cache, system, sig_k, tols, z, bc):
    """Batched device-side error statistics for one bucket solve.

    Builds (and caches per mesh signature — tolerances are runtime
    scalars) the jitted program from
    :func:`pockit_tpu.transcription.error.make_error_stats`, runs it on
    the whole bucket at once, and returns host numpy arrays: one
    ``(cont_ok, ratio, disc_sat)`` triple per phase, each ``(B, N)``.
    """
    fn = cache.get(sig_k)
    if fn is None:
        from pockit_tpu.transcription.error import make_error_stats

        fn = make_error_stats(system)
        cache[sig_k] = fn
    out = fn(z, bc, tuple(np.float64(t) for t in tols))
    return [tuple(np.asarray(a) for a in trip) for trip in out]


def _apply_signature(system, sig):
    changed = False
    for phase, (mesh, deg) in zip(system.p, sig):
        if _phase_signature(phase) != (mesh, deg):
            phase.set_discretization(np.asarray(mesh), list(deg))
            changed = True
    if changed:
        system.update()


class SweepResult(NamedTuple):
    """Result of a batched refine sweep.

    ``values`` is a per-instance list of ``[per-phase Variables...,
    statics]`` (or a bare Variable for single-phase static-free systems),
    each on its own final mesh. ``passed`` marks instances whose error
    check succeeded; ``rounds_used`` and ``n_bucket_solves`` report the
    sweep's shape (distinct compilations <= number of distinct bucket
    batch shapes x signatures).
    """

    values: list
    status: np.ndarray
    obj: np.ndarray
    passed: np.ndarray
    rounds_used: int
    n_bucket_solves: int


def _accepted_kw(fn, kw: dict) -> dict:
    """Subset of ``kw`` accepted by ``fn`` (check/plan signatures differ
    between the continuous and discontinuous variants)."""
    import inspect

    params = inspect.signature(fn).parameters
    return {k: v for k, v in kw.items() if k in params}


def _pad_pow2(k: int, minimum: int = 8) -> int:
    n = minimum
    while n < k:
        n *= 2
    return n


def solve_refine_batch(
    system,
    guess,
    bc_overrides=None,
    optimizer_options=None,
    max_refine_rounds: int = 3,
    check_kw: Optional[dict] = None,
    refine_kw: Optional[dict] = None,
):
    """Solve a batch of instances with per-instance hp-refinement.

    Args:
        system: configured multi- or single-phase system (any scheme).
        guess: one ``value`` (Variable, or [per-phase Variables, statics])
            used as the shared initial guess.
        bc_overrides: tuple (per phase) of (B, n_fixed) FIXED boundary
            values — the instance axis of the sweep. ``None`` solves B=1.
        optimizer_options: solver options for every bucket solve.
        max_refine_rounds: refinement rounds after the initial solve.
        check_kw / refine_kw: tolerances forwarded to the per-phase
            ``check`` / ``plan_refine_*`` calls.

    Returns:
        :class:`SweepResult`.
    """
    from pockit_tpu.base.variable import VariableBase
    from pockit_tpu.optimizer import ipm

    from pockit_tpu.base.phase import PhaseBase

    check_kw = dict(check_kw or {})
    refine_kw = dict(refine_kw or {})
    n_p, n_s = system.n_p, system.n_s

    # tolerance plumbing for the device-side error statistics (defaults
    # mirror check_continuous / plan_refine_* signatures in base/phase.py)
    atol_c = float(check_kw.get("absolute_tolerance_continuous", 1e-8))
    rtol_c = float(check_kw.get("relative_tolerance_continuous", 1e-8))
    dtol_c = float(check_kw.get("tolerance_discontinuous", 1e-3))
    mtol_c = float(check_kw.get("tolerance_mesh", 1e-4))
    atol_p = float(refine_kw.get("absolute_tolerance_continuous", 1e-8))
    rtol_p = float(refine_kw.get("relative_tolerance_continuous", 1e-8))
    mtol_p = float(refine_kw.get("mesh_length_min", 1e-3))
    np_min = int(refine_kw.get("num_point_min", 6))
    np_max = int(refine_kw.get("num_point_max", 12))
    ml_max = float(refine_kw.get("mesh_length_max", 1.0))
    tols_c = (atol_c, rtol_c, dtol_c)
    tols_p = (atol_p, rtol_p, dtol_c)
    stats_cache: dict = {}
    adapt_cache: dict = {}
    # phases whose check_discontinuous is the native implementation can be
    # checked on device; scheme-level overrides that raise (Lobatto) keep
    # the old try/except semantics (treated as passing)
    disc_native = [
        type(p).check_discontinuous is PhaseBase.check_discontinuous
        for p in system.p
    ]

    if isinstance(guess, VariableBase):
        guess_vars = [guess]
        statics0 = np.zeros(0)
        bare = True
    else:
        guess_vars = list(guess[:n_p])
        statics0 = (
            np.array(list(guess[-1]), dtype=np.float64) if n_s else np.zeros(0)
        )
        bare = False
    Variable = type(guess_vars[0])

    if bc_overrides is not None:
        B = int(np.asarray(bc_overrides[0]).shape[0])
        bc_rows = [np.asarray(b, dtype=np.float64) for b in bc_overrides]
    else:
        B = 1
        bc_rows = None

    # per-instance state
    inst_vars = [[v for v in guess_vars] for _ in range(B)]
    inst_statics = [statics0.copy() for _ in range(B)]
    sig = [tuple(_phase_signature(p) for p in system.p)] * B
    disc_flag = [[False] * n_p for _ in range(B)]
    status = np.full(B, -1, dtype=np.int64)
    obj = np.full(B, np.nan)
    passed = np.zeros(B, dtype=bool)
    n_bucket_solves = 0
    rounds_used = 0

    for rnd in range(max_refine_rounds + 1):
        active = np.flatnonzero(~passed)
        if not len(active):
            break
        rounds_used = rnd
        # bucket by signature
        buckets: dict = {}
        for i in active:
            buckets.setdefault(sig[i], []).append(int(i))

        for sig_k, idx in buckets.items():
            _apply_signature(system, sig_k)
            compiled = system.compiled
            Bk = _pad_pow2(len(idx))
            take = np.resize(np.asarray(idx), Bk)

            gb = np.empty((Bk, system.L))
            for j, i in enumerate(take):
                for pi, phase in enumerate(system.p):
                    v = inst_vars[i][pi]
                    mk = (pi, _var_signature(v), sig_k[pi])
                    mats = adapt_cache.get(mk)
                    if mats is None:
                        mats = v.adapt_matrices(phase)
                        adapt_cache[mk] = mats
                    v_new = v.adapt(phase, matrices=mats)
                    gb[j, system.l_p[pi] : system.r_p[pi]] = v_new.data
                if n_s:
                    gb[j, system.l_s : system.r_s] = inst_statics[i]

            if bc_rows is not None:
                bc_k = tuple(b[take] for b in bc_rows)
            else:
                bc_k = tuple(
                    np.broadcast_to(
                        np.asarray(cp.fixed_vals), (Bk, len(cp.fixed_vals))
                    )
                    for cp in compiled.phases
                )

            res = ipm.solve_batch(
                system, gb, bc_overrides=bc_k, optimizer_options=optimizer_options
            )
            n_bucket_solves += 1
            z = np.asarray(res.z, dtype=np.float64)
            st = np.asarray(res.status)
            ob = np.asarray(res.obj)

            # device-side error statistics for the whole bucket at once
            # (the residual T_x - I_f is the same dense-operator einsum the
            # solver runs; only per-interval scalars come back to the host)
            stats_c = stats_p = None
            if np.any(st[: len(idx)] == 0):
                stats_c = _bucket_stats(
                    stats_cache, system, sig_k, tols_c, res.z, bc_k
                )
                if tols_p == tols_c:
                    stats_p = stats_c
            tiny_c = [p._tiny_intervals(mtol_c) for p in system.p]
            tiny_p = [p._tiny_intervals(mtol_p) for p in system.p]

            # write back + check + plan while the phases carry sig_k
            for j, i in enumerate(take[: len(idx)]):
                status[i] = st[j]
                obj[i] = ob[j]
                if st[j] != 0:
                    # keep the previous (valid) warm start — a diverged
                    # lane's iterate may be unusable (e.g. negative spans)
                    continue
                s_i = z[j, system.l_s : system.r_s] if n_s else np.zeros(0)
                inst_statics[i] = s_i
                new_vars = []
                for pi, phase in enumerate(system.p):
                    data = z[j, system.l_p[pi] : system.r_p[pi]].copy()
                    # FIXED/FUNC slots of z are dead variables during the
                    # solve; write the true boundary values back (reference
                    # postprocess semantics, with per-instance values)
                    cp = compiled.phases[pi]
                    if len(cp.fixed_idx):
                        data[np.asarray(cp.fixed_idx, dtype=np.int64)] = bc_k[
                            pi
                        ][j]
                    for idx_f, fn in cp.func_bcs:
                        data[idx_f] = float(fn(list(s_i)))
                    new_vars.append(Variable(phase, data))
                inst_vars[i] = new_vars
                ok_all = True
                plan = []
                for pi, phase in enumerate(system.p):
                    cont_ok_j, _, disc_sat_j = (
                        a[j] for a in stats_c[pi]
                    )
                    if disc_native[pi]:
                        disc_ok = disc_flag[i][pi] or bool(
                            np.all(disc_sat_j | tiny_c[pi])
                        )
                    else:
                        disc_ok = True
                    disc_flag[i][pi] = bool(disc_ok)
                    cont_pass = bool(np.all(cont_ok_j | tiny_c[pi]))
                    if disc_ok and cont_pass:
                        plan.append(None)
                        continue
                    ok_all = False
                    if disc_ok:
                        # p/h plan from the device statistics
                        if stats_p is None:
                            stats_p = _bucket_stats(
                                stats_cache, system, sig_k, tols_p, res.z, bc_k
                            )
                        ec = stats_p[pi][0][j] | tiny_p[pi]
                        plan.append(
                            phase._plan_continuous_from_stats(
                                ec,
                                stats_p[pi][1][j],
                                rtol_p,
                                np_min,
                                np_max,
                                mtol_p,
                                ml_max,
                            )
                        )
                    else:
                        # switch-root placement needs the bang-bang values
                        # themselves — host path, per failing instance only
                        with ExitStack() as stack:
                            if bc_rows is not None:
                                stack.enter_context(
                                    _fixed_bc_values(phase, bc_k[pi][j])
                                )
                            planner = phase.plan_refine_discontinuous
                            plan.append(
                                planner(
                                    inst_vars[i][pi],
                                    s_i,
                                    **_accepted_kw(planner, refine_kw),
                                )
                            )
                if ok_all:
                    passed[i] = True
                elif rnd < max_refine_rounds:
                    new_sig = []
                    for pi, pl in enumerate(plan):
                        if pl is None:
                            new_sig.append(sig[i][pi])
                        else:
                            m, d = pl
                            new_sig.append(
                                (
                                    tuple(
                                        np.round(
                                            np.asarray(m, dtype=np.float64), 12
                                        )
                                    ),
                                    tuple(int(x) for x in d),
                                )
                            )
                    sig[i] = tuple(new_sig)

    # package per-instance values
    values = []
    for i in range(B):
        if bare:
            values.append(inst_vars[i][0])
        elif n_s:
            values.append(inst_vars[i] + [inst_statics[i]])
        else:
            values.append(list(inst_vars[i]))
    return SweepResult(
        values=values,
        status=status,
        obj=obj,
        passed=passed,
        rounds_used=rounds_used,
        n_bucket_solves=n_bucket_solves,
    )
