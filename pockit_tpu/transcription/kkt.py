"""Block-arrow KKT assembly from pointwise AD — the production path.

The condensed interior-point matrix of a collocation NLP,

    K = W + diag(sigma_z) + delta_w I + J^T D J,

is block-arrow by construction (``solver/structured.py``): interval
interiors are mutually disjoint, and only borders / times / statics (the
"reduced" columns) couple globally. The dense pipeline nevertheless
materializes W as an (L, L) matrix and J as (m, L) every iteration — the
round-1 XLA cost analysis showed the batched solver HBM-bound on exactly
those temporaries (BENCH_NOTES.md).

This module assembles K **directly in its block-arrow factors' native
storage** — ``K_ii (nb, ni, ni)``, ``K_ir (nb, ni, nr)``, ``K_rr (nr,
nr)`` — and computes the per-interval derivative blocks from **pointwise
AD**: every nonlinear function of the transcription (dynamics, path
constraints, integrands) is evaluated per collocation point on a handful
of arguments ``(x_q, u_q, t_0, t_f, s)``, so

- the interval Lagrangian decomposes as ``linear(X) + sum_q phi_q`` with
  ``phi_q`` scalar on ``n_pt = n_x + n_u + 2 + n_s`` arguments; its
  Hessian is a static scatter of pointwise ``(n_pt, n_pt)`` Hessians —
  ``n_pt`` forward-over-reverse tangents of a tiny function instead of
  ``n_loc ~ n_v (n+1)`` tangents through the whole interval pipeline;
- the interval Jacobian is the static translation block plus an
  integration-operator einsum over pointwise ``(n_f, n_pt)`` Jacobians —
  MXU-shaped matmuls, no wide AD;
- FIXED / FUNC boundary substitutions become an explicit chain-rule
  column transform: FIXED columns are zeroed, FUNC columns redirect into
  the statics with ``d fn/ds`` plus the second-order ``g_j d2fn/ds2``
  term (index folding, done once per interval).

Row sharing (LGL path rows on shared borders appear in both adjacent
interval blocks) is handled by half-weighting the shared rows' D and
lambda in each copy — the two copies are identical rows, so the sum
restores the exact single-row contribution.

The Lagrangian head ``Phi = fct_o F_o(I, s) + y_sys . c_sys(I, s)``
(objective plus system-constraint rows, both functions of the integrals
and statics only) is split exactly: the in-pattern shares — ``dPhi/dI_j``
at the CURRENT ``(I(z), s, y_sys)`` weighting each integrand's pointwise
Hessian, and ``d2Phi/ds2`` on the statics block — are assembled; what
remains, ``B^T (d2Phi/dI2) B`` with ``B = dI/dz``, the I-s cross blocks,
and ``J_sys^T D J_sys``, is exactly low-rank and the solver removes it
with pattern-preconditioned CG against a matrix-free ``K @ v`` (HVP + J
products), so solves remain exact. ``layout.krylov_rank`` bounds that
rank (current-point weighting is what makes the remainder low-rank for
objectives/system rows nonlinear in the integrals).

Reference analog: the easyderiv sparse index machinery
(``/root/reference/pockit/base/easyderiv.py:111-459``) composing only
nonzero derivative entries, and MUMPS' sparse factorization inside IPOPT
(``/root/reference/pockit/optimizer/ipopt.py:41-53``). Here the sparsity
is exploited *structurally* (pointwise AD + static operator sandwiches)
so every step is either a tiny-arity AD pass or a batched matmul.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import sympy as sp

from pockit_tpu.base.bc import BcType
from pockit_tpu.solver.structured import StructuredLayout, structured_layout


class BlockKKT(NamedTuple):
    """Static layout + assembly closures for the block-arrow KKT path.

    - ``layout``: the :class:`StructuredLayout` (interior / reduced
      partition and the CG discrepancy rank).
    - ``interior_pad``: (nb, ni_max) interior columns, identical to
      ``layout.interior``. Ragged problems (hp-refined meshes, mixed
      degrees) carry the phantom column ``L`` in the padded tail slots;
      the factor/apply cores follow the phantom convention and the
      assembled blocks carry unit pivots there.
    - ``assemble(z, y, D, rt, fct_o=1.0)``: returns ``(K_ii, K_ir,
      K_rr)`` of ``W + J^T diag(D) J`` restricted to the block-arrow
      pattern, computed from pointwise AD. ``sigma_z`` and ``delta_w``
      diagonals are the solver's to add.
    - ``assemble_ad``: same contract, computed by whole-interval
      ``jacfwd(grad)`` / ``jacrev`` — the slow oracle the pointwise path
      is tested against.
    """

    layout: StructuredLayout
    interior_pad: np.ndarray
    ni_max: int
    n_blocks: int
    assemble: Callable
    assemble_ad: Callable = None
    integrals: Callable = None


def _phase_interval_data(system, pi: int, row0: int, ivals=None):
    """Host-side static data for a uniform-degree GROUP of one phase's
    intervals (``ivals``; all intervals when ``None``).

    hp-refined meshes carry per-interval degrees; callers bucket the
    intervals by degree and build one group per bucket so every array
    here stays rectangular (no point padding — padded collocation points
    would evaluate user dynamics at arbitrary argument values, where
    e.g. ``1/m`` terms produce non-finite garbage even at zero weight).

    Returns a dict with per-interval local column indices, constraint-row
    indices + weights, interval operators, and BC substitution tables.
    """
    p = system.p[pi]
    d = p.d
    off = int(system.l_p[pi])
    if ivals is None:
        ivals = list(range(d.N))
    degs = {int(d.num_point[i]) for i in ivals}
    assert len(degs) == 1, f"mixed degrees in one group: {degs}"
    n = degs.pop()
    N = len(ivals)
    lob = d.family == "lobatto"
    n_x, n_u, n_s = p.n_x, p.n_u, system.n_s
    pts_x = n if lob else n + 1
    pts_u = n
    dyn_rows = (n - 1 if lob else n)  # per state per interval
    n_loc = n_x * pts_x + n_u * pts_u + 2 + n_s

    # ---- local columns: per state, per control, t_0, t_f, statics ----
    if lob:
        lx, rx = d.l_m, d.r_m
        lu, ru = d.l_m, d.r_m
    else:
        lx, rx = d.l_x, d.r_x
        lu, ru = d.l_u, d.r_u
    local_cols = np.empty((N, n_loc), dtype=np.int64)
    for bi, i in enumerate(ivals):
        c = []
        for v in range(n_x):
            base = off + int(d.l_v[v])
            c.extend(range(base + int(lx[i]), base + int(rx[i])))
        for v in range(n_u):
            base = off + int(d.l_v[n_x + v])
            c.extend(range(base + int(lu[i]), base + int(ru[i])))
        c.extend([off + p.L - 2, off + p.L - 1])
        c.extend(range(int(system.l_s), int(system.r_s)))
        local_cols[bi] = c

    # ---- constraint rows of each interval + sharing weights ----------
    # global constraint ordering: [system rows | per phase: dynamic rows
    # (state-major over L_d) then path rows (constraint-major over L_m)]
    from pockit_tpu.numerics.layout import lr_nc

    l_dr, _ = lr_nc(d.num_point - 1 if lob else d.num_point)
    L_d, L_m = int(d.L_d), int(d.L_m)
    rows_i = n_x * dyn_rows + p.n_c * pts_u
    row_idx = np.empty((N, rows_i), dtype=np.int64)
    row_w = np.ones((N, rows_i))
    for bi, i in enumerate(ivals):
        rr = []
        for v in range(n_x):
            r0 = row0 + v * L_d + int(l_dr[i])
            rr.extend(range(r0, r0 + dyn_rows))
        pb = row0 + n_x * L_d
        pts = int(d.r_m[i]) - int(d.l_m[i])
        assert pts == pts_u, (pts, pts_u)
        for c in range(p.n_c):
            r0 = pb + c * L_m + int(d.l_m[i])
            rr.extend(range(r0, r0 + pts))
            if lob:
                # shared-border path rows appear in both adjacent blocks:
                # half-weight each copy so their sum counts the row once
                # (position in the PHASE, not the group, decides sharing)
                k = n_x * dyn_rows + c * pts
                if i > 0:
                    row_w[bi, k] = 0.5
                if i < d.N - 1:
                    row_w[bi, k + pts - 1] = 0.5
        row_idx[bi] = rr

    # ---- per-interval operators --------------------------------------
    from pockit_tpu.base.discretization import (
        _integration_block,
        _translation_block,
    )

    width = np.diff(d.mesh)[ivals]
    T_blk = np.broadcast_to(
        _translation_block(d.family, n), (N, dyn_rows, pts_x)
    ).copy()
    I_unit = _integration_block(d.family, n)
    I_blk = I_unit[None, :, :] * (width[:, None, None] / 2)
    # reference-cell nodes/weights of the interval, scaled into its cell
    tau = np.empty((N, pts_u))
    w_blk = np.empty((N, pts_u))
    for bi, i in enumerate(ivals):
        tau[bi] = d.t_m[int(d.l_m[i]) : int(d.r_m[i])]
        # w_m accumulates shared-border weights (LGL): rebuild per-interval
        w_blk[bi] = np.asarray(d.w_itv[i]) * width[bi] / 2

    # ---- boundary-condition substitution tables ----------------------
    # runtime FIXED values arrive via rt["bc"][pi], ordered like
    # compiled.py's fixed_idx (states bc_0, states bc_f, t_0, t_f)
    slots = (
        [(int(d.l_v[v]) + 0, p.info_bc_0[v]) for v in range(n_x)]
        + [(int(d.r_v[v]) - 1, p.info_bc_f[v]) for v in range(n_x)]
        + [(p.L - 2, p.info_t_0), (p.L - 1, p.info_t_f)]
    )
    fixed_mask = np.zeros((N, n_loc), dtype=bool)
    fixed_slot = np.zeros((N, n_loc), dtype=np.int64)
    func_mask = np.zeros((N, n_loc), dtype=bool)
    func_slot = np.zeros((N, n_loc), dtype=np.int64)
    func_fns = []
    n_fixed = 0
    bc_owned = set()
    for idx, info in slots:
        g_idx = off + idx
        if info.t == BcType.FIXED:
            sel = local_cols == g_idx
            fixed_mask |= sel
            fixed_slot[sel] = n_fixed
            n_fixed += 1
            bc_owned.add(idx)
        elif info.t == BcType.FUNC:
            sel = local_cols == g_idx
            func_mask |= sel
            func_slot[sel] = len(func_fns)
            func_fns.append(info.v)
            bc_owned.add(idx)
    # pinned (lb == ub) variable slots: appended after the BC slots in the
    # SAME order as compiled.py's fixed_idx so the runtime bc vector lines
    # up; BC-owned slots skipped identically
    for idx, _val in p.pinned_variable_slots:
        if idx in bc_owned:
            continue
        sel = local_cols == off + idx
        fixed_mask |= sel
        fixed_slot[sel] = n_fixed
        n_fixed += 1

    return dict(
        phase=p,
        pi=pi,
        ivals=np.asarray(ivals, dtype=np.int64),
        lob=lob,
        n=n,
        N=N,
        n_x=n_x,
        n_u=n_u,
        n_s=n_s,
        pts_x=pts_x,
        pts_u=pts_u,
        dyn_rows=dyn_rows,
        n_loc=n_loc,
        local_cols=local_cols,
        row_idx=row_idx,
        row_w=row_w,
        T_blk=T_blk,
        I_blk=I_blk,
        tau=tau,
        w_blk=w_blk,
        fixed_mask=fixed_mask,
        fixed_slot=fixed_slot,
        func_mask=func_mask,
        func_slot=func_slot,
        func_fns=func_fns,
        n_fixed=n_fixed,
    )


def _make_subst(n_loc, n_s, func_fns, n_fixed):
    """Runtime substitution of FIXED (from the bc vector) and FUNC (from
    the statics) boundary entries into the local vector."""

    def subst(z_loc, fm, fsl, qm, qsl, bc):
        if n_fixed:
            # guard: with zero FIXED slots the runtime bc vector is empty
            # and the gather bc[fsl] would be out of range at trace time
            # (all-FUNC/FREE boundary phases, e.g. statics-linked interior
            # phases of multi-phase chains)
            z_loc = jnp.where(fm, bc[fsl], z_loc)
        if func_fns:
            s_loc = z_loc[n_loc - n_s :]
            vals = jnp.stack([fn(list(s_loc)) for fn in func_fns])
            z_loc = jnp.where(qm, vals[qsl], z_loc)
        return z_loc

    return subst


def _make_interval_fns(system, ph):
    """Whole-interval ``rows``, ``lag`` and ``ivals`` closures — the
    AD-oracle path plus the per-interval integral evaluation (vmapped
    later).

    FIXED values are substituted from the runtime ``bc`` vector and FUNC
    values are computed from the statics *inside* the local vector so the
    chain rule through both is visible to interval-local AD.

    ``lag`` takes ``alpha`` — the integral weights ``dPhi/dI_j`` of the
    full Lagrangian head ``Phi = fct_o F_o + y_sys . c_sys`` evaluated at
    the CURRENT ``(I(z), s)`` — as a CONSTANT: the second-order terms it
    deliberately omits (``B^T d2Phi/dI2 B`` and the I-s cross blocks) are
    exactly the low-rank CG discrepancy counted by
    ``structured_layout.krylov_rank``. Weighting with current-point alpha
    (rather than ``dF/dI`` at I=0) is what keeps the remainder low-rank
    for objectives/system rows nonlinear in the integrals.
    """
    p = ph["phase"]
    n_x, n_u, n_s = ph["n_x"], ph["n_u"], ph["n_s"]
    pts_x, pts_u, n_loc = ph["pts_x"], ph["pts_u"], ph["n_loc"]
    lob = ph["lob"]
    i_t0 = n_loc - n_s - 2
    i_tf = n_loc - n_s - 1

    subst = _make_subst(n_loc, n_s, ph["func_fns"], ph["n_fixed"])

    def split(z_sub):
        s = z_sub[n_loc - n_s :] if n_s else jnp.zeros((0,), z_sub.dtype)
        t0, tf = z_sub[i_t0], z_sub[i_tf]
        xs, us, offv = [], [], 0
        for _ in range(n_x):
            xs.append(z_sub[offv : offv + pts_x])
            offv += pts_x
        for _ in range(n_u):
            us.append(z_sub[offv : offv + pts_u])
            offv += pts_u
        return xs, us, t0, tf, s

    def args_of(xs, us, t0, tf, s, tau_i):
        t_mid = (tau_i - 0.5) * (tf - t0) + (tf + t0) / 2
        xm = xs if lob else [x[:-1] for x in xs]
        return xm + us + [t_mid] + [s[k] for k in range(n_s)]

    def rows(z_loc, Tb, Ib, tau_i, fm, fsl, qm, qsl, bc):
        z_sub = subst(z_loc, fm, fsl, qm, qsl, bc)
        xs, us, t0, tf, s = split(z_sub)
        args = args_of(xs, us, t0, tf, s, tau_i)
        dt = tf - t0
        out = []
        if n_x:
            f = jnp.stack([fd(args) for fd in p.F_d])
            X = jnp.stack(xs)
            out.append((X @ Tb.T - dt * (f @ Ib.T)).reshape(-1))
        if p.n_c:
            out.append(jnp.concatenate([fc(args) for fc in p.F_c]))
        return (
            jnp.concatenate(out) if out else jnp.zeros((0,), z_loc.dtype)
        )

    def ivals(z_loc, tau_i, w_i, fm, fsl, qm, qsl, bc):
        """This interval's contribution to the phase integrals (n_I,)."""
        if not p.n_I:
            return jnp.zeros((0,), z_loc.dtype)
        z_sub = subst(z_loc, fm, fsl, qm, qsl, bc)
        xs, us, t0, tf, s = split(z_sub)
        args = args_of(xs, us, t0, tf, s, tau_i)
        return jnp.stack([fI(args) @ w_i for fI in p.F_I]) * (tf - t0)

    def lag(z_loc, Tb, Ib, tau_i, w_i, fm, fsl, qm, qsl, bc, lam_i, alpha):
        out = rows(z_loc, Tb, Ib, tau_i, fm, fsl, qm, qsl, bc) @ lam_i
        if p.n_I:
            out = out + alpha @ ivals(z_loc, tau_i, w_i, fm, fsl, qm, qsl, bc)
        return out

    return rows, lag, ivals


def _make_pointwise_m(system, ph):
    """Per-interval M = W + J^T diag(D) J from pointwise AD.

    Returns ``interval_M(z_loc, Ib, tau_i, w_i, fm, fsl, qm, qsl, bc,
    lam_i, D_i, alpha) -> (n_loc, n_loc)`` built so that every AD pass
    runs on per-collocation-point functions of ``n_pt = n_x + n_u + 2 +
    n_s`` arguments; the interval structure enters through static
    operators (translation block, integration-block einsum, index
    scatters) only. ``alpha`` is the constant current-point integral
    weight vector (see :func:`_make_interval_fns`).
    """
    p = ph["phase"]
    n_x, n_u, n_s = ph["n_x"], ph["n_u"], ph["n_s"]
    pts_x, pts_u, n_loc = ph["pts_x"], ph["pts_u"], ph["n_loc"]
    dyn_rows = ph["dyn_rows"]
    n_c, n_I = p.n_c, p.n_I
    func_fns = ph["func_fns"]
    i_t0 = n_loc - n_s - 2
    i_tf = n_loc - n_s - 1
    s0c = n_loc - n_s
    n_pt = n_x + n_u + 2 + n_s
    n_f = n_x + n_c

    subst = _make_subst(n_loc, n_s, func_fns, ph["n_fixed"])

    # static point-arg -> local-column map
    cm = np.empty((pts_u, n_pt), dtype=np.int64)
    for q in range(pts_u):
        c = [v * pts_x + q for v in range(n_x)]
        c += [n_x * pts_x + w * pts_u + q for w in range(n_u)]
        c += [i_t0, i_tf]
        c += [s0c + k for k in range(n_s)]
        cm[q] = c
    # stays numpy (host constant — see the BlockKKT consts note)

    # the same map as a one-hot contraction tensor: batched scatter-add
    # is a serialized anti-pattern on TPU, while S-sandwich einsums are
    # MXU matmuls (and their AD transposes stay matmuls)
    S_cm = np.zeros((pts_u, n_pt, n_loc), dtype=np.float64)
    S_cm[
        np.arange(pts_u)[:, None], np.arange(n_pt)[None, :], cm
    ] = 1.0

    # static linear Jacobian rows: d(X @ Tb.T)/d z_sub
    Tb = np.asarray(ph["T_blk"][0])
    A_lin = np.zeros((n_x * dyn_rows, n_loc))
    for v in range(n_x):
        A_lin[v * dyn_rows : (v + 1) * dyn_rows, v * pts_x : (v + 1) * pts_x] = Tb

    if func_fns:
        fnvs = [
            (lambda fn: lambda sv: jnp.asarray(
                fn([sv[k] for k in range(n_s)])
            ).reshape(()))(fn)
            for fn in func_fns
        ]

    def _point_args(pv, tq):
        xs = [pv[v] for v in range(n_x)]
        us = [pv[n_x + w] for w in range(n_u)]
        t0q, tfq = pv[n_x + n_u], pv[n_x + n_u + 1]
        sq = [pv[n_x + n_u + 2 + k] for k in range(n_s)]
        t_mid = (tq - 0.5) * (tfq - t0q) + (tfq + t0q) / 2
        return xs + us + [t_mid] + sq, t0q, tfq

    def interval_M(z_loc, Ib, tau_i, w_i, fm, fsl, qm, qsl, bc, lam_i, D_i, alpha):
        dtype = z_loc.dtype
        z_sub = subst(z_loc, fm, fsl, qm, qsl, bc)
        t0, tf = z_sub[i_t0], z_sub[i_tf]
        s = z_sub[s0c:] if n_s else jnp.zeros((0,), dtype)

        lam_dyn = lam_i[: n_x * dyn_rows].reshape(n_x, dyn_rows)
        lam_path = lam_i[n_x * dyn_rows :].reshape(n_c, pts_u)
        kap = lam_dyn @ Ib  # (n_x, pts_u): per-point dynamic weights

        # packed per-point arguments (pts_u, n_pt)
        cols = []
        if n_x:
            cols.append(z_sub[: n_x * pts_x].reshape(n_x, pts_x)[:, :pts_u].T)
        if n_u:
            off_u = n_x * pts_x
            cols.append(z_sub[off_u : off_u + n_u * pts_u].reshape(n_u, pts_u).T)
        cols.append(jnp.broadcast_to(t0, (pts_u,))[:, None])
        cols.append(jnp.broadcast_to(tf, (pts_u,))[:, None])
        if n_s:
            cols.append(jnp.broadcast_to(s, (pts_u, n_s)))
        P = jnp.concatenate(cols, axis=1)

        def phi(pv, kq, lpq, wq, tq):
            args, t0q, tfq = _point_args(pv, tq)
            dt = tfq - t0q
            val = jnp.zeros((), dtype)
            if n_x:
                f = jnp.stack([fd(args) for fd in p.F_d])
                val = val - dt * (kq @ f)
            if n_c:
                fc = jnp.stack([fcf(args) for fcf in p.F_c])
                val = val + lpq @ fc
            if n_I:
                fI = jnp.stack([fi(args) for fi in p.F_I])
                # alpha is a CONSTANT here (current-point dPhi/dI): its
                # variation with (I, s) is the CG discrepancy by design
                val = val + dt * wq * (alpha @ fI)
            return val

        def psi(pv, tq):
            args, t0q, tfq = _point_args(pv, tq)
            dt = tfq - t0q
            outs = []
            if n_x:
                outs.append(dt * jnp.stack([fd(args) for fd in p.F_d]))
            if n_c:
                outs.append(jnp.stack([fcf(args) for fcf in p.F_c]))
            return (
                jnp.concatenate(outs) if outs else jnp.zeros((0,), dtype)
            )

        Hphi = jax.vmap(jax.jacfwd(jax.grad(phi)))(
            P, kap.T, lam_path.T, w_i, tau_i
        )  # (pts_u, n_pt, n_pt)
        Gpsi = jax.vmap(jax.jacfwd(psi))(P, tau_i)  # (pts_u, n_f, n_pt)

        # place pointwise Hessians / Jacobians onto local columns via the
        # one-hot sandwich (matmuls, no TPU scatter)
        Sd = jnp.asarray(S_cm, dtype)
        W_sub = jnp.einsum("qaj,qai->ij", jnp.einsum("qab,qbj->qaj", Hphi, Sd), Sd)
        G_loc = jnp.einsum("qfa,qaj->qfj", Gpsi, Sd)

        parts = []
        if n_x:
            J_dyn = jnp.asarray(A_lin, dtype) - jnp.einsum(
                "rq,qvc->vrc", Ib, G_loc[:, :n_x, :]
            ).reshape(n_x * dyn_rows, n_loc)
            parts.append(J_dyn)
        if n_c:
            parts.append(
                G_loc[:, n_x:, :].transpose(1, 0, 2).reshape(n_c * pts_u, n_loc)
            )
        J_sub = (
            jnp.concatenate(parts) if parts else jnp.zeros((0, n_loc), dtype)
        )

        # substitution chain rule: z_sub[j] is a bc constant (FIXED) or
        # fn(s) (FUNC) — zero those columns; FUNC redirects into statics
        keep = 1.0 - (fm | qm).astype(dtype)
        J_t = J_sub * keep[None, :]
        W_t = W_sub * keep[None, :] * keep[:, None]

        if func_fns:
            dfn = jnp.stack([jax.grad(fv)(s) for fv in fnvs])  # (n_fn, n_s)
            hfn = jnp.stack([jax.hessian(fv)(s) for fv in fnvs])
            Q = qm.astype(dtype)[:, None] * dfn[qsl]  # (n_loc, n_s)
            WQ = W_sub @ Q
            W_t = W_t.at[:, s0c:].add(keep[:, None] * WQ)
            W_t = W_t.at[s0c:, :].add((keep[:, None] * WQ).T)
            W_t = W_t.at[s0c:, s0c:].add(Q.T @ WQ)
            # second-order term: d2 z_sub[j] / ds2 weighted by the
            # Lagrangian gradient at the substituted column
            gphi = jax.vmap(jax.grad(phi))(P, kap.T, lam_path.T, w_i, tau_i)
            g_sub = jnp.einsum("qa,qaj->j", gphi, jnp.asarray(S_cm, dtype))
            if n_x:
                g_sub = g_sub + lam_dyn.reshape(-1) @ jnp.asarray(A_lin, dtype)
            coeff = qm.astype(dtype) * g_sub
            W_t = W_t.at[s0c:, s0c:].add(
                jnp.einsum("j,jab->ab", coeff, hfn[qsl])
            )
            J_t = J_t.at[:, s0c:].add(J_sub @ Q)

        return W_t + jnp.einsum("ri,r,rj->ij", J_t, D_i, J_t)

    return interval_M


def make_block_kkt(system) -> Optional[BlockKKT]:
    """Build the block-arrow KKT assembler for a configured system.

    Ragged interval degrees (hp-refined meshes, mixed-degree phases) are
    handled by BUCKETING: each phase's intervals are grouped by degree,
    every group keeps rectangular shapes, and group blocks embed into the
    globally padded ``(n_blocks, ni_max, ·)`` storage with unit diagonals
    on the phantom slots (the :func:`structured_layout` convention).
    Returns ``None`` only when the layout itself is degenerate (no
    interior columns at all).
    """
    layout = structured_layout(system)
    if layout is None:
        return None

    L = int(system.L)
    n_s = system.n_s
    n_sys_rows = len(system.F_c)
    reduced = layout.reduced
    nr = len(reduced)
    red_of = {int(c): k for k, c in enumerate(reduced)}
    ni_max = layout.interior.shape[1]

    # one group per (phase, degree) bucket, preserving interval order
    groups = []
    row0 = n_sys_rows
    b0 = 0
    for pi, p in enumerate(system.p):
        buckets: dict = {}
        for i in range(p.d.N):
            buckets.setdefault(int(p.d.num_point[i]), []).append(i)
        for deg in sorted(buckets):
            ph = _phase_interval_data(system, pi, row0, buckets[deg])
            ph["block_ids"] = b0 + ph["ivals"]
            groups.append(ph)
        row0 += p.n_x * int(p.d.L_d) + p.n_c * int(p.d.L_m)
        b0 += p.d.N
    n_blocks = b0

    # map each group's local columns onto (interior-of-own-block | reduced)
    for ph in groups:
        N, n_loc = ph["N"], ph["n_loc"]
        # real (non-phantom) interior width of this group's blocks
        blk0 = int(ph["block_ids"][0])
        ni = int(np.sum(layout.interior[blk0] < L))
        int_sel = np.empty((N, ni), dtype=np.int64)
        red_sel_list = []
        red_pos_list = []
        for bi, b in enumerate(ph["block_ids"]):
            assert np.sum(layout.interior[b] < L) == ni, (
                "interior width varies within a degree bucket"
            )
            loc_of = {int(c): j for j, c in enumerate(ph["local_cols"][bi])}
            int_sel[bi] = [loc_of[int(c)] for c in layout.interior[b][:ni]]
            rs, rp = [], []
            for j, c in enumerate(ph["local_cols"][bi]):
                if int(c) in red_of and j not in set(int_sel[bi]):
                    rs.append(j)
                    rp.append(red_of[int(c)])
            red_sel_list.append(rs)
            red_pos_list.append(rp)
        n_red_loc = len(red_sel_list[0])
        assert all(len(r) == n_red_loc for r in red_sel_list), (
            "inconsistent reduced-column counts across intervals"
        )
        assert ni + n_red_loc == n_loc, (ni, n_red_loc, n_loc)
        ph["ni"] = ni
        ph["int_sel"] = int_sel
        ph["red_sel"] = np.asarray(red_sel_list, dtype=np.int64)
        ph["red_pos"] = np.asarray(red_pos_list, dtype=np.int64)
    # the uniform case (one group per phase, in order) can concatenate
    # group results; ragged cases scatter by block id
    ids_concat = np.concatenate([ph["block_ids"] for ph in groups])
    in_order = bool(np.array_equal(ids_concat, np.arange(n_blocks)))

    # statics' positions inside the reduced block (for the pure-statics
    # objective Hessian d2F/ds2(0, s))
    if n_s:
        s_red_pos = np.array(
            [red_of[int(c)] for c in range(int(system.l_s), int(system.r_s))],
            dtype=np.int64,
        )
    else:
        s_red_pos = np.zeros((0,), dtype=np.int64)
    n_I_total = int(sum(p.n_I for p in system.p))
    F_o = system.F_o
    F_c_sys = list(system.F_c)
    # per-GROUP integral offsets into the global I vector (the offset of
    # the group's owning phase)
    l_i_of = [
        int(system.l_i[ph["pi"]]) if ph["phase"].n_I else 0 for ph in groups
    ]

    def _Phi(I_vec, s_vec, y_sys, fct_o, dtype):
        """Lagrangian head: fct_o * F_o(I, s) + y_sys . c_sys(I, s)."""
        args = [I_vec[j] for j in range(n_I_total)] + [
            s_vec[k] for k in range(n_s)
        ]
        val = fct_o * jnp.asarray(F_o(args)).reshape(())
        for r, fc in enumerate(F_c_sys):
            val = val + y_sys[r] * jnp.asarray(fc(args)).reshape(())
        return val

    def phi_weights(I_vec, s, y_sys, fct_o, dtype):
        """(alpha, H_ss) of the Lagrangian head at the CURRENT point.

        ``alpha = dPhi/dI`` weights the in-pattern integrand Hessians;
        ``H_ss = d2Phi/ds2`` is the reduced-block statics share. The
        remaining second-order terms (B^T H_II B and the I-s cross
        blocks, B = dI/dz) are the low-rank CG discrepancy counted by
        ``structured_layout.krylov_rank`` — weighting at the current
        point (not I=0) is what makes that remainder exactly low-rank
        for objectives/system rows nonlinear in the integrals.
        """
        alpha = (
            jax.grad(lambda Iv: _Phi(Iv, s, y_sys, fct_o, dtype))(I_vec)
            if n_I_total
            else jnp.zeros((0,), dtype)
        )
        H_ss = (
            jax.hessian(lambda sv: _Phi(I_vec, sv, y_sys, fct_o, dtype))(s)
            if n_s
            else jnp.zeros((0, 0), dtype)
        )
        return alpha, H_ss

    # per-group traced closures: pointwise (production) and whole-interval
    # AD (oracle)
    fns_pt = [_make_pointwise_m(system, ph) for ph in groups]
    fns_ad = [_make_interval_fns(system, ph) for ph in groups]

    # HOST (numpy) constants, deliberately not jnp.asarray: device-resident
    # closure constants are fetched back to the host during MLIR lowering
    # (one blocking transfer each — ~2 s/array over the axon tunnel, ~40 s
    # of the solver's cold start). numpy constants embed directly.
    consts = []
    for ph in groups:
        N, n_loc, ni_g = ph["N"], ph["n_loc"], ph["ni"]
        int_sel = np.asarray(ph["int_sel"])
        red_sel = np.asarray(ph["red_sel"])
        red_pos = np.asarray(ph["red_pos"])
        # one-hot forms of the local->block-arrow index maps: gathers and
        # scatter-adds over the (B, N, n_loc, n_loc) M blocks become
        # batched matmuls on the MXU instead of TPU scatter kernels
        E_int = np.zeros((N, ni_g, n_loc))
        E_int[np.arange(N)[:, None], np.arange(ni_g)[None, :], int_sel] = 1.0
        P_red = np.zeros((N, n_loc, nr))
        P_red[np.arange(N)[:, None], red_sel, red_pos] = 1.0
        consts.append(
            dict(
                local_cols=np.asarray(ph["local_cols"]),
                row_idx=np.asarray(ph["row_idx"]),
                row_w=np.asarray(ph["row_w"]),
                T=np.asarray(ph["T_blk"]),
                I=np.asarray(ph["I_blk"]),
                tau=np.asarray(ph["tau"]),
                w=np.asarray(ph["w_blk"]),
                fm=np.asarray(ph["fixed_mask"]),
                fsl=np.asarray(ph["fixed_slot"]),
                qm=np.asarray(ph["func_mask"]),
                qsl=np.asarray(ph["func_slot"]),
                int_sel=int_sel,
                red_sel=red_sel,
                red_pos=red_pos,
                E_int=E_int,
                P_red=P_red,
            )
        )
    if n_s:
        S_stat = np.zeros((n_s, nr))
        S_stat[np.arange(n_s), s_red_pos] = 1.0
    else:
        S_stat = np.zeros((0, nr))
    # ragged phases: group block rows land at their block ids via a static
    # permutation gather (ids_concat is a permutation of arange(n_blocks))
    blk_perm = np.argsort(ids_concat) if not in_order else None

    interior_pad = np.asarray(layout.interior, dtype=np.int64)

    def integrals(z, rt):
        """Current values of every phase integral, (n_I_total,) in global
        integral order — one pointwise forward pass per group. A ragged
        phase's buckets each contribute their intervals' share, summed
        into the phase's slots."""
        dtype = z.dtype
        if not n_I_total:
            return jnp.zeros((0,), dtype)
        I_vec = jnp.zeros((n_I_total,), dtype)
        for ph, fns3, cst, l_i in zip(groups, fns_ad, consts, l_i_of):
            p_nI = ph["phase"].n_I
            if not p_nI:
                continue
            ivals_fn = fns3[2]
            bc_p = jnp.asarray(rt["bc"][ph["pi"]], dtype)
            iv = jax.vmap(
                lambda zl, ta, wi, fm, fsl, qm, qsl: ivals_fn(
                    zl, ta, wi, fm, fsl, qm, qsl, bc_p
                )
            )(
                z[cst["local_cols"]],
                cst["tau"],
                cst["w"],
                cst["fm"],
                cst["fsl"],
                cst["qm"],
                cst["qsl"],
            )
            I_vec = I_vec.at[l_i : l_i + p_nI].add(jnp.sum(iv, axis=0))
        return I_vec

    def _m_pointwise(ph, ifn, cst, z_loc, bc, lam_b, D_b, alpha):
        def one(zl, Ib, ta, wi, fm, fsl, qm, qsl, li, di):
            return ifn(zl, Ib, ta, wi, fm, fsl, qm, qsl, bc, li, di, alpha)

        return jax.vmap(one)(
            z_loc,
            cst["I"],
            cst["tau"],
            cst["w"],
            cst["fm"],
            cst["fsl"],
            cst["qm"],
            cst["qsl"],
            lam_b,
            D_b,
        )

    def _m_ad(ph, fns, cst, z_loc, bc, lam_b, D_b, alpha):
        rows_fn, lag_fn, _ = fns

        def hess_one(zl, Tb, Ib, ta, wi, fm, fsl, qm, qsl, li):
            f = lambda v: lag_fn(
                v, Tb, Ib, ta, wi, fm, fsl, qm, qsl, bc, li, alpha
            )
            return jax.jacfwd(jax.grad(f))(zl)

        def jac_one(zl, Tb, Ib, ta, fm, fsl, qm, qsl):
            f = lambda v: rows_fn(v, Tb, Ib, ta, fm, fsl, qm, qsl, bc)
            return jax.jacrev(f)(zl)

        W_blk = jax.vmap(hess_one)(
            z_loc,
            cst["T"],
            cst["I"],
            cst["tau"],
            cst["w"],
            cst["fm"],
            cst["fsl"],
            cst["qm"],
            cst["qsl"],
            lam_b,
        )
        J_blk = jax.vmap(jac_one)(
            z_loc,
            cst["T"],
            cst["I"],
            cst["tau"],
            cst["fm"],
            cst["fsl"],
            cst["qm"],
            cst["qsl"],
        )
        return W_blk + jnp.einsum("bri,br,brj->bij", J_blk, D_b, J_blk)

    def _mk_assemble(m_builder, per_phase):
        def assemble(z, y, D, rt, fct_o=1.0):
            """(K_ii, K_ir, K_rr) of ``W + J^T diag(D) J`` on the pattern."""
            dtype = z.dtype
            fct_o = jnp.asarray(fct_o, dtype)
            y_sys = y[:n_sys_rows] if n_sys_rows else jnp.zeros((0,), dtype)
            s_glob = (
                z[int(system.l_s) : int(system.r_s)]
                if n_s
                else jnp.zeros((0,), dtype)
            )
            # current integral values (one pointwise forward pass/phase),
            # then the Lagrangian-head weights at the current point
            I_vec = integrals(z, rt)
            alpha_all, H_ss = phi_weights(I_vec, s_glob, y_sys, fct_o, dtype)

            K_ii_parts, K_ir_parts = [], []
            K_rr = jnp.zeros((nr, nr), dtype)
            for ph, fns, cst, l_i in zip(groups, per_phase, consts, l_i_of):
                N = ph["N"]
                z_loc = z[cst["local_cols"]]
                bc = jnp.asarray(rt["bc"][ph["pi"]], dtype)
                lam_b = y[cst["row_idx"]] * cst["row_w"]
                D_b = D[cst["row_idx"]] * cst["row_w"]
                alpha_ph = (
                    alpha_all[l_i : l_i + ph["phase"].n_I]
                    if ph["phase"].n_I
                    else jnp.zeros((0,), dtype)
                )

                M = m_builder(ph, fns, cst, z_loc, bc, lam_b, D_b, alpha_ph)

                # one-hot sandwiches (matmuls) instead of gather + scatter
                E_i = jnp.asarray(cst["E_int"], dtype)  # (N, ni_g, n_loc)
                P_r = jnp.asarray(cst["P_red"], dtype)  # (N, n_loc, nr)
                Mi = jnp.einsum("nai,nij->naj", E_i, M)
                K_ii_p = jnp.einsum("naj,nbj->nab", Mi, E_i)
                K_ir_g = jnp.einsum("naj,njr->nar", Mi, P_r)
                Mr = jnp.einsum("njr,njk->nrk", P_r, M)
                K_rr = K_rr + jnp.einsum("nrk,nks->rs", Mr, P_r)

                ni_g = cst["int_sel"].shape[1]
                if ni_g < ni_max:
                    # ragged group: embed into the padded width with unit
                    # pivots on the phantom diagonal slots (the factor
                    # cores treat them as decoupled 1x1 blocks)
                    pad = ni_max - ni_g
                    K_ii_p = jnp.pad(K_ii_p, ((0, 0), (0, pad), (0, pad)))
                    pad_eye = np.concatenate(
                        [np.zeros((ni_g,)), np.ones((pad,))]
                    )
                    K_ii_p = K_ii_p + jnp.asarray(np.diag(pad_eye), dtype)
                    K_ir_g = jnp.pad(K_ir_g, ((0, 0), (0, pad), (0, 0)))
                K_ii_parts.append(K_ii_p)
                K_ir_parts.append(K_ir_g)

            K_ii = jnp.concatenate(K_ii_parts, axis=0)
            K_ir = jnp.concatenate(K_ir_parts, axis=0)
            if not in_order:
                # ragged phases: reorder group rows to their block ids by a
                # static permutation gather (no scatter)
                K_ii = jnp.take(K_ii, blk_perm, axis=0)
                K_ir = jnp.take(K_ir, blk_perm, axis=0)
            if n_s:
                S_s = jnp.asarray(S_stat, dtype)  # (n_s, nr) one-hot
                K_rr = K_rr + S_s.T @ H_ss @ S_s
            return K_ii, K_ir, K_rr

        return assemble

    return BlockKKT(
        layout=layout,
        interior_pad=interior_pad,
        ni_max=ni_max,
        n_blocks=n_blocks,
        assemble=_mk_assemble(_m_pointwise, fns_pt),
        assemble_ad=_mk_assemble(_m_ad, fns_ad),
        integrals=integrals,
    )
