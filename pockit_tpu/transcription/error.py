"""Batched, device-side error estimation for refine sweeps.

The single-instance check/refine path computes the collocation residual
``T_x_aug @ x - I_m_aug @ f(x, u, t, s) * dt`` host-side in numpy
(`base/phase.py:_error_estimation_data_continuous`, mirroring the
reference ``phasebase.py:1316-1347``). A batched refine sweep running that
per instance in a Python loop is host-bound at production batch sizes —
the residual is the same dense-operator einsum the solver already runs on
device.

:func:`make_error_stats` builds ONE jitted batched program per system
mesh signature (tolerances are runtime scalars) that returns only the
per-interval planning scalars the host needs:

- ``cont_ok`` (B, N) — every augmented point of the interval satisfies
  ``|T_x - I_f| <= atol + rtol |I_f|`` (NaNs fail, matching the host
  check);
- ``ratio``  (B, N) — ``max |T_x - I_f| / (1 + max |I_f|)`` over the
  interval (the p-refinement error ratio of ``plan_refine_continuous``);
- ``disc_sat`` (B, N) — every bang-bang function saturated (< dtol or
  > 1 - dtol) across the whole interval.

Tiny-interval exemptions (``tolerance_mesh``) depend only on the static
mesh and stay host-side.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _phase_error_stats(cp):
    """Per-lane error statistics closure for one compiled phase ``cp``
    (a ``transcription.compiled._CompiledPhase``). Tolerances are runtime
    scalars so one compiled program serves every (check, plan) tolerance
    pair — the sweep driver calls it once per distinct triple, paying
    trace/compile only once per mesh signature."""
    phase = cp.phase
    d = phase.d
    n_x, n_u, n_s = cp.n_x, cp.n_u, cp.n_s
    N = phase.N
    # numpy closure constants (device-resident constants are re-fetched at
    # MLIR lowering time over remote-accelerator links)
    V_x_aug = np.asarray(d.V_x_aug)
    V_u_aug = np.asarray(d.V_u_aug)
    T_x_aug_v = np.asarray(d.T_x_aug_v)
    I_m_aug = np.asarray(d.I_m_aug)
    t_m_aug = np.asarray(d.t_m_aug)
    t_m = np.asarray(d.t_m)
    l_aug = [int(v) for v in d.l_m_aug]
    r_aug = [int(v) for v in d.r_m_aug]
    l_m = [min(int(v), d.L_m) for v in d.l_m]
    r_m = [min(int(v), d.L_m) for v in d.r_m]
    l_v, r_v = cp._l_v, cp._r_v
    lobatto = cp._lobatto

    def stats(z_p, s, bc_vals, atol, rtol, dtol):
        dtype = z_p.dtype
        z_p = cp.apply_bc(z_p, s, bc_vals)
        t0, tf = z_p[-2], z_p[-1]
        dt = tf - t0

        xs = [z_p[l_v[i] : r_v[i]] for i in range(n_x)]
        us = [z_p[l_v[n_x + i] : r_v[n_x + i]] for i in range(n_u)]
        statics = [s[i] for i in range(n_s)]

        # --- continuous residual on the augmented mesh ---------------
        t_aug = (jnp.asarray(t_m_aug, dtype) - 0.5) * dt + (tf + t0) / 2
        args_aug = (
            [jnp.asarray(V_x_aug, dtype) @ x for x in xs]
            + [jnp.asarray(V_u_aug, dtype) @ u for u in us]
            + [t_aug]
            + statics
        )
        T_x = jnp.stack([jnp.asarray(T_x_aug_v, dtype) @ x for x in xs])
        I_f = (
            jnp.stack([jnp.asarray(I_m_aug, dtype) @ fd(args_aug) for fd in phase.F_d])
            * dt
        )
        abs_err = jnp.abs(T_x - I_f)
        ok_pt = abs_err <= atol + rtol * jnp.abs(I_f)  # NaN -> False
        cont_ok, ratio = [], []
        for i in range(N):
            a, b = l_aug[i], r_aug[i]
            cont_ok.append(jnp.all(ok_pt[:, a:b]))
            scale = 1.0 + jnp.max(jnp.abs(I_f[:, a:b]), axis=1, keepdims=True)
            ratio.append(jnp.max(abs_err[:, a:b] / scale))
        cont_ok = jnp.stack(cont_ok)
        ratio = jnp.stack(ratio)

        # --- bang-bang saturation on the middle mesh ------------------
        if phase.n_b:
            t_mid = (jnp.asarray(t_m, dtype) - 0.5) * dt + (tf + t0) / 2
            xm = xs if lobatto else [x[:-1] for x in xs]
            args_mid = xm + us + [t_mid] + statics
            f_bb = jnp.stack([fb(args_mid) for fb in phase.F_b])
            sat = []
            for i in range(N):
                a, b = l_m[i], r_m[i]
                lo = jnp.all(f_bb[:, a:b] < dtol, axis=1)
                hi = jnp.all(f_bb[:, a:b] > 1.0 - dtol, axis=1)
                sat.append(jnp.all(lo | hi))
            disc_sat = jnp.stack(sat)
        else:
            disc_sat = jnp.ones((N,), bool)

        return cont_ok, ratio, disc_sat

    return stats


def make_error_stats(system):
    """Build a jitted batched error-statistics function for ``system`` at
    its CURRENT discretization.

    Returns ``fn(z_batch, bc, tols) -> [(cont_ok, ratio, disc_sat), ...]``
    (one triple per phase, each (B, N_phase)); ``bc`` is a tuple of
    per-phase (B, n_fixed) FIXED boundary values as in ``ipm.solve_batch``
    and ``tols = (atol, rtol, dtol)`` are runtime scalars (no recompile
    per tolerance pair).
    """
    compiled = system.compiled
    per_phase = [_phase_error_stats(cp) for cp in compiled.phases]
    l_p = compiled.l_p
    r_p = compiled.r_p
    l_s, r_s = compiled.l_s, compiled.r_s

    def one(z, bc, tols):
        # TPU f32 matmuls default to bfloat16 passes (~1e-3 relative
        # noise), which would swamp the collocation residual; the error
        # operators must run at full precision like the solver does
        with jax.default_matmul_precision("highest"):
            s = z[l_s:r_s]
            atol, rtol, dtol = tols
            return [
                fn(z[l_p[i] : r_p[i]], s, bc[i], atol, rtol, dtol)
                for i, fn in enumerate(per_phase)
            ]

    return jax.jit(jax.vmap(one, in_axes=(0, 0, None)))
