"""Compile a configured ``System`` into jitted NLP functions.

This replaces the reference's per-callback sparse index machinery
(``/root/reference/pockit/base/easyderiv.py``, ``systembase.py:602-835``)
with JAX tracing:

- Boundary conditions are *substituted into the vector* at the head of every
  evaluation (exactly the reference semantics, ``phasebase.py:800-813``);
  gradients through FIXED entries vanish automatically and FUNC entries
  chain into the static parameters via AD.
- Dynamic residuals are dense matmuls ``X @ T_vᵀ - dt · f(V) @ I_mᵀ`` on
  block-structured operators (MXU-friendly), never sparse mat-vecs.
- Derivatives come from ``jax.grad`` / ``jacrev`` / forward-over-reverse
  Hessians; XLA fusion replaces symbolic CSE.

Constraint ordering matches the reference NLP exactly
(``systembase.py:613-623``): system rows first, then per phase the dynamic
rows (state-major) followed by path rows (constraint-major, all collocation
points).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pockit_tpu.base.bc import BcType


class _CompiledPhase:
    """Static data + evaluation closure for one phase."""

    def __init__(self, phase):
        d = phase.d
        self.phase = phase
        self.L = d.L
        self.L_m = d.L_m
        self.n_x, self.n_u, self.n_s = phase.n_x, phase.n_u, phase.n_s
        self.n_I, self.n_c = phase.n_I, phase.n_c
        self.n_dyn_rows = phase.n_x * d.L_d
        self.n_path_rows = phase.n_c * d.L_m
        self._T_v = d.T_v
        self._I_m = d.I_m
        self._w_m = d.w_m
        self._t_m = d.t_m
        self._l_v = [int(v) for v in d.l_v]
        self._r_v = [int(v) for v in d.r_v]
        self._lobatto = d.family == "lobatto"

        # classify boundary-condition slots
        fixed_idx, fixed_vals, func_bcs = [], [], []
        slots = (
            [(int(self._l_v[i]), phase.info_bc_0[i]) for i in range(self.n_x)]
            + [(int(self._r_v[i] - 1), phase.info_bc_f[i]) for i in range(self.n_x)]
            + [(self.L - 2, phase.info_t_0), (self.L - 1, phase.info_t_f)]
        )
        for idx, info in slots:
            if info.t == BcType.FIXED:
                fixed_idx.append(idx)
                fixed_vals.append(float(info.v))
            elif info.t == BcType.FUNC:
                func_bcs.append((idx, info.v))
        # pinned (lb == ub) variables: parameter substitution through the
        # same runtime bc vector, appended AFTER the boundary-condition
        # slots so existing bc_overrides index conventions are stable.
        # Slots already owned by a FIXED/FUNC boundary condition are
        # skipped (the boundary condition wins at the overlap).
        bc_owned = set(fixed_idx) | {i for i, _ in func_bcs}
        fixed_by_idx = dict(zip(fixed_idx, fixed_vals))
        for idx, val in phase.pinned_variable_slots:
            if idx not in bc_owned:
                fixed_idx.append(idx)
                fixed_vals.append(val)
            elif idx in fixed_by_idx and fixed_by_idx[idx] != val:
                # the boundary condition wins at the overlap, but a FIXED
                # value that contradicts the pin makes the configuration
                # infeasible (the reference's equality rows would clash at
                # solve time) — report it at compile time instead
                raise ValueError(
                    f"phase variable slot {idx} is pinned to {val} by an "
                    "equal-bound phase constraint but its boundary "
                    f"condition fixes it to {fixed_by_idx[idx]}; the "
                    "problem is infeasible"
                )
        self.fixed_idx = np.array(fixed_idx, dtype=np.int32)
        self.fixed_vals = np.array(fixed_vals, dtype=np.float64)
        self.func_bcs = func_bcs

    def apply_bc(self, z_p, s, bc_vals):
        """Substitute FIXED (from runtime ``bc_vals``) and FUNC (computed
        from statics) boundary values into the phase vector."""
        if len(self.fixed_idx):
            z_p = z_p.at[jnp.asarray(self.fixed_idx)].set(
                jnp.asarray(bc_vals, dtype=z_p.dtype)
            )
        for idx, fn in self.func_bcs:
            z_p = z_p.at[idx].set(fn(list(s)))
        return z_p

    def evaluate(self, z_p, s, bc_vals):
        """Return ``(dyn_residual, path_values, integrals)`` of the phase."""
        p = self.phase
        z_p = self.apply_bc(z_p, s, bc_vals)
        t0, tf = z_p[-2], z_p[-1]
        dt = tf - t0
        t_m = jnp.asarray(self._t_m, dtype=z_p.dtype)
        t_mid = (t_m - 0.5) * dt + (tf + t0) / 2

        xs = [z_p[self._l_v[i] : self._r_v[i]] for i in range(self.n_x)]
        us = [
            z_p[self._l_v[self.n_x + i] : self._r_v[self.n_x + i]]
            for i in range(self.n_u)
        ]
        xm = xs if self._lobatto else [x[:-1] for x in xs]
        args = xm + us + [t_mid] + [s[i] for i in range(self.n_s)]

        if self.n_x:
            T_v = jnp.asarray(self._T_v, dtype=z_p.dtype)
            I_m = jnp.asarray(self._I_m, dtype=z_p.dtype)
            f = jnp.stack([fd(args) for fd in p.F_d])  # (n_x, L_m)
            X = jnp.stack(xs)  # (n_x, L_x_var)
            dyn = (X @ T_v.T - dt * (f @ I_m.T)).reshape(-1)
        else:
            dyn = jnp.zeros((0,), dtype=z_p.dtype)

        if self.n_c:
            path = jnp.concatenate([fc(args) for fc in p.F_c])
        else:
            path = jnp.zeros((0,), dtype=z_p.dtype)

        w_m = jnp.asarray(self._w_m, dtype=z_p.dtype)
        if self.n_I:
            integrals = jnp.stack([fI(args) @ w_m for fI in p.F_I]) * dt
        else:
            integrals = jnp.zeros((0,), dtype=z_p.dtype)
        return dyn, path, integrals


class CompiledSystem:
    """Jitted NLP view of a configured system.

    All functions take the flat system vector ``z`` (phases concatenated,
    statics at the tail — reference layout, ``systembase.py:258-282``) and an
    optional runtime pytree ``rt`` carrying per-instance FIXED boundary
    values, so batched parameter sweeps vmap over ``rt`` without recompiling.
    """

    def __init__(self, system):
        self.system = system
        self.phases = [_CompiledPhase(p) for p in system.p]
        self.L = system.L
        self.n_s = system.n_s
        self.l_p = [int(v) for v in system.l_p]
        self.r_p = [int(v) for v in system.r_p]
        self.l_s, self.r_s = system.l_s, system.r_s

        self._F_o = system.F_o
        self._F_c_sys = system.F_c
        self.n_sys_rows = len(self._F_c_sys)
        self.m = self.n_sys_rows + sum(
            cp.n_dyn_rows + cp.n_path_rows for cp in self.phases
        )

        # bounds (host numpy; the solver consumes these)
        self.z_lb = system.v_lb
        self.z_ub = system.v_ub
        self.c_lb = system.c_lb
        self.c_ub = system.c_ub

        self._jit_cache: dict = {}

    # -- runtime pytree -------------------------------------------------
    def default_runtime(self):
        """Default runtime data: the FIXED boundary values as configured."""
        return {"bc": tuple(jnp.asarray(cp.fixed_vals) for cp in self.phases)}

    # -- core evaluations ------------------------------------------------
    def _eval_all(self, z, rt):
        s = z[self.l_s : self.r_s]
        dyns, paths, integrals = [], [], []
        for i, cp in enumerate(self.phases):
            z_p = z[self.l_p[i] : self.r_p[i]]
            dyn, path, I = cp.evaluate(z_p, s, rt["bc"][i])
            dyns.append(dyn)
            paths.append(path)
            integrals.append(I)
        I_all = (
            jnp.concatenate(integrals) if integrals else jnp.zeros((0,), dtype=z.dtype)
        )
        sys_args = [I_all[j] for j in range(I_all.shape[0])] + [
            s[k] for k in range(self.n_s)
        ]
        return sys_args, dyns, paths

    def objective_fn(self, z, rt):
        """Traceable objective."""
        sys_args, _, _ = self._eval_all(z, rt)
        return jnp.asarray(self._F_o(sys_args)).reshape(())

    def constraints_fn(self, z, rt):
        """Traceable constraints, ordered [system, per phase: dynamic, path]."""
        sys_args, dyns, paths = self._eval_all(z, rt)
        if self.n_sys_rows:
            sys_rows = jnp.stack(
                [jnp.asarray(fc(sys_args)).reshape(()) for fc in self._F_c_sys]
            )
        else:
            sys_rows = jnp.zeros((0,), dtype=z.dtype)
        parts = [sys_rows]
        for dyn, path in zip(dyns, paths):
            parts.append(dyn)
            parts.append(path)
        return jnp.concatenate(parts) if parts else jnp.zeros((0,), dtype=z.dtype)

    def lagrangian_fn(self, z, lam_c, fct_o, rt):
        """``fct_o * f(z) + lam_c @ c(z)`` (bound terms excluded)."""
        return fct_o * self.objective_fn(z, rt) + self.constraints_fn(z, rt) @ lam_c

    # -- jitted host-facing wrappers -------------------------------------
    def _jitted(self, name):
        if name not in self._jit_cache:
            if name == "objective":
                fn = jax.jit(self.objective_fn)
            elif name == "gradient":
                fn = jax.jit(jax.grad(self.objective_fn))
            elif name == "constraints":
                fn = jax.jit(self.constraints_fn)
            elif name == "jacobian":
                fn = jax.jit(jax.jacrev(self.constraints_fn))
            elif name == "hessian":
                fn = jax.jit(
                    jax.jacfwd(jax.jacrev(self.lagrangian_fn, argnums=0), argnums=0)
                )
            else:
                raise KeyError(name)
            self._jit_cache[name] = fn
        return self._jit_cache[name]

    def objective(self, z, rt=None):
        return self._jitted("objective")(jnp.asarray(z), rt or self.default_runtime())

    def gradient(self, z, rt=None):
        return self._jitted("gradient")(jnp.asarray(z), rt or self.default_runtime())

    def constraints(self, z, rt=None):
        return self._jitted("constraints")(
            jnp.asarray(z), rt or self.default_runtime()
        )

    def jacobian(self, z, rt=None):
        """Dense (m, L) constraint Jacobian."""
        return self._jitted("jacobian")(jnp.asarray(z), rt or self.default_runtime())

    def hessian(self, z, lam_c, fct_o, rt=None):
        """Dense (L, L) Hessian of ``fct_o * f + lam_c @ c``."""
        return self._jitted("hessian")(
            jnp.asarray(z),
            jnp.asarray(lam_c),
            jnp.asarray(fct_o),
            rt or self.default_runtime(),
        )


def compile_system(system) -> CompiledSystem:
    """Lower a fully configured ``System`` into jitted NLP functions."""
    if not system.ok:
        raise ValueError(
            "system setup is incomplete: set phases and an objective first"
        )
    return CompiledSystem(system)
