"""Primal-dual interior-point method with a filter line search, written for
TPU execution.

A from-scratch replacement for IPOPT (the reference calls out to the C++
solver, ``/root/reference/pockit/optimizer/ipopt.py:41-53``). Design:

- **One condensed SPD solve per iteration.** Slacks and bound duals are
  eliminated analytically; equality rows get mu-proportional dual
  regularization so the condensed matrix ``K = W + Σ_z + δ_w I + Jᵀ D J``
  is symmetric positive definite after inertia correction. ``K`` is
  Jacobi-equilibrated and factorized with a dense Cholesky — batched
  Cholesky + triangular solves map well onto the TPU MXU, no pivoting
  (which serializes on TPU) is ever needed, and the equilibration keeps the
  factorization honest in float32.
- **Globalization: Wächter-Biegler filter line search** (the IPOPT
  algorithm): a fixed-size (θ, φ) filter per barrier stage, an f/h-type
  switching rule, a second-order correction on the first rejected trial,
  and a feasibility (Gauss-Newton) fallback step when the backtracking
  fails — instead of an l1-penalty merit, which deadlocks on damped steps.
- **Fixed-shape, mask-driven.** Infinite bounds, equality rows, the filter
  and convergence are all arrays/masks; the whole solve is one
  ``lax.while_loop`` so it jits once and ``vmap``s over problem instances
  (finished lanes are frozen with ``where`` so batched solves are exact).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pockit_tpu.solver.options import IPOptions

import os as _os

# dev-only: POCKIT_IPM_DEBUG_TRACE=1 swaps the per-iteration trace row for
# Newton-direction internals (see body()); never set in production
_DEBUG_TRACE = _os.environ.get("POCKIT_IPM_DEBUG_TRACE", "").strip().lower() not in (
    "", "0", "false", "off", "no",
)

# dev-only: POCKIT_DUMP_KKT=/path.npz saves the first iteration's
# assembled block-KKT inputs (batched) from the pallas path via a debug
# callback, for offline kernel replay (tools/replay_kkt.py)
_DUMP_KKT = _os.environ.get("POCKIT_DUMP_KKT", "").strip()

_FILTER_SIZE = 24

# least-squares multiplier init: largest per-lane (m, L) Jacobian that may
# be materialized for the exact dense solve; above this the block path
# switches to matrix-free CG (see _solve_impl)
_LS_INIT_DENSE_MAX_BYTES = 1 << 20


class Bounds(NamedTuple):
    """NLP bounds: ``z_lb <= z <= z_ub``, ``c_lb <= c(z) <= c_ub``."""

    z_lb: jax.Array
    z_ub: jax.Array
    c_lb: jax.Array
    c_ub: jax.Array


def broadcast_bounds(bounds: Bounds, batch_size: int) -> Bounds:
    """Add a leading batch axis to every bounds field (the form the
    vmapped solver expects)."""
    return Bounds(
        *[
            jnp.broadcast_to(jnp.asarray(b), (batch_size,) + np.shape(b))
            for b in bounds
        ]
    )


class IPResult(NamedTuple):
    """Solver output. ``status``: 0 converged, 1 max-iter, 2 diverged,
    3 locally infeasible (restoration stalled with significant constraint
    violation).

    ``trace`` holds per-iteration solver metrics with columns
    [kkt_error, mu, alpha, delta_w, theta, phi] (rows past ``iterations``
    are zero) — the observability stream IPOPT prints to stdout, here as
    an array so batched solves keep per-instance histories.
    """

    z: jax.Array
    s: jax.Array  # constraint slacks
    y: jax.Array  # constraint multipliers
    obj: jax.Array
    status: jax.Array
    iterations: jax.Array
    kkt_error: jax.Array
    mu: jax.Array
    trace: jax.Array  # (max_iter, 6)


class _State(NamedTuple):
    z: jax.Array
    s: jax.Array
    y: jax.Array
    w_l: jax.Array
    w_u: jax.Array
    v_l: jax.Array
    v_u: jax.Array
    mu: jax.Array
    dreg: jax.Array  # persistent inertia-regularization level
    th_f: jax.Array  # filter theta entries (_FILTER_SIZE,)
    ph_f: jax.Array  # filter phi entries
    trace: jax.Array  # (max_iter, 6) per-iteration metrics
    rejects: jax.Array  # consecutive fully-rejected iterations
    resets: jax.Array  # multiplier resets performed
    it: jax.Array
    done: jax.Array
    status: jax.Array
    kkt: jax.Array


def _emit_live_metrics(it, row, finished_prev):
    """Host-side sink for ``IPOptions.live_metrics`` (SURVEY §5:
    per-iteration metric streams). Handles both scalar solves and batched
    solves (vmap delivers batched rows; aggregates are printed)."""
    row = np.asarray(row)
    it = np.asarray(it)
    if row.ndim == 1:
        kkt, mu, alpha, dw, theta, _ = row
        print(
            f"[ipm] it={int(it):3d} kkt={kkt:9.3e} mu={mu:8.2e} "
            f"alpha={alpha:6.4f} delta_w={dw:8.2e} theta={theta:9.3e}"
        )
    else:
        active = ~np.asarray(finished_prev)
        n_act = int(active.sum())
        if n_act == 0:
            return
        r = row[active]
        print(
            f"[ipm] it~{int(it.max()):3d} active={n_act:5d} "
            f"kkt(max/med)={r[:, 0].max():9.3e}/{np.median(r[:, 0]):9.3e} "
            f"mu(med)={np.median(r[:, 1]):8.2e} "
            f"alpha(med)={np.median(r[:, 2]):6.4f}"
        )


def summarize(trace, iterations=None) -> str:
    """Render an ``IPResult.trace`` array as an IPOPT-style iteration
    table. For batched results pass one lane: ``summarize(res.trace[i],
    res.iterations[i])``."""
    trace = np.asarray(trace)
    k = int(iterations) if iterations is not None else trace.shape[0]
    lines = ["  it   kkt_error        mu     alpha   delta_w     theta"]
    for i in range(min(k, trace.shape[0])):
        kkt, mu, alpha, dw, theta, _ = trace[i]
        lines.append(
            f"{i:4d}  {kkt:10.3e} {mu:9.2e}  {alpha:8.4f} {dw:9.2e} {theta:9.3e}"
        )
    return "\n".join(lines)


def _minv(mask, x):
    """Masked reciprocal: 1/x where mask else 0."""
    return jnp.where(mask, 1.0 / jnp.where(mask, x, 1.0), 0.0)


def _masked_log_sum(mask, x):
    return jnp.sum(jnp.where(mask, jnp.log(jnp.where(mask, x, 1.0)), 0.0))


def _max_step(mask, x, dx, tau):
    """Fraction-to-boundary: largest alpha in (0, 1] with
    x + alpha*dx >= (1 - tau) * x for masked entries (x > 0)."""
    neg = mask & (dx < 0)
    ratio = jnp.where(neg, -tau * x / jnp.where(neg, dx, -1.0), 1.0)
    return jnp.minimum(1.0, jnp.min(ratio, initial=1.0))


def make_ip_solver(
    f_fn: Callable,
    c_fn: Callable,
    n: int,
    m: int,
    options: IPOptions = IPOptions(),
    structured=None,
    block=None,
):
    """Build a jittable ``solve(z0, bounds, rt)`` for the NLP

        min f(z, rt)  s.t.  c_lb <= c(z, rt) <= c_ub,  z_lb <= z <= z_ub.

    ``rt`` is an arbitrary pytree threaded through to the callables (used
    for per-instance problem parameters in batched sweeps). Derivatives are
    taken by JAX AD here, so callers supply only values.

    Linear-solver modes (``options.kkt_solver``):

    - ``"block"`` (production; ``"auto"`` selects it on CPU when ``block``
      — a :class:`pockit_tpu.transcription.kkt.BlockKKT` — is given, and
      ``"pallas"`` on accelerators): the
      condensed matrix is assembled directly in block-arrow storage from
      interval-local AD and factored by interior elimination; J and W act
      matrix-free (``jax.linearize`` / ``vjp`` products). Nothing
      ``(L, L)``- or ``(m, L)``-shaped exists inside the iteration.
    - ``"pallas"``: the block path with the factorization/back-solve fused
      into Pallas TPU kernels (batch-in-lanes; ``solver/pallas_kkt.py``).
      Interpret-mode on non-TPU backends. Escalation semantics match the
      block path except that with a nonzero CG discrepancy rank the
      inertia loop validates the preconditioner solve (the CG-corrected
      direction is recomputed after the loop).
    - ``"structured"``: interval-Schur factorization gathered from a dense
      condensed matrix (oracle path; requires ``structured``, a
      :class:`~pockit_tpu.solver.structured.StructuredLayout`).
    - ``"dense"``: dense Cholesky of the condensed matrix.
    """
    opt = options
    mode = opt.kkt_solver
    if mode == "auto":
        if block is not None:
            # TPU: the fused Pallas factorization (fast Mosaic compile, one
            # HBM pass, immune to the XLA expander numerics that broke the
            # lax block path at B>=1024 on v5e) — IF the structure fits the
            # 16 MB scoped-VMEM limit (wide meshes / many linked phases
            # have reduced blocks too large for one lane tile; they take
            # the XLA unrolled block core instead). Anywhere else (CPU,
            # GPU): the block path — Pallas would run in interpret mode
            # there, orders of magnitude slower.
            if jax.default_backend() == "tpu":
                from pockit_tpu.solver.pallas_kkt import fits_vmem

                mode = (
                    "pallas"
                    if fits_vmem(block.interior_pad, block.layout.reduced)
                    else "block"
                )
            else:
                mode = "block"
        else:
            mode = "dense"
    use_pallas = mode == "pallas" and block is not None
    use_block = (mode == "block" or use_pallas) and block is not None
    use_structured = mode == "structured" and structured is not None
    if use_structured:
        from pockit_tpu.solver.structured import make_structured_factor

        _s_factor, _s_apply = make_structured_factor(structured)
    if use_block:
        from pockit_tpu.solver.structured import (
            make_block_arrow_core,
            make_pcg_apply,
        )

        _bk_factor, _bk_apply = make_block_arrow_core(
            block.interior_pad, block.layout.reduced, n, method=opt.block_core
        )
        _bk_krylov = int(block.layout.krylov_rank)
        _bk_pcg = (
            make_pcg_apply(_bk_apply, _bk_krylov + 2) if _bk_krylov else None
        )
        # numpy, not jnp: device-resident closure constants cost one host
        # fetch each at MLIR-lowering time (~2 s over the axon tunnel)
        _bk_interior = np.asarray(block.interior_pad)
        _bk_reduced = np.asarray(block.layout.reduced)
        _bk_assemble = block.assemble
    if use_pallas:
        from pockit_tpu.solver.pallas_kkt import (
            make_newton_dir as _make_pallas_newton,
        )

        _pallas_cache = {}

        def _pallas_for(pivot_rtol, delta_w_floor):
            """Per-dtype Pallas newton/apply closures (floors are dtype-
            scaled at trace time; interpret-mode off-TPU)."""
            interpret = jax.default_backend() != "tpu"
            key = (pivot_rtol, delta_w_floor, interpret)
            if key not in _pallas_cache:
                p_newton, p_apply, _ = _make_pallas_newton(
                    block.interior_pad,
                    block.layout.reduced,
                    n,
                    pivot_rtol=pivot_rtol,
                    max_reg_tries=opt.max_reg_tries,
                    delta_w_floor=delta_w_floor,
                    delta_w_max=opt.delta_w_max,
                    interpret=interpret,
                    attempts=opt.pallas_attempts,
                    residual_rtol=opt.newton_residual_rtol,
                )
                p_pcg = (
                    make_pcg_apply(p_apply, _bk_krylov + 2)
                    if _bk_krylov
                    else None
                )
                _pallas_cache[key] = (p_newton, p_apply, p_pcg)
            return _pallas_cache[key]

    grad_fn = jax.grad(f_fn)

    def hess_lag_fn(z, y, rt):
        lag = lambda v: f_fn(v, rt) + (c_fn(v, rt) @ y if m else 0.0)
        return jax.jacfwd(jax.grad(lag))(z)

    jac_fn = jax.jacrev(c_fn) if m else (lambda z, rt: jnp.zeros((0, n), z.dtype))

    # filter-method constants (Wächter & Biegler 2006 defaults)
    GAMMA_TH = 1e-5
    GAMMA_PH = 1e-8
    S_TH = 1.1
    S_PH = 2.3
    DELTA_SW = 1.0
    ETA_PH = 1e-8
    KAPPA_SOC = 0.99

    def solve(z0, bounds: Bounds, rt=None) -> IPResult:
        with jax.default_matmul_precision(opt.matmul_precision):
            return _solve_impl(z0, bounds, rt)

    def _solve_impl(z0, bounds: Bounds, rt=None) -> IPResult:
        dtype = z0.dtype
        one = jnp.asarray(1.0, dtype)
        inf = jnp.asarray(jnp.inf, dtype)
        # dtype-aware numerical safeguards: the float64 defaults are
        # meaningless at float32 precision (eps 6e-8), so floor them
        eps_dt = float(np.finfo(np.dtype(dtype)).eps)
        # plain Python floats (weak scalars), NOT np.float64: a numpy
        # scalar in traced arithmetic promotes float32 carries to float64
        # under x64, breaking while_loop carry typing when an f32 solve is
        # traced in an x64 process (e.g. lowering-only CI)
        pivot_rtol = float(max(opt.chol_pivot_rtol, 2.0 * np.sqrt(eps_dt)))
        delta_c_floor = float(max(opt.delta_c, 100.0 * eps_dt))
        delta_w_floor = float(max(opt.delta_w_init, 10.0 * eps_dt))

        zl, zu = bounds.z_lb.astype(dtype), bounds.z_ub.astype(dtype)
        cl, cu = bounds.c_lb.astype(dtype), bounds.c_ub.astype(dtype)

        eq = cl == cu
        has_zl, has_zu = jnp.isfinite(zl), jnp.isfinite(zu)
        has_cl, has_cu = jnp.isfinite(cl) & ~eq, jnp.isfinite(cu) & ~eq

        # relax inequality bounds slightly so the interior is non-empty.
        # dtype-aware floor: the relax must survive rounding against the
        # bound's own magnitude (zl - relax*|zl| != zl), or zl==zu
        # "fixed-by-bounds" variables (plain-symbol equality path
        # constraints) get an EMPTY relaxed interior in float32 — slack 0,
        # bound dual mu/0 = inf, NaN KKT error at iteration 0. 64*eps is
        # ~7.6e-6 in f32 and far below bound_relax's 1e-8 in f64.
        relax = jnp.maximum(
            jnp.asarray(opt.bound_relax, dtype), 64 * jnp.finfo(dtype).eps
        )
        zl_r = jnp.where(has_zl, zl - relax * jnp.maximum(one, jnp.abs(zl)), zl)
        zu_r = jnp.where(has_zu, zu + relax * jnp.maximum(one, jnp.abs(zu)), zu)
        cl_r = jnp.where(has_cl, cl - relax * jnp.maximum(one, jnp.abs(cl)), cl)
        cu_r = jnp.where(has_cu, cu + relax * jnp.maximum(one, jnp.abs(cu)), cu)

        def _push(val, lo, hi, has_lo, has_hi):
            """Push a point strictly inside its (possibly one-sided) box."""
            k1, k2 = opt.kappa_1, opt.kappa_2
            span = jnp.where(has_lo & has_hi, hi - lo, jnp.inf)
            p_lo = jnp.where(
                has_lo,
                jnp.minimum(k1 * jnp.maximum(one, jnp.abs(lo)), k2 * span),
                0.0,
            )
            p_hi = jnp.where(
                has_hi,
                jnp.minimum(k1 * jnp.maximum(one, jnp.abs(hi)), k2 * span),
                0.0,
            )
            lo_eff = jnp.where(has_lo, lo + p_lo, -jnp.inf)
            hi_eff = jnp.where(has_hi, hi - p_hi, jnp.inf)
            return jnp.clip(val, lo_eff, hi_eff)

        mu0 = jnp.asarray(opt.mu_init, dtype)
        z = _push(z0.astype(dtype), zl_r, zu_r, has_zl, has_zu)
        c0 = c_fn(z, rt) if m else jnp.zeros((0,), dtype)
        s = jnp.where(eq, cl, _push(c0, cl_r, cu_r, has_cl, has_cu))

        al0 = jnp.where(has_zl, z - zl_r, one)
        au0 = jnp.where(has_zu, zu_r - z, one)
        bl0 = jnp.where(has_cl, s - cl_r, one)
        bu0 = jnp.where(has_cu, cu_r - s, one)
        w_l = jnp.where(has_zl, mu0 / al0, 0.0)
        w_u = jnp.where(has_zu, mu0 / au0, 0.0)
        v_l = jnp.where(has_cl, mu0 / bl0, 0.0)
        v_u = jnp.where(has_cu, mu0 / bu0, 0.0)

        def _ls_multipliers(z_, w_l_, w_u_, g_=None):
            """Least-squares multiplier estimate (IPOPT-style): minimize
            ||grad f + J^T y - w_l + w_u|| at ``z_``. Used at the start
            point (warm starts from a solution converge immediately) and
            re-used as a post-loop dual refresh (a lane whose primal hit
            the solution on its last improving step is certified by fresh
            duals instead of buying a drain round). Falls back to zero
            when the estimate is enormous (far-from-feasible cold
            starts)."""
            g0_ = grad_fn(z_, rt) if g_ is None else g_
            r0_ = g0_ - w_l_ + w_u_
            # dense Jacobian below 1 MB/lane (and the basin of attraction
            # of init-sensitive problems — e.g. Goddard's singular arc —
            # matches the reference pipeline); matrix-free CG above it,
            # where a (B, m, L) temporary would dominate peak memory
            if (
                use_block
                and m * n * np.dtype(dtype).itemsize > _LS_INIT_DENSE_MAX_BYTES
            ):
                # matrix-free: CG on the normal equations J J^T y = -J r0.
                # A fixed-trip CG with J / J^T products costs ~2 c_fn-evals
                # per step, and init accuracy only gates how many IPM
                # iterations a warm start needs, not correctness.
                _, j0_mv = jax.linearize(lambda v: c_fn(v, rt), z_)
                # transpose the linearized map instead of a second vjp
                # trace of c_fn (halves the init's linearization work)
                _jt0 = jax.linear_transpose(j0_mv, z_)
                jt0_mv = lambda u: _jt0(u)[0]
                b0 = -j0_mv(r0_)

                def _g_mv(u):
                    return j0_mv(jt0_mv(u)) + 1e-8 * u

                def _cg_body(_, carry):
                    yv, r_, p_, rr_ = carry
                    Gp = _g_mv(p_)
                    denom = p_ @ Gp
                    alpha = jnp.where(jnp.abs(denom) > 1e-30, rr_ / denom, 0.0)
                    yv = yv + alpha * p_
                    r_n = r_ - alpha * Gp
                    rr_n = r_n @ r_n
                    beta = jnp.where(rr_ > 1e-30, rr_n / rr_, 0.0)
                    return yv, r_n, r_n + beta * p_, rr_n

                y0, _, _, _ = lax.fori_loop(
                    0,
                    min(m, 128),
                    _cg_body,
                    (jnp.zeros((m,), dtype), b0, b0, b0 @ b0),
                )
            else:
                # materialized normal matrix, solved by Jacobi-PCG with a
                # residual-based early exit instead of jnp.linalg.solve:
                # XLA's batched LU expander on TPU cost ~0.6 s/call at
                # B=16384 (the single largest fixed overhead of a batched
                # solve) where the PCG is a handful of ms; CG on the SPD
                # G reaches the f32 residual floor in <= m steps (measured
                # bitwise-grade agreement with the dense solve at the f32
                # level on the LQR gate, ~48 steps)
                J0_ = jac_fn(z_, rt)
                G = J0_ @ J0_.T + 1e-8 * jnp.eye(m, dtype=dtype)
                b0 = -(J0_ @ r0_)
                dinv = 1.0 / jnp.maximum(jnp.diagonal(G), 1e-30)
                bb = b0 @ b0
                tol_sq = (10.0 * eps_dt) ** 2 * bb

                def _pcg_cond(carry):
                    _, r_, _, _, rr_, k_ = carry
                    return (rr_ > tol_sq) & (k_ < min(m, 128))

                def _pcg_body(carry):
                    yv, r_, p_, rz_, _, k_ = carry
                    Gp = G @ p_
                    denom = p_ @ Gp
                    alpha = jnp.where(jnp.abs(denom) > 1e-30, rz_ / denom, 0.0)
                    yv = yv + alpha * p_
                    r_n = r_ - alpha * Gp
                    z_n = dinv * r_n
                    rz_n = r_n @ z_n
                    beta = jnp.where(jnp.abs(rz_) > 1e-30, rz_n / rz_, 0.0)
                    return yv, r_n, z_n + beta * p_, rz_n, r_n @ r_n, k_ + 1

                z0_p = dinv * b0
                y0, _, _, _, _, _ = lax.while_loop(
                    _pcg_cond,
                    _pcg_body,
                    (
                        jnp.zeros((m,), dtype),
                        b0,
                        z0_p,
                        b0 @ z0_p,
                        bb,
                        jnp.asarray(0, jnp.int32),
                    ),
                )
            # negated <= so a NaN/inf LS estimate also falls back to zero
            # (NaN > x is False, which would have kept the poisoned y0)
            return jnp.where(
                ~(
                    jnp.max(jnp.abs(y0))
                    <= 1e3 * jnp.maximum(one, jnp.max(jnp.abs(g0_)))
                ),
                jnp.zeros((m,), dtype),
                y0,
            )

        theta_init = jnp.sum(jnp.abs(c0 - s)) if m else jnp.asarray(0.0, dtype)
        if m:
            # LS multiplier init, gated by warmth and working precision:
            # - near-feasible (warm) starts always take the LS estimate —
            #   it certifies an already-solved point immediately;
            # - float64 cold starts take it too (the f64 gates — Goddard's
            #   singular arc, orbit — converge along the LS-init path, and
            #   this matches rounds 1-4);
            # - float32 cold starts use y0 = 0 (IPOPT's own default): the
            #   f32 globalization path from an aggressive dual init is
            #   fragile (measured: f32 Goddard diverges from the SAME
            #   LS values that converge in f64), and y0 = 0 costs cold f32
            #   LQR nothing (2 iterations either way).
            # Rounds 1-4 implemented this split by accident: the f32 LU of
            # the singular Goddard normal matrix exploded to ~1e21 and
            # tripped the magnitude guard, while f64 LU stayed bounded.
            # The PCG solve below returns bounded values in both dtypes,
            # so the gate must be explicit.
            ls_gate = theta_init <= jnp.sqrt(eps_dt) * (
                one + jnp.sum(jnp.abs(s))
            )
            if eps_dt < 1e-12:  # float64: trust the estimate cold too
                y0 = _ls_multipliers(z, w_l, w_u)
            else:
                y0 = jnp.where(ls_gate, _ls_multipliers(z, w_l, w_u), 0.0)
        else:
            y0 = jnp.zeros((m,), dtype)
        theta_min = 1e-4 * jnp.maximum(one, theta_init)
        theta_max = 1e4 * jnp.maximum(one, theta_init)

        def _fresh_filter():
            """Filter containing only the theta_max cap."""
            th = jnp.full((_FILTER_SIZE,), jnp.inf, dtype)
            ph = jnp.full((_FILTER_SIZE,), jnp.inf, dtype)
            th = th.at[0].set(theta_max)
            ph = ph.at[0].set(-jnp.inf)
            return th, ph

        th_f0, ph_f0 = _fresh_filter()

        state = _State(
            z=z,
            s=s,
            y=y0,
            w_l=w_l,
            w_u=w_u,
            v_l=v_l,
            v_u=v_u,
            mu=mu0,
            dreg=jnp.asarray(0.0, dtype),
            th_f=th_f0,
            ph_f=ph_f0,
            trace=jnp.zeros((max(opt.max_iter, 1), 6), dtype),
            rejects=jnp.asarray(0, jnp.int32),
            resets=jnp.asarray(0, jnp.int32),
            it=jnp.asarray(0, jnp.int32),
            done=jnp.asarray(False),
            status=jnp.asarray(1, jnp.int32),
            kkt=jnp.asarray(jnp.inf, dtype),
        )

        def _kkt_error(z, s, y, w_l, w_u, v_l, v_u, g, jty, c0, mu):
            """Scaled KKT error at barrier parameter ``mu`` (IPOPT eq. 5).
            ``jty`` is the precomputed ``J^T y`` (matrix-free in block
            mode)."""
            r_stat = g + jty - w_l + w_u
            # slack stationarity applies only to inequality rows (equality
            # rows have no slack variable)
            r_dual_s = (
                jnp.where(eq, 0.0, -y - v_l + v_u) if m else jnp.zeros((0,), dtype)
            )
            r_c = (c0 - s) if m else jnp.zeros((0,), dtype)
            al = jnp.where(has_zl, z - zl_r, one)
            au = jnp.where(has_zu, zu_r - z, one)
            bl = jnp.where(has_cl, s - cl_r, one)
            bu = jnp.where(has_cu, cu_r - s, one)
            comp = jnp.concatenate(
                [
                    jnp.where(has_zl, al * w_l - mu, 0.0),
                    jnp.where(has_zu, au * w_u - mu, 0.0),
                    jnp.where(has_cl, bl * v_l - mu, 0.0),
                    jnp.where(has_cu, bu * v_u - mu, 0.0),
                ]
            )
            dual_norm = jnp.sum(jnp.abs(y)) + jnp.sum(w_l + w_u) + jnp.sum(v_l + v_u)
            denom = max(m + 2 * n + 2 * m, 1)
            s_d = jnp.maximum(opt.s_max, dual_norm / denom) / opt.s_max
            err_stat = jnp.max(
                jnp.concatenate([jnp.abs(r_stat), jnp.abs(r_dual_s)]), initial=0.0
            )
            err_feas = jnp.max(jnp.abs(r_c), initial=0.0)
            err_comp = jnp.max(jnp.abs(comp), initial=0.0)
            return jnp.maximum(jnp.maximum(err_stat / s_d, err_feas), err_comp / s_d)

        def _phi_theta(z, s, mu, rt):
            """Barrier objective phi and l1 infeasibility theta; phi is +inf
            outside the strict interior."""
            f = f_fn(z, rt)
            al = jnp.where(has_zl, z - zl_r, one)
            au = jnp.where(has_zu, zu_r - z, one)
            bl = jnp.where(has_cl, s - cl_r, one)
            bu = jnp.where(has_cu, cu_r - s, one)
            interior = (
                jnp.all(al > 0) & jnp.all(au > 0) & jnp.all(bl > 0) & jnp.all(bu > 0)
            )
            barrier = (
                _masked_log_sum(has_zl, al)
                + _masked_log_sum(has_zu, au)
                + _masked_log_sum(has_cl, bl)
                + _masked_log_sum(has_cu, bu)
            )
            theta = jnp.sum(jnp.abs(c_fn(z, rt) - s)) if m else jnp.asarray(0.0, dtype)
            phi = jnp.where(interior & jnp.isfinite(f), f - mu * barrier, inf)
            return phi, theta

        def body(st: _State) -> _State:
            z, s, y = st.z, st.s, st.y
            w_l, w_u, v_l, v_u = st.w_l, st.w_u, st.v_l, st.v_u
            mu = st.mu

            g = grad_fn(z, rt)
            if use_block:
                # matrix-free derivative operators: one linearization of c
                # gives J products, one vjp gives J^T products, and one
                # forward-over-reverse linearization of the Lagrangian
                # gradient gives W products — J and W are never built
                if m:
                    c0, j_mv = jax.linearize(lambda v: c_fn(v, rt), z)
                    _, _cvjp = jax.vjp(lambda v: c_fn(v, rt), z)
                    jt_mv = lambda u: _cvjp(u)[0]
                else:
                    c0 = jnp.zeros((0,), dtype)
                    j_mv = lambda v: jnp.zeros((0,), dtype)
                    jt_mv = lambda u: jnp.zeros((n,), dtype)
                lag_g, w_sig_mv = jax.linearize(
                    jax.grad(
                        lambda zz: f_fn(zz, rt)
                        + (c_fn(zz, rt) @ y if m else 0.0)
                    ),
                    z,
                )
                w_mv = w_sig_mv  # W @ v (Lagrangian Hessian product)
                jty = lag_g - g
            else:
                J = jac_fn(z, rt)
                c0 = c_fn(z, rt) if m else jnp.zeros((0,), dtype)
                jty = J.T @ y if m else jnp.zeros((n,), dtype)

            # -- convergence bookkeeping --------------------------------
            E0 = _kkt_error(z, s, y, w_l, w_u, v_l, v_u, g, jty, c0, 0.0)
            newly_done = E0 <= opt.tol
            blown = ~jnp.isfinite(E0) | (jnp.max(jnp.abs(z)) > opt.diverge_threshold)
            # lanes whose step will be discarded this iteration (frozen /
            # newly converged / diverged): they must never drive the
            # inertia-escalation or line-search loops — under vmap ANY lane
            # extends a loop round for the WHOLE batch, and stale frozen
            # lanes sit at endgame points whose factorizations fail the
            # pivot test forever
            active = ~(st.done | newly_done | blown)

            # -- barrier update --------------------------------------------
            if opt.mu_strategy == "adaptive":
                # LOQO centrality rule: retarget mu from the complementarity
                # distribution every iteration (no ladder, no filter resets)
                al_c = jnp.where(has_zl, z - zl_r, one)
                au_c = jnp.where(has_zu, zu_r - z, one)
                bl_c = jnp.where(has_cl, s - cl_r, one)
                bu_c = jnp.where(has_cu, cu_r - s, one)
                comp_v = jnp.concatenate(
                    [
                        jnp.where(has_zl, al_c * w_l, jnp.nan),
                        jnp.where(has_zu, au_c * w_u, jnp.nan),
                        jnp.where(has_cl, bl_c * v_l, jnp.nan),
                        jnp.where(has_cu, bu_c * v_u, jnp.nan),
                    ]
                )
                n_comp = jnp.sum(~jnp.isnan(comp_v))
                avg = jnp.nansum(comp_v) / jnp.maximum(n_comp, 1)
                cmin = jnp.nanmin(jnp.where(jnp.isnan(comp_v), jnp.inf, comp_v))
                xi = jnp.where(avg > 0, cmin / jnp.maximum(avg, 1e-30), 1.0)
                sigma = 0.1 * jnp.minimum(0.05 * (1.0 - xi) / jnp.maximum(xi, 1e-6), 2.0) ** 3
                mu_ad = jnp.clip(sigma * avg, opt.tol / 10.0, opt.mu_init)
                mu = jnp.where(n_comp > 0, mu_ad, mu)
                th_f, ph_f = st.th_f, st.ph_f
            elif opt.mu_strategy == "mehrotra":
                # Mehrotra-style probing (IPOPT's mu_oracle=probing): mu is
                # retargeted AFTER the affine-scaling probe below, which
                # needs this iteration's factorization; assemble the KKT
                # matrix at the state's mu. No filter reset (as adaptive).
                th_f, ph_f = st.th_f, st.ph_f
            else:
                # monotone Fiacco-McCormick ladder; filter resets with mu
                E_mu = _kkt_error(z, s, y, w_l, w_u, v_l, v_u, g, jty, c0, mu)
                shrink = E_mu <= opt.kappa_eps * mu
                mu = jnp.where(
                    shrink,
                    jnp.maximum(
                        opt.tol / 10.0,
                        jnp.minimum(opt.kappa_mu * mu, mu**opt.theta_mu),
                    ),
                    mu,
                )
                th_f = jnp.where(shrink, th_f0, st.th_f)
                ph_f = jnp.where(shrink, ph_f0, st.ph_f)

            # -- assemble condensed system ------------------------------
            al = jnp.where(has_zl, z - zl_r, one)
            au = jnp.where(has_zu, zu_r - z, one)
            bl = jnp.where(has_cl, s - cl_r, one)
            bu = jnp.where(has_cu, cu_r - s, one)
            inv_al, inv_au = _minv(has_zl, al), _minv(has_zu, au)
            inv_bl, inv_bu = _minv(has_cl, bl), _minv(has_cu, bu)

            sigma_z = w_l * inv_al + w_u * inv_au
            sigma_s = v_l * inv_bl + v_u * inv_bu
            r_c = c0 - s
            # dual regularization for equality rows: mu-proportional
            # (IP-PMM style) with an absolute floor, so early iterations are
            # a gentle augmented-Lagrangian penalty and the endgame is exact
            delta_c = jnp.maximum(delta_c_floor, opt.delta_c_scale * mu)
            D = jnp.where(eq, 1.0 / delta_c, sigma_s)

            g_z = g + jty - mu * inv_al + mu * inv_au
            g_s = jnp.where(eq, 0.0, -y - mu * inv_bl + mu * inv_bu)
            mehrotra = opt.mu_strategy == "mehrotra"

            def _rhs_of(g_z_, g_s_):
                if use_block:
                    return -g_z_ - (jt_mv(D * r_c + g_s_) if m else 0.0)
                return -g_z_ - (J.T @ (D * r_c + g_s_) if m else 0.0)

            if mehrotra:
                # the factorization's trial solve probes the affine (mu=0)
                # system; the centered rhs is re-solved after the probe
                g_s_aff = jnp.where(eq, 0.0, -y)
                rhs_use = (g + jty, g_s_aff)
            else:
                rhs_use = (g_z, g_s)

            if use_block:
                # block-arrow assembly from interval-local AD — no W, no J,
                # no (L, L) condensed matrix anywhere
                K_ii0, K_ir0, K_rr0 = _bk_assemble(z, y, D, rt)
                ni_b = K_ii0.shape[-1]
                nr_b = K_rr0.shape[-1]
                eye_ni = jnp.eye(ni_b, dtype=dtype)
                eye_nr = jnp.eye(nr_b, dtype=dtype)
                sig_ext = jnp.concatenate([sigma_z, jnp.zeros((1,), dtype)])
                K_ii0 = K_ii0 + eye_ni * sig_ext[_bk_interior][:, :, None]
                K_rr0 = K_rr0 + jnp.diag(sigma_z[_bk_reduced])
                rhs = _rhs_of(*rhs_use)
            else:
                W = hess_lag_fn(z, y, rt)
                K0 = W + jnp.diag(sigma_z)
                if m:
                    K0 = K0 + (J.T * D) @ J
                rhs = _rhs_of(*rhs_use)

            # -- inertia correction: escalate delta_w until the
            # factorization is solid AND the step is sane -----------------
            eye = jnp.eye(n, dtype=dtype)
            step_cap = 1e3 * (one + jnp.linalg.norm(z))

            # f32 inertia-detectability floor (options.delta_w_min):
            # clamp the escalation entry level while GLOBALIZING (theta
            # above the endgame threshold) so every factorization is
            # numerically decidable; released in the endgame, where steps
            # are small and the saddle refinement needs the small-delta
            # system to certify to tolerance. The ladder only ascends
            # from its entry level, so clamping dreg covers every rung.
            dreg_eff = st.dreg
            if opt.delta_w_min:
                theta_pre = (
                    jnp.sum(jnp.abs(r_c)) if m else jnp.asarray(0.0, dtype)
                )
                dreg_eff = jnp.where(
                    theta_pre > theta_min,
                    jnp.maximum(st.dreg, jnp.asarray(opt.delta_w_min, dtype)),
                    st.dreg,
                )

            if use_pallas:
                # fused Pallas factorization: the inertia-escalation loop
                # lives inside newton_dir's batched rule (factors must not
                # thread a vmapped while_loop carry — see pallas_kkt.py)
                _p_newton, _p_apply, _p_pcg = _pallas_for(
                    pivot_rtol, delta_w_floor
                )
                if _DUMP_KKT:

                    def _dump_cb(it, K_ii, K_ir, K_rr, rhs_, dreg, cap,
                                 z_, y_, D_, bc_):
                        import numpy as _np

                        if int(_np.ravel(it)[0]) == 0 and not _os.path.exists(
                            _DUMP_KKT
                        ):
                            _np.savez(
                                _DUMP_KKT, K_ii=K_ii, K_ir=K_ir, K_rr=K_rr,
                                rhs=rhs_, dreg=dreg, cap=cap,
                                z=z_, y=y_, D=D_, bc=bc_,
                            )

                    jax.debug.callback(
                        _dump_cb, st.it, K_ii0, K_ir0, K_rr0, rhs,
                        st.dreg, step_cap, z, y, D, rt["bc"][0],
                    )
                dz, _p_fac, delta_w, reg_ok = _p_newton(
                    K_ii0, K_ir0, K_rr0, rhs, dreg_eff, step_cap, active
                )

                def chol_solve(b):
                    if not _bk_krylov:
                        return _p_apply(_p_fac, b)

                    def matvec(v):
                        out = w_mv(v) + (sigma_z + delta_w) * v
                        if m:
                            out = out + jt_mv(D * j_mv(v))
                        return out

                    return _p_pcg(_p_fac, b, matvec)

                if _bk_krylov:
                    # the escalation loop validated the preconditioner
                    # solve; the production direction needs the CG
                    # correction for the low-rank discrepancy
                    dz_t = chol_solve(rhs)
                    ok_t = jnp.all(jnp.isfinite(dz_t)) & (
                        jnp.linalg.norm(dz_t) <= step_cap
                    )
                    dz = jnp.where(ok_t & reg_ok, dz_t, dz)
                    # a failed CG correction leaves a direction that
                    # ignores the low-rank coupling — don't let it pass as
                    # a clean Newton step (reg_ok drives the LM-style
                    # regularization memory via newton_ok)
                    reg_ok = reg_ok & ok_t
            elif use_block:

                def lin_apply(fac, b):
                    core, delta = fac[:-1], fac[-1]
                    if not _bk_krylov:
                        return _bk_apply(core, b)

                    # true-K matvec for the low-rank discrepancy CG:
                    # matrix-free W / J products, diagonal terms explicit
                    def matvec(v):
                        out = w_mv(v) + (sigma_z + delta) * v
                        if m:
                            out = out + jt_mv(D * j_mv(v))
                        return out

                    return _bk_pcg(core, b, matvec)

                def lin_factor_delta(delta):
                    K_ii = K_ii0 + eye_ni * delta
                    K_rr = K_rr0 + eye_nr * delta
                    core, p_min, p_max = _bk_factor(K_ii, K_ir0, K_rr)
                    ok = (
                        jnp.isfinite(p_min)
                        & jnp.isfinite(p_max)
                        & (p_min > pivot_rtol * p_max)
                    )
                    return core + (jnp.asarray(delta, dtype),), ok

                _fshape = jax.eval_shape(
                    lambda a, b, c: _bk_factor(a, b, c)[0],
                    jax.ShapeDtypeStruct(K_ii0.shape, dtype),
                    jax.ShapeDtypeStruct(K_ir0.shape, dtype),
                    jax.ShapeDtypeStruct(K_rr0.shape, dtype),
                )
                factors0 = jax.tree_util.tree_map(
                    lambda sd: jnp.zeros(sd.shape, sd.dtype), _fshape
                ) + (jnp.asarray(0.0, dtype),)
            elif use_structured:

                def lin_factor(K):
                    factors, p_min, p_max = _s_factor(K)
                    ok = (
                        jnp.isfinite(p_min)
                        & jnp.isfinite(p_max)
                        & (p_min > pivot_rtol * p_max)
                    )
                    return factors, ok

                lin_apply = _s_apply
                import jax as _jax

                _fshape = _jax.eval_shape(
                    lambda K: _s_factor(K)[0],
                    jax.ShapeDtypeStruct((n, n), dtype),
                )
                factors0 = jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), _fshape
                )
            else:

                def lin_factor(K):
                    # Jacobi equilibration: K carries an intrinsic ~1/delta_c
                    # spread between constraint-normal and tangential
                    # directions which would destroy a float32 Cholesky; the
                    # spread sits on the diagonal, so symmetric diagonal
                    # scaling removes most of it and the pivot test sees the
                    # *scaled* conditioning
                    sc = lax.rsqrt(jnp.maximum(jnp.diagonal(K), 1e-30))
                    Kt = K * sc[:, None] * sc[None, :]
                    Lc = jnp.linalg.cholesky(Kt)
                    diag = jnp.diagonal(Lc)
                    chol_ok = jnp.all(jnp.isfinite(diag)) & (
                        jnp.min(diag) > pivot_rtol * jnp.max(diag)
                    )
                    Lc_safe = jnp.where(chol_ok, Lc, eye)
                    return (Lc_safe, sc), chol_ok

                def lin_apply(fac, b):
                    Lc, sc = fac
                    t = jax.scipy.linalg.solve_triangular(
                        Lc, sc * b, lower=True
                    )
                    return sc * jax.scipy.linalg.solve_triangular(
                        Lc.T, t, lower=False
                    )

                factors0 = (eye, jnp.ones((n,), dtype))

            if not use_pallas:
                # residual acceptance (see options.newton_residual_rtol):
                # usable when the factored operator's matvec is exact —
                # block mode without a low-rank discrepancy, or the dense/
                # structured paths where K is materialized
                _res_check = bool(opt.newton_residual_rtol) and (
                    not use_block or not _bk_krylov
                )

                def _try(delta):
                    if use_block:
                        fac, chol_ok = lin_factor_delta(delta)
                    else:
                        K = K0 + delta * eye
                        fac, chol_ok = lin_factor(K)
                    dz = lin_apply(fac, rhs)
                    ok = (
                        chol_ok
                        & jnp.all(jnp.isfinite(dz))
                        & (jnp.linalg.norm(dz) <= step_cap)
                    )
                    if _res_check:
                        if use_block:
                            Kdz = w_mv(dz) + (sigma_z + delta) * dz
                            if m:
                                Kdz = Kdz + jt_mv(D * j_mv(dz))
                        else:
                            Kdz = (K0 + delta * eye) @ dz
                        r_fin = rhs - Kdz
                        ok = ok & (
                            jnp.linalg.norm(r_fin)
                            <= opt.newton_residual_rtol
                            * jnp.maximum(jnp.linalg.norm(rhs), 1e-30)
                        )
                    # a failed factorization may carry non-finite factors
                    # (block mode has no Lc_safe analog); zero the direction
                    # so a rejected step can never poison z via 0 * nan
                    return fac, jnp.where(ok, dz, 0.0), ok

                def reg_cond(carry):
                    return (~carry[3]) & (carry[4] < opt.max_reg_tries) & active

                def reg_body(carry):
                    _, _, delta, _, tries = carry
                    delta_new = jnp.where(
                        tries == 0,
                        dreg_eff,
                        jnp.where(
                            (tries == 1) & (dreg_eff < delta_w_floor),
                            jnp.asarray(delta_w_floor, dtype),
                            jnp.minimum(
                                jnp.maximum(delta, delta_w_floor) * 10.0,
                                opt.delta_w_max,
                            ),
                        ),
                    )
                    fac, dz, ok = _try(delta_new)
                    return fac, dz, delta_new, ok, tries + 1

                fac_k, dz, delta_w, reg_ok, _ = lax.while_loop(
                    reg_cond,
                    reg_body,
                    (
                        factors0,
                        jnp.zeros((n,), dtype),
                        st.dreg,
                        jnp.asarray(False),
                        0,
                    ),
                )

                def chol_solve(b):
                    return lin_apply(fac_k, b)

            if mehrotra:
                # -- Mehrotra probe: the escalation solved the affine
                # (mu = 0) system; measure how much complementarity the
                # pure Newton step would retire, retarget mu by the cubic
                # rule, then re-solve the centered rhs against the SAME
                # factorization (one extra back-substitution) -------------
                dz_aff = dz
                if m:
                    Jdz_a = j_mv(dz_aff) if use_block else J @ dz_aff
                else:
                    Jdz_a = jnp.zeros((0,), dtype)
                ds_a = jnp.where(eq, 0.0, Jdz_a + r_c)
                dw_l_a = jnp.where(has_zl, -w_l - w_l * inv_al * dz_aff, 0.0)
                dw_u_a = jnp.where(has_zu, -w_u + w_u * inv_au * dz_aff, 0.0)
                dv_l_a = jnp.where(has_cl, -v_l - v_l * inv_bl * ds_a, 0.0)
                dv_u_a = jnp.where(has_cu, -v_u + v_u * inv_bu * ds_a, 0.0)
                a_p = jnp.minimum(
                    jnp.minimum(
                        _max_step(has_zl, al, dz_aff, 1.0),
                        _max_step(has_zu, au, -dz_aff, 1.0),
                    ),
                    jnp.minimum(
                        _max_step(has_cl, bl, ds_a, 1.0),
                        _max_step(has_cu, bu, -ds_a, 1.0),
                    ),
                )
                a_d = jnp.minimum(
                    jnp.minimum(
                        _max_step(has_zl, w_l, dw_l_a, 1.0),
                        _max_step(has_zu, w_u, dw_u_a, 1.0),
                    ),
                    jnp.minimum(
                        _max_step(has_cl, v_l, dv_l_a, 1.0),
                        _max_step(has_cu, v_u, dv_u_a, 1.0),
                    ),
                )

                def _comp(al_, au_, bl_, bu_, wl_, wu_, vl_, vu_):
                    return (
                        jnp.sum(jnp.where(has_zl, al_ * wl_, 0.0))
                        + jnp.sum(jnp.where(has_zu, au_ * wu_, 0.0))
                        + jnp.sum(jnp.where(has_cl, bl_ * vl_, 0.0))
                        + jnp.sum(jnp.where(has_cu, bu_ * vu_, 0.0))
                    )

                n_comp = (
                    jnp.sum(has_zl)
                    + jnp.sum(has_zu)
                    + jnp.sum(has_cl)
                    + jnp.sum(has_cu)
                )
                denom = jnp.maximum(n_comp, 1).astype(dtype)
                avg = _comp(al, au, bl, bu, w_l, w_u, v_l, v_u) / denom
                mu_aff = (
                    _comp(
                        al + a_p * dz_aff,
                        au - a_p * dz_aff,
                        bl + a_p * ds_a,
                        bu - a_p * ds_a,
                        w_l + a_d * dw_l_a,
                        w_u + a_d * dw_u_a,
                        v_l + a_d * dv_l_a,
                        v_u + a_d * dv_u_a,
                    )
                    / denom
                )
                sigma = jnp.clip(
                    (mu_aff / jnp.maximum(avg, 1e-30)) ** 3, 0.0, 1.0
                )
                mu_m = jnp.clip(sigma * avg, opt.tol / 10.0, opt.mu_init)
                probe_ok = (
                    (n_comp > 0)
                    & jnp.isfinite(mu_m)
                    & reg_ok
                    & jnp.all(jnp.isfinite(dz_aff))
                )
                mu = jnp.where(probe_ok, mu_m, mu)
                # second-order corrector: per-element complementarity
                # targets mu - da_aff * dw_aff (Mehrotra), safeguarded into
                # [0, 10 mu] (Gondzio-style clip — a wild outer product must
                # not push the target out of the cone). Zeroed when the
                # probe itself is unusable.
                corr = jnp.where(probe_ok, one, 0.0)
                t_zl = jnp.clip(mu - corr * dz_aff * dw_l_a, 0.0, 10.0 * mu)
                t_zu = jnp.clip(mu + corr * dz_aff * dw_u_a, 0.0, 10.0 * mu)
                t_sl = jnp.clip(mu - corr * ds_a * dv_l_a, 0.0, 10.0 * mu)
                t_su = jnp.clip(mu + corr * ds_a * dv_u_a, 0.0, 10.0 * mu)
                # centered+corrected direction at the retargeted mu (rebinds
                # g_z/g_s so the saddle refinement and dw/dv recovery below
                # target the corrected system)
                g_z = g + jty - t_zl * inv_al + t_zu * inv_au
                g_s = jnp.where(
                    eq, 0.0, -y - t_sl * inv_bl + t_su * inv_bu
                )
                rhs = _rhs_of(g_z, g_s)
                dz_c = chol_solve(rhs)
                ok_c = jnp.all(jnp.isfinite(dz_c)) & (
                    jnp.linalg.norm(dz_c) <= step_cap
                )
                dz = jnp.where(ok_c, dz_c, dz)
            else:
                t_zl = t_zu = t_sl = t_su = mu

            def _expand(dz_):
                """Recover slack/dual directions from a primal direction."""
                if m:
                    Jdz_ = j_mv(dz_) if use_block else J @ dz_
                else:
                    Jdz_ = jnp.zeros((0,), dtype)
                dy_ = D * (Jdz_ + r_c) + g_s
                ds_ = jnp.where(eq, 0.0, Jdz_ + r_c)
                return Jdz_, dy_, ds_

            Jdz, dy, ds = _expand(dz)

            # saddle-point iterative refinement: correct (dz, dy) against the
            # TRUE (unperturbed) KKT system using the regularized
            # factorization as a preconditioner. The dual regularization
            # delta_c and the delta_w floor otherwise cap convergence at a
            # linear rate ~ perturbation / smallest curvature (visible as
            # float32 stalls); refining dz alone cannot help because the
            # condensed operator embeds the perturbation. Skipped (kept as
            # the plain perturbed step) when delta_w is an intentional
            # inertia correction rather than a numerical floor.
            if m:
                # NOTE: (W + diag(sigma_z)) @ dz must be computed in its
                # explicit form, NOT as K0 @ dz - J^T D (J dz): K0 carries
                # 1/delta_c-scale terms and that difference cancels
                # catastrophically in float32, destroying the refinement
                # (observed as a 2x iteration-count regression). The HVP in
                # block mode IS the explicit form.
                if use_block:
                    a_mv = lambda v: w_mv(v) + sigma_z * v
                    jt_ = jt_mv
                    j_ = j_mv
                else:
                    A_diag = W + jnp.diag(sigma_z)
                    a_mv = lambda v: A_diag @ v
                    jt_ = lambda u: J.T @ u
                    j_ = lambda v: J @ v
                inv_sig_s = jnp.where(eq | (sigma_s <= 0.0), 0.0, 1.0 / jnp.where(sigma_s > 0.0, sigma_s, 1.0))
                # refinement policy: the delta_c relaxation caps the f32
                # contraction rate only in the ENDGAME (near-feasible,
                # superlinear tail); during globalization the unperturbed
                # target may be singular/indefinite and chasing it
                # destabilizes the filter line search (observed: f32 orbit
                # diverges with mid-run refinement, converges without).
                # Activate only when near-feasible (the filter's own f-type
                # region) and delta_w is a numerical floor, and
                # self-validate each correction against the true residual.
                theta_now = jnp.sum(jnp.abs(r_c))
                endgame = theta_now <= jnp.maximum(theta_min, 1e3 * eps_dt)
                numerical_reg = (delta_w <= 100.0 * delta_w_floor) & endgame

                def _saddle_resid(dz_, dy_, Jdz_):
                    """Residual of the TRUE (unperturbed-delta_c) step
                    equations at a candidate (dz, dy)."""
                    r1 = -g_z - a_mv(dz_) - delta_w * dz_ - jt_(dy_)
                    r2 = -(r_c + Jdz_) + jnp.where(
                        eq, 0.0, (dy_ - g_s) * inv_sig_s
                    )
                    return r1, r2

                rho1, rho2 = _saddle_resid(dz, dy, Jdz)
                res_sq = rho1 @ rho1 + rho2 @ rho2
                for _ in range(opt.refine_steps):
                    dzc = chol_solve(rho1 + jt_(D * rho2))
                    dyc = D * (j_(dzc) - rho2)
                    dz_t = dz + dzc
                    dy_t = dy + dyc
                    Jdz_t = j_(dz_t)
                    rho1_t, rho2_t = _saddle_resid(dz_t, dy_t, Jdz_t)
                    res_sq_t = rho1_t @ rho1_t + rho2_t @ rho2_t
                    # self-validating refinement: the unperturbed target can
                    # be singular/indefinite away from the solution (the
                    # delta_c relaxation is what made it solvable), in which
                    # case corrections are garbage — accept a correction
                    # only when it measurably reduces the true residual
                    accept = numerical_reg & (res_sq_t < 0.9 * res_sq)
                    # select (not 0/1-multiply): dzc may be non-finite when
                    # the factors are garbage, and 0 * nan = nan
                    dz = jnp.where(accept, dz_t, dz)
                    dy = jnp.where(accept, dy_t, dy)
                    Jdz = jnp.where(accept, Jdz_t, Jdz)
                    rho1 = jnp.where(accept, rho1_t, rho1)
                    rho2 = jnp.where(accept, rho2_t, rho2)
                    res_sq = jnp.where(accept, res_sq_t, res_sq)
                ds = jnp.where(eq, 0.0, Jdz + r_c)
            else:
                numerical_reg = delta_w <= 100.0 * delta_w_floor
                delta_target = jnp.where(numerical_reg, 0.0, delta_w)
                if use_block:
                    kref_mv = lambda v: (
                        w_mv(v) + (sigma_z + delta_target) * v
                    )
                else:
                    kref_mv = lambda v: (K0 + delta_target * eye) @ v
                for _ in range(opt.refine_steps):
                    dz_t = dz - chol_solve(kref_mv(dz) - rhs)
                    dz = jnp.where(jnp.all(jnp.isfinite(dz_t)), dz_t, dz)
            dy_cap = 1e3 * (one + jnp.max(jnp.abs(y), initial=0.0))
            dy_norm = jnp.max(jnp.abs(dy), initial=0.0)
            dy = dy * jnp.minimum(1.0, dy_cap / jnp.maximum(dy_norm, 1e-30))
            # t_* are the per-element complementarity targets: plain mu for
            # the monotone/adaptive rules, mu - da_aff*dw_aff (clipped) for
            # the Mehrotra corrector
            dw_l = jnp.where(has_zl, t_zl * inv_al - w_l - w_l * inv_al * dz, 0.0)
            dw_u = jnp.where(has_zu, t_zu * inv_au - w_u + w_u * inv_au * dz, 0.0)
            dv_l = jnp.where(has_cl, t_sl * inv_bl - v_l - v_l * inv_bl * ds, 0.0)
            dv_u = jnp.where(has_cu, t_su * inv_bu - v_u + v_u * inv_bu * ds, 0.0)

            # -- fraction to boundary -----------------------------------
            tau = jnp.maximum(opt.tau_min, 1.0 - mu)

            def _ftb_primal(dz_, ds_):
                return jnp.minimum(
                    jnp.minimum(
                        _max_step(has_zl, al, dz_, tau),
                        _max_step(has_zu, au, -dz_, tau),
                    ),
                    jnp.minimum(
                        _max_step(has_cl, bl, ds_, tau),
                        _max_step(has_cu, bu, -ds_, tau),
                    ),
                )

            a_pri_max = _ftb_primal(dz, ds)
            a_dual = jnp.minimum(
                jnp.minimum(
                    _max_step(has_zl, w_l, dw_l, tau),
                    _max_step(has_zu, w_u, dw_u, tau),
                ),
                jnp.minimum(
                    _max_step(has_cl, v_l, dv_l, tau),
                    _max_step(has_cu, v_u, dv_u, tau),
                ),
            )

            # -- filter line search (Wächter-Biegler) -------------------
            phi0, theta0 = _phi_theta(z, s, mu, rt)
            dphi = (g - mu * inv_al + mu * inv_au) @ dz + (
                (-mu * inv_bl + mu * inv_bu) @ ds if m else 0.0
            )

            def _filter_ok(th_t, ph_t):
                ok_each = (th_t <= (1.0 - GAMMA_TH) * th_f) | (
                    ph_t <= ph_f - GAMMA_PH * th_f
                )
                return jnp.all(ok_each)

            def _acceptable(alpha, th_t, ph_t):
                switching = (
                    (dphi < 0)
                    & (
                        alpha * jnp.abs(dphi) ** S_PH
                        > DELTA_SW * jnp.maximum(theta0, 1e-30) ** S_TH
                    )
                    & (theta0 <= theta_min)
                )
                armijo = ph_t <= phi0 + ETA_PH * alpha * dphi
                suff = (th_t <= (1.0 - GAMMA_TH) * theta0) | (
                    ph_t <= phi0 - GAMMA_PH * theta0
                )
                return (
                    _filter_ok(th_t, ph_t)
                    & jnp.where(switching, armijo, suff),
                    switching,
                )

            def _trial(alpha, dz_, ds_):
                ph_t, th_t = _phi_theta(z + alpha * dz_, s + alpha * ds_, mu, rt)
                acc, sw = _acceptable(alpha, th_t, ph_t)
                return ph_t, th_t, acc, sw

            # first trial at the full fraction-to-boundary step
            ph_1, th_1, acc_1, sw_1 = _trial(a_pri_max, dz, ds)

            # second-order correction: when the full step was rejected and
            # did not reduce infeasibility, correct the direction with the
            # constraint values at the trial point (re-using the factors)
            def _soc():
                z_t = z + a_pri_max * dz
                c_t = c_fn(z_t, rt) if m else jnp.zeros((0,), dtype)
                s_t = s + a_pri_max * ds
                r_soc = jnp.where(eq, c_t - cl, c_t - s_t)
                if m:
                    jtr = jt_mv(D * r_soc) if use_block else J.T @ (D * r_soc)
                    dz_cor = chol_solve(-jtr)
                else:
                    dz_cor = dz * 0.0
                dz_soc = a_pri_max * dz + dz_cor
                _, _, ds_soc = _expand(dz_soc)
                a_soc = _ftb_primal(dz_soc, ds_soc)
                ph_s, th_s = _phi_theta(z + a_soc * dz_soc, s + a_soc * ds_soc, mu, rt)
                acc_s, sw_s = _acceptable(a_soc, th_s, ph_s)
                good = acc_s & (th_s <= KAPPA_SOC * theta0)
                return good, a_soc, dz_soc, ds_soc, ph_s, th_s, sw_s

            soc_wanted = (~acc_1) & (th_1 >= theta0) & (m > 0) & opt.soc
            if not opt.soc:
                soc_good = jnp.asarray(False)
                a_soc = one
                dz_soc, ds_soc = dz, ds
                sw_soc = jnp.asarray(False)
            elif use_pallas:
                # no lax.cond around the Pallas back-solve: cond batching
                # would promote the closure-threaded factors to batched
                # operands, which custom_vmap forbids. Under vmap the cond
                # runs both branches anyway, so unconditional + mask is the
                # same work in the batched production path.
                soc_good, a_soc, dz_soc, ds_soc, ph_soc, th_soc, sw_soc = (
                    _soc()
                )
                soc_good = soc_good & soc_wanted
            else:
                soc_good, a_soc, dz_soc, ds_soc, ph_soc, th_soc, sw_soc = (
                    lax.cond(
                        soc_wanted,
                        _soc,
                        lambda: (
                            jnp.asarray(False),
                            one,
                            dz,
                            ds,
                            inf,
                            inf,
                            jnp.asarray(False),
                        ),
                    )
                )

            # backtracking on the original direction for the remaining trials
            def ls_cond(carry):
                alpha, accepted, k, _ = carry
                return (~accepted) & (k < opt.max_ls) & active

            def ls_body(carry):
                alpha, _, k, _ = carry
                alpha = alpha * 0.5
                _, th_t, acc, sw = _trial(alpha, dz, ds)
                return alpha, acc, k + 1, sw

            alpha_bt, acc_bt, _, sw_bt = lax.while_loop(
                ls_cond,
                ls_body,
                (a_pri_max, acc_1 | soc_good, 0, jnp.asarray(False)),
            )

            # select the step: SOC > first trial > backtracked > rejected
            use_soc = soc_good
            use_first = acc_1
            accepted = acc_1 | soc_good | acc_bt
            alpha = jnp.where(
                use_first, a_pri_max, jnp.where(use_soc, a_soc, alpha_bt)
            )
            dz_eff = jnp.where(use_soc & ~use_first, dz_soc, dz)
            ds_eff = jnp.where(use_soc & ~use_first, ds_soc, ds)
            sw_eff = jnp.where(
                use_first, sw_1, jnp.where(use_soc, sw_soc, sw_bt)
            )

            # -- feasibility fallback: if every trial failed, take a damped
            # Gauss-Newton step on the constraint violation alone ----------
            def _feas_dir():
                if m:
                    jtr = jt_mv(D * r_c) if use_block else J.T @ (D * r_c)
                    dz_f = chol_solve(-jtr)
                else:
                    dz_f = dz * 0.0
                _, _, ds_f = _expand(dz_f)
                return dz_f, ds_f

            if opt.feasibility_fallback:
                dz_fb, ds_fb = _feas_dir()
                a_fb_max = _ftb_primal(dz_fb, ds_fb)

                def fb_cond(carry):
                    alpha_f, ok, k = carry
                    return (~ok) & (k < opt.max_ls) & active

                def fb_body(carry):
                    alpha_f, _, k = carry
                    alpha_f = jnp.where(k == 0, a_fb_max, alpha_f * 0.5)
                    ph_t, th_t = _phi_theta(
                        z + alpha_f * dz_fb, s + alpha_f * ds_fb, mu, rt
                    )
                    ok = (th_t < (1.0 - GAMMA_TH * 0.1) * theta0) & jnp.isfinite(
                        ph_t
                    )
                    return alpha_f, ok, k + 1

                a_fb, fb_ok, _ = lax.while_loop(
                    fb_cond,
                    fb_body,
                    (a_fb_max, accepted | (theta0 <= 1e-14), 0),
                )
                use_fb = (~accepted) & fb_ok & (theta0 > 1e-14)
            else:
                dz_fb, ds_fb = dz, ds
                a_fb = jnp.asarray(0.0, dtype)
                use_fb = jnp.asarray(False)
            alpha = jnp.where(use_fb, a_fb, jnp.where(accepted, alpha, 0.0))
            dz_eff = jnp.where(use_fb, dz_fb, dz_eff)
            ds_eff = jnp.where(use_fb, ds_fb, ds_eff)
            took_step = accepted | use_fb

            # filter augmentation for h-type (non-Armijo) accepted steps
            augment = took_step & ~(sw_eff & ~use_fb)

            def _augment(th_f, ph_f):
                # replace the least-restrictive free/worst slot; slot 0 holds
                # the theta_max cap and must never be evicted (losing it would
                # drop the infeasibility upper bound for the rest of the stage)
                score = jnp.where(jnp.isinf(th_f) & (th_f > 0), inf, th_f)
                score = score.at[0].set(-inf)
                idx = jnp.argmax(score)
                return (
                    th_f.at[idx].set((1.0 - GAMMA_TH) * theta0),
                    ph_f.at[idx].set(phi0 - GAMMA_PH * theta0),
                )

            th_f_new, ph_f_new = lax.cond(
                augment, _augment, lambda a, b: (a, b), th_f, ph_f
            )

            # -- apply the step -----------------------------------------
            dy_eff = jnp.where(use_fb, 0.0, dy)
            z_n = z + alpha * dz_eff
            s_n = s + alpha * ds_eff
            y_n = y + alpha * dy_eff
            # slack correction (IPOPT §3.5 analog): a float32 step can land
            # exactly ON a bound despite fraction-to-boundary (the update
            # rounds to the bound value), giving zero slack -> inf duals ->
            # 0 * inf = nan in the complementarity products. Push strictly
            # inside by a machine-eps-relative margin, far below tolerance.
            d_zb = eps_dt * (1.0 + jnp.abs(z_n))
            d_zb = jnp.where(
                has_zl & has_zu, jnp.minimum(d_zb, 0.25 * (zu_r - zl_r)), d_zb
            )
            z_n = jnp.where(has_zl, jnp.maximum(z_n, zl_r + d_zb), z_n)
            z_n = jnp.where(has_zu, jnp.minimum(z_n, zu_r - d_zb), z_n)
            if m:
                d_sb = eps_dt * (1.0 + jnp.abs(s_n))
                d_sb = jnp.where(
                    has_cl & has_cu,
                    jnp.minimum(d_sb, 0.25 * (cu_r - cl_r)),
                    d_sb,
                )
                s_n = jnp.where(has_cl & ~eq, jnp.maximum(s_n, cl_r + d_sb), s_n)
                s_n = jnp.where(has_cu & ~eq, jnp.minimum(s_n, cu_r - d_sb), s_n)
            a_dual_eff = jnp.where(took_step & ~use_fb, a_dual, 0.0)
            w_l_n = w_l + a_dual_eff * dw_l
            w_u_n = w_u + a_dual_eff * dw_u
            v_l_n = v_l + a_dual_eff * dv_l
            v_u_n = v_u + a_dual_eff * dv_u

            # dual safeguard (keeps Sigma bounded relative to mu / primal)
            kap = jnp.asarray(1e10, dtype)
            al_n = jnp.where(has_zl, z_n - zl_r, one)
            au_n = jnp.where(has_zu, zu_r - z_n, one)
            bl_n = jnp.where(has_cl, s_n - cl_r, one)
            bu_n = jnp.where(has_cu, cu_r - s_n, one)
            w_l_n = jnp.where(
                has_zl, jnp.clip(w_l_n, mu / (kap * al_n), kap * mu / al_n), 0.0
            )
            w_u_n = jnp.where(
                has_zu, jnp.clip(w_u_n, mu / (kap * au_n), kap * mu / au_n), 0.0
            )
            v_l_n = jnp.where(
                has_cl, jnp.clip(v_l_n, mu / (kap * bl_n), kap * mu / bl_n), 0.0
            )
            v_u_n = jnp.where(
                has_cu, jnp.clip(v_u_n, mu / (kap * bu_n), kap * mu / bu_n), 0.0
            )

            rejects_n = jnp.where(took_step, 0, st.rejects + 1)
            do_reset = rejects_n >= 5
            # a second stall after a multiplier reset with significant
            # constraint violation indicates local infeasibility: the
            # feasibility fallback cannot reduce theta from this point
            infeasible = do_reset & (st.resets >= 1) & (theta0 > 1e3 * opt.tol)
            resets_n = st.resets + jnp.where(do_reset, 1, 0)
            y_n = jnp.where(do_reset, 0.0, y_n)
            w_l_n = jnp.where(do_reset & has_zl, mu / al_n, w_l_n)
            w_u_n = jnp.where(do_reset & has_zu, mu / au_n, w_u_n)
            v_l_n = jnp.where(do_reset & has_cl, mu / bl_n, v_l_n)
            v_u_n = jnp.where(do_reset & has_cu, mu / bu_n, v_u_n)
            th_f_new = jnp.where(do_reset, th_f0, th_f_new)
            ph_f_new = jnp.where(do_reset, ph_f0, ph_f_new)
            rejects_n = jnp.where(do_reset, 0, rejects_n)

            # regularization memory, Levenberg-Marquardt style: decay
            # gently when the Newton step was accepted, escalate moderately
            # when it was rejected (the fallback counts as a rejection of
            # the Newton direction) — aggressive x100/÷10 jumps set up a
            # two-cycle of wild and over-damped steps.
            #
            # Batched note (r4): a sticky hold-the-level policy was tried
            # here to stop marginal lanes re-buying full-batch escalation
            # rounds every iteration; it regressed the nonconvex f32 gates
            # (orbit diverged, isoperimetric 2x iterations) because held
            # regularization destroys Newton quality exactly where decay
            # matters. The batched cost is attacked structurally instead:
            # the Pallas factor kernel retries failing blocks VMEM-locally
            # at a per-lane bumped delta (solver/pallas_kkt.py), so an
            # escalation almost never costs an HBM round trip.
            newton_ok = accepted & reg_ok
            dreg_n = jnp.where(
                newton_ok,
                jnp.where(delta_w / 3.0 < delta_w_floor, 0.0, delta_w / 3.0),
                jnp.minimum(
                    jnp.maximum(delta_w, delta_w_floor) * 10.0, opt.delta_w_max
                ),
            )
            dreg_n = jnp.where(do_reset, 0.0, dreg_n)

            if _DEBUG_TRACE:
                # diagnostic mode (POCKIT_IPM_DEBUG_TRACE=1): record Newton
                # direction internals [|rhs|, max|K|, |dz|, max|dz|,
                # delta_w, step_cap] instead of the standard row, to bisect
                # backend/batch-size-dependent numerical anomalies (this is
                # how the r4 bf16-einsum-in-custom_vmap-rule bug was found)
                _dK = (
                    jnp.max(jnp.abs(K_ii0))
                    if use_block
                    else jnp.max(jnp.abs(K0))
                )
                trace_row = jnp.stack(
                    [
                        jnp.linalg.norm(rhs),
                        _dK,
                        jnp.linalg.norm(dz),
                        jnp.max(jnp.abs(dz)),
                        delta_w,
                        step_cap,
                    ]
                )
            else:
                trace_row = jnp.stack([E0, mu, alpha, delta_w, theta0, phi0])
            trace_n = lax.dynamic_update_slice(
                st.trace, trace_row[None, :], (st.it, jnp.asarray(0, st.it.dtype))
            )
            if opt.live_metrics:
                jax.debug.callback(
                    _emit_live_metrics, st.it, trace_row, finished_prev=st.done
                )

            # freeze finished lanes (vmap-safe), record status transitions
            finished = st.done | newly_done | blown | infeasible
            sel = lambda new, old: jnp.where(finished, old, new)
            return _State(
                z=sel(z_n, z),
                s=sel(s_n, s),
                y=sel(y_n, y),
                w_l=sel(w_l_n, w_l),
                w_u=sel(w_u_n, w_u),
                v_l=sel(v_l_n, v_l),
                v_u=sel(v_u_n, v_u),
                mu=sel(mu, st.mu),
                dreg=sel(dreg_n, st.dreg),
                th_f=jnp.where(finished, st.th_f, th_f_new),
                ph_f=jnp.where(finished, st.ph_f, ph_f_new),
                trace=jnp.where(finished, st.trace, trace_n),
                rejects=jnp.where(finished, st.rejects, rejects_n),
                resets=jnp.where(finished, st.resets, resets_n),
                it=jnp.where(finished, st.it, st.it + 1),
                done=finished,
                status=jnp.where(
                    st.done,
                    st.status,
                    jnp.where(
                        newly_done,
                        0,
                        jnp.where(
                            blown, 2, jnp.where(infeasible, 3, st.status)
                        ),
                    ),
                ).astype(jnp.int32),
                kkt=jnp.where(st.done, st.kkt, E0),
            )

        def cond(st: _State):
            return (~st.done) & (st.it < opt.max_iter)

        final = lax.while_loop(cond, body, state)

        # recompute the final KKT error for reporting (J^T y via one vjp —
        # no Jacobian materialization in any mode)
        g = grad_fn(final.z, rt)
        if m:
            c0, _cvjp_f = jax.vjp(lambda v: c_fn(v, rt), final.z)
            jty_f = _cvjp_f(final.y)[0]
        else:
            c0 = jnp.zeros((0,), dtype)
            jty_f = jnp.zeros((n,), dtype)
        kkt = _kkt_error(
            final.z,
            final.s,
            final.y,
            final.w_l,
            final.w_u,
            final.v_l,
            final.v_u,
            g,
            jty_f,
            c0,
            0.0,
        )
        y_fin = final.y
        if m:
            # post-loop dual refresh: a lane that took its last IMPROVING
            # primal step exactly at max_iter carries duals one Newton
            # update behind its (converged) primal — re-estimating y by
            # least squares at the final point certifies it in-program.
            # Before this, such lanes bought a whole compacted drain round
            # that then converged in 0 iterations off the drain's fresh
            # LS init (BENCH_NOTES r4/r5). Accepted per-lane only when it
            # strictly improves the measured KKT error.
            y_ls = _ls_multipliers(final.z, final.w_l, final.w_u, g_=g)
            kkt_ls = _kkt_error(
                final.z,
                final.s,
                y_ls,
                final.w_l,
                final.w_u,
                final.v_l,
                final.v_u,
                g,
                _cvjp_f(y_ls)[0],
                c0,
                0.0,
            )
            better = kkt_ls < kkt
            y_fin = jnp.where(better, y_ls, y_fin)
            kkt = jnp.where(better, kkt_ls, kkt)
        status = jnp.where(kkt <= opt.tol, 0, final.status)
        return IPResult(
            z=final.z,
            s=final.s,
            y=y_fin,
            obj=f_fn(final.z, rt),
            status=status,
            iterations=final.it,
            kkt_error=kkt,
            mu=final.mu,
            trace=final.trace,
        )

    return solve
