"""Structured KKT solve: interval-interior elimination + border Schur.

The condensed interior-point matrix ``K = W + Σ_z + δ_w I + Jᵀ D J`` of a
collocation NLP is block-arrow by construction (SURVEY §5 "long-context"
analog): collocation points couple only within their subinterval (the
``T``/``I`` blocks are interval-local and every nonlinear function is
pointwise), adjacent intervals touch only through shared border points,
and the time variables ``t_0, t_f`` plus the static parameters couple
everything (the "arrow"). For a phase with N uniform intervals:

    columns = interiors(N x n_int, disjoint)  ∪  reduced(borders + arrow)

so K factors by eliminating every interval interior *in parallel* — one
batched Cholesky of N small (n_int x n_int) blocks, MXU-shaped — followed
by a dense solve of the small reduced Schur complement:

    S = K_rr - Σ_i K_ri K_ii^{-1} K_ir.

Cost: O(N n_int³ + n_red³) instead of the dense O(L³) — for a 40x10 mesh
that is ~500x fewer flops, and the per-interval blocks batch perfectly.

Validity requires the block-arrow pattern to be exact, which holds when
the system objective and system constraints are *linear in the integral
symbols* (nonlinear-in-I terms add a low-rank dense coupling; those
problems fall back to the dense path). ``structured_layout`` checks the
structural preconditions and the pattern is oracle-tested against dense
AD in the test suite.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import sympy as sp


class StructuredLayout(NamedTuple):
    """Static index layout of the block-arrow pattern.

    ``krylov_rank`` counts the dense low-rank coupling OUTSIDE the pattern
    (system-constraint rows, nonlinear-in-integral objective terms): 0 means
    the pattern is exact and one factor/apply pass solves K; r > 0 means
    the pattern factorization is used as a preconditioner for r + 2 CG
    steps, which eliminates a rank-r discrepancy exactly.

    Ragged interiors (hp-refined meshes with per-interval degrees, or
    phases of different degree) are padded at the END of each row with the
    PHANTOM column ``n_cols`` (one past the last real column). Consumers
    follow the phantom convention of :func:`make_block_arrow_core`:
    gathers read a zero-extended vector, scatters drop the out-of-range
    index, and the assembled blocks carry 1.0 on padded diagonal slots so
    the factorization treats them as decoupled unit pivots.
    """

    interior: np.ndarray  # (n_blocks, ni_max) global column indices, padded
    reduced: np.ndarray  # (n_red,) global column indices (borders + arrow)
    krylov_rank: int = 0
    n_cols: int = 0  # total real columns; doubles as the phantom index


def structured_layout(system) -> Optional[StructuredLayout]:
    """Compute the block-arrow layout of a compiled system's KKT matrix.

    Ragged interval degrees (within a phase — hp-refined meshes — or
    across phases) yield interior rows padded with the phantom column
    (see :class:`StructuredLayout`). Returns ``None`` only when there is
    no interior at all (every column is a border/arrow column — degenerate
    tiny meshes where the dense path is the right tool anyway). Dense
    low-rank couplings outside the pattern — system-constraint rows and
    objective terms nonlinear in the integral symbols — are counted into
    ``krylov_rank`` and handled by pattern-preconditioned CG in the solve.
    """
    # Discrepancy-rank budget for the pattern-preconditioned CG. With the
    # block assembly weighting each integral's pointwise Hessian by
    # alpha_j = dPhi/dI_j at the CURRENT (I(z), s, y_sys) and placing
    # d2Phi/ds2 into K_rr (transcription/kkt.py), the remaining
    # out-of-pattern/unassembled discrepancy is
    #     B^T H_II B + B^T H_Is S + (B^T H_Is S)^T + J_sys^T D J_sys
    # with B = dI/dz — rank <= n_I_involved + n_s_coupled + n_sys_rows.
    # Both Hessian pieces must be detected across ALL exprs (objective AND
    # system rows) and across phases: I_a * I_b with a, b in different
    # phases couples their blocks just as hard as within one phase.
    krylov_rank = 0
    all_I = [I_sym for p in system.p for I_sym in p.I]
    s_syms = list(system.s)
    exprs = [sp.sympify(system._expr_objective)] + [
        sp.sympify(c) for c in system.expr_system_constraint
    ]
    I_involved = set()
    s_coupled = set()
    # NOTE first derivatives of system rows do NOT count: their dense
    # Jacobian coupling is already bounded by the separate + n_c term, and
    # the y_sys-weighted first-order curvature is assembled in-pattern
    for e in exprs:
        for ia, a in enumerate(all_I):
            for b in all_I[ia:]:
                if sp.diff(e, a, b) != 0:
                    I_involved.add(a)
                    I_involved.add(b)
            for sk in s_syms:
                if sp.diff(e, a, sk) != 0:
                    I_involved.add(a)
                    s_coupled.add(sk)
    krylov_rank += len(I_involved) + len(s_coupled)
    krylov_rank += system.n_c  # dense system-constraint Jacobian rows

    interior_blocks = []
    reduced = []
    for pi, p in enumerate(system.p):
        d = p.d
        off = int(system.l_p[pi])
        # per variable, per interval: interior vs border indices
        per_interval = [[] for _ in range(d.N)]
        for v in range(p.n):
            base = off + int(d.l_v[v])
            is_state = v < p.n_x
            if d.family == "lobatto" or is_state:
                # shared borders: interval i occupies [l_x[i], r_x[i])
                l_idx, r_idx = (d.l_x, d.r_x) if is_state else (d.l_u, d.r_u)
                if d.family == "lobatto":
                    l_idx, r_idx = d.l_m, d.r_m
                borders = set()
                for i in range(d.N):
                    borders.add(int(l_idx[i]))
                    borders.add(int(r_idx[i]) - 1)
                for i in range(d.N):
                    for k in range(int(l_idx[i]), int(r_idx[i])):
                        if k in borders:
                            continue
                        per_interval[i].append(base + k)
                reduced.extend(base + k for k in sorted(borders))
            else:
                # radau controls: fully interval-local, no sharing
                for i in range(d.N):
                    for k in range(int(d.l_u[i]), int(d.r_u[i])):
                        per_interval[i].append(base + k)
        # t_0, t_f are arrow columns
        reduced.extend([off + d.L - 2, off + d.L - 1])
        interior_blocks.extend(per_interval)

    # statics tail
    reduced.extend(range(int(system.l_s), int(system.r_s)))

    L = int(system.L)
    ni_max = max((len(b) for b in interior_blocks), default=0)
    if ni_max == 0:
        return None  # no interior columns at all: dense is the right tool
    # ragged blocks (hp-refined meshes, mixed-degree phases) pad at the
    # END with the phantom column L — the make_block_arrow_core convention
    interior = np.full((len(interior_blocks), ni_max), L, dtype=np.int32)
    for k, b in enumerate(interior_blocks):
        interior[k, : len(b)] = b
    reduced = np.array(sorted(reduced), dtype=np.int32)
    # sanity: real (non-phantom) entries partition all columns exactly once
    real = interior[interior < L]
    all_idx = np.concatenate([real, reduced])
    if len(np.unique(all_idx)) != L or len(all_idx) != L:
        return None
    return StructuredLayout(
        interior=interior, reduced=reduced, krylov_rank=krylov_rank, n_cols=L
    )


def pattern_violation(K, layout: StructuredLayout) -> jax.Array:
    """Largest |K| entry outside the assumed block-arrow pattern (oracle
    check: must be ~0 for the structured solve to be exact)."""
    K = jnp.asarray(K)
    L = K.shape[0]
    owner = jnp.full((L,), -1, dtype=jnp.int32)
    for b in range(layout.interior.shape[0]):
        owner = owner.at[layout.interior[b]].set(b)
    in_reduced = jnp.zeros((L,), dtype=bool).at[layout.reduced].set(True)
    ow_i = owner[:, None]
    ow_j = owner[None, :]
    allowed = (
        in_reduced[:, None]
        | in_reduced[None, :]
        | ((ow_i == ow_j) & (ow_i >= 0))
    )
    return jnp.max(jnp.where(allowed, 0.0, jnp.abs(K)))


# contraction ops in this module carry an EXPLICIT matmul precision: the
# block core also runs inside pallas_kkt's custom_vmap rules and inside
# user-called shard_map programs, both of which jax stages OUTSIDE the
# solver's default_matmul_precision("highest") context — on TPU the
# ambient DEFAULT is single-pass bf16, which destroys the
# cancellation-heavy Schur contraction (see the r4 notes in BENCH_NOTES)
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def _dot(a, b):
    """Vector dot at explicit HIGHEST precision (CG coefficients)."""
    return jnp.einsum("i,i->", a, b, precision=jax.lax.Precision.HIGHEST)


def _tree_sum(terms):
    """Pairwise summation (log-depth rounding instead of linear); matters
    for float32 accuracy of the unrolled factorizations below."""
    while len(terms) > 1:
        odd = [terms[-1]] if len(terms) % 2 else []
        terms = [
            terms[2 * j] + terms[2 * j + 1] for j in range(len(terms) // 2)
        ] + odd
    return terms[0]


@jax.jit
def _chol_unrolled(A):
    """Left-looking Cholesky of an ``(..., k, k)`` SPD batch, unrolled over
    the (small, static) ``k`` columns in pure elementwise ops.

    jit-wrapped: the unrolled body emits O(k^2) equations and the solver
    invokes it at many call sites (Newton step, refinement, SOC,
    feasibility fallback); the nested jit caches one trace per aval,
    cutting whole-solver trace time ~6x. XLA's call inliner flattens the
    boundary again at compile time, so the fused-VPU-kernel runtime
    behavior is unchanged.

    Exists because ``jnp.linalg.cholesky`` on TPU goes through XLA's
    expander whose internal algorithm (and effective numerics) varies with
    the batch shape: the identical per-lane problem factored at batch 512
    and 1024 produced *different* float32 Newton directions inside the
    solver's while_loop — wrong enough to stall convergence at large batch
    (observed on v5e, 2026-08; dense path unaffected). Unrolled elementwise
    arithmetic is batch-shape-invariant by construction and fuses into one
    VPU kernel. Negative pivots surface as nan (sqrt of a negative),
    matching ``jnp.linalg.cholesky``; the accumulation over previous
    columns is tree-summed (LAPACK-grade backward error, unlike a
    right-looking downdate chain)."""
    k = A.shape[-1]
    cols = []  # cols[j]: (..., k) = column j of L (rows < j are zero)
    for j in range(k):
        a_j = A[..., :, j]
        if j:
            a_j = a_j - _tree_sum(
                [cols[p] * cols[p][..., j][..., None] for p in range(j)]
            )
        d = jnp.sqrt(a_j[..., j])
        col = a_j / d[..., None]
        mask = np.arange(k) >= j  # static row mask: strict lower + diagonal
        cols.append(jnp.where(mask, col, 0.0))
    return jnp.stack(cols, axis=-1)


@functools.partial(jax.jit, static_argnames=("lower",))
def _tri_solve_unrolled(L, B, lower=True):
    """Solve ``L x = B`` (or ``L^T x = B`` when ``lower=False`` — pass the
    lower factor either way) for ``L (..., k, k)``, ``B (..., k, m)`` by
    substitution unrolled over the static ``k``. Same rationale as
    :func:`_chol_unrolled`: XLA's triangular-solve expander is
    batch-shape-dependent on TPU; this form is exact elementwise code.
    jit-wrapped for trace caching across the solver's many call sites
    (see :func:`_chol_unrolled`)."""
    k = L.shape[-1]
    rows = list(range(k)) if lower else list(range(k - 1, -1, -1))
    xs = [None] * k
    for i in rows:
        s = B[..., i, :]
        prev = [p for p in (range(i) if lower else range(i + 1, k))]
        if prev:
            coef = lambda p: (L[..., i, p] if lower else L[..., p, i])
            s = s - _tree_sum([coef(p)[..., None] * xs[p] for p in prev])
        xs[i] = s / L[..., i, i][..., None]
    return jnp.stack(xs, axis=-2)


# panel width for the blocked factorization/solves; matrices at or above
# _BLOCKED_MIN use the blocked forms (wide-mesh reduced Schur blocks:
# goddard nr=60, orbit nr=126 — the fully-unrolled trace at those sizes
# is O(k^2) scalar equations and took >1 h of XLA compile on chip)
_BLOCKED_PANEL = 8
_BLOCKED_MIN = 33

_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


@jax.jit
def _chol_blocked(A):
    """LAPACK-style LEFT-LOOKING blocked Cholesky of an ``(..., k, k)``
    SPD batch: per 8-wide panel, ONE accumulated matmul correction
    against all previously factored columns, an unrolled 8x8 panel
    factor, and an unrolled triangular panel solve. Trace size is
    O(k/8) matmuls + O(8^2) scalar ops — compile-light where
    :func:`_chol_unrolled`'s O(k^2) unrolled equations blow up XLA
    compile time for the large reduced blocks of wide meshes — while the
    flops ride the MXU at explicit HIGHEST precision and the numerics
    stay batch-shape-invariant (no XLA cholesky expander; the matmul
    correction is a single fused f32 accumulation, the LAPACK blocked
    form's stability). Negative pivots surface as nan, matching the
    unrolled form."""
    k = A.shape[-1]
    if k <= _BLOCKED_PANEL:
        return _chol_unrolled(A)
    P = _BLOCKED_PANEL
    lead = A.shape[:-2]
    col_blocks = []  # each (..., k, w) with zeros above its diagonal block
    for p0 in range(0, k, P):
        p1 = min(p0 + P, k)
        if p0:
            Lp = jnp.concatenate(col_blocks, axis=-1)  # (..., k, p0)
            C = A[..., p0:, p0:p1] - _mm(
                Lp[..., p0:, :], jnp.swapaxes(Lp[..., p0:p1, :], -1, -2)
            )
        else:
            C = A[..., p0:, p0:p1]
        Ld = _chol_unrolled(C[..., : p1 - p0, :])  # (..., w, w)
        parts = [jnp.zeros(lead + (p0, p1 - p0), A.dtype), Ld]
        if p1 < k:
            # X Ld^T = T  <=>  Ld X^T = T^T
            Xt = _tri_solve_unrolled(
                Ld, jnp.swapaxes(C[..., p1 - p0 :, :], -1, -2), lower=True
            )
            parts.append(jnp.swapaxes(Xt, -1, -2))
        col_blocks.append(jnp.concatenate(parts, axis=-2))
    return jnp.concatenate(col_blocks, axis=-1)


@functools.partial(jax.jit, static_argnames=("lower",))
def _tri_solve_blocked(L, B, lower=True):
    """Blocked substitution companion of :func:`_chol_blocked`: solve
    ``L x = B`` (``lower=True``) or ``L^T x = B`` (``lower=False``, pass
    the lower factor) per 8-row panel — one accumulated matmul against
    already-solved panels plus an unrolled 8x8 solve."""
    k = L.shape[-1]
    if k <= _BLOCKED_PANEL:
        return _tri_solve_unrolled(L, B, lower=lower)
    P = _BLOCKED_PANEL
    bounds = [(p0, min(p0 + P, k)) for p0 in range(0, k, P)]
    xs = []
    if lower:
        for p0, p1 in bounds:
            rhs = B[..., p0:p1, :]
            if p0:
                X = jnp.concatenate(xs, axis=-2)  # (..., p0, m)
                rhs = rhs - _mm(L[..., p0:p1, :p0], X)
            xs.append(
                _tri_solve_unrolled(L[..., p0:p1, p0:p1], rhs, lower=True)
            )
        return jnp.concatenate(xs, axis=-2)
    for p0, p1 in reversed(bounds):
        rhs = B[..., p0:p1, :]
        if xs:
            X = jnp.concatenate(xs, axis=-2)  # (..., k - p1, m)
            rhs = rhs - _mm(
                jnp.swapaxes(L[..., p1:, p0:p1], -1, -2), X
            )
        xs.insert(
            0, _tri_solve_unrolled(L[..., p0:p1, p0:p1], rhs, lower=False)
        )
    return jnp.concatenate(xs, axis=-2)


def make_block_arrow_core(interior, reduced, n: int, method: str = "auto"):
    """Factor/apply for a block-arrow SPD system given directly in block
    storage ``(K_ii, K_ir, K_rr)`` — the production form fed by
    ``transcription.kkt.make_block_kkt`` (nothing (L, L)-shaped exists).

    ``interior`` may be padded with the phantom column ``n`` (JAX drops
    out-of-bounds scatter updates; gathers read a zero-extended copy), so
    ragged multi-phase interiors are supported. Padded slots must carry
    1.0 on the assembled diagonal.

    - ``factor(K_ii, K_ir, K_rr) -> (factors, pivot_min, pivot_max)``:
      one batched Cholesky eliminates every interval interior in
      parallel, then the small border+arrow Schur complement is factored
      densely. Per-level Jacobi equilibration keeps float32 honest; the
      pivot extrema feed the interior-point inertia loop.
    - ``apply(factors, rhs) -> x`` back-solves any right-hand side; the
      factors are a flat pytree so they thread through ``lax.while_loop``
      state and one factorization serves the Newton step, its iterative
      refinement, second-order corrections, and the feasibility fallback.
    """
    # numpy (not jnp.asarray): this factory may be invoked inside an active
    # trace (the Pallas path builds its per-lane fallback at trace time),
    # where jnp.asarray returns a tracer that would leak into inner jaxprs
    # as an unloweable constant. numpy indices embed as real literals.
    interior = np.asarray(interior)  # (nb, ni), possibly padded with n
    reduced = np.asarray(reduced)  # (nr,)

    # "unrolled" avoids XLA's cholesky/triangular_solve expanders, whose
    # TPU numerics proved batch-shape-dependent (see _chol_unrolled); CPU
    # keeps the LAPACK-backed lax ops, which are both exact and faster
    if method == "auto":
        method = "lax" if jax.default_backend() == "cpu" else "unrolled"
    if method not in ("lax", "unrolled"):
        # a silent fallthrough to "lax" would re-expose the large-batch TPU
        # expander regression on a mere option typo
        raise ValueError(
            f"unknown block_core method {method!r}; use 'auto', 'lax' or "
            "'unrolled'"
        )
    use_unrolled = method == "unrolled"

    def _chol(A):
        if use_unrolled:
            # large blocks (wide-mesh reduced Schur) use the blocked form:
            # same batch-shape-invariant numerics, O(k/8) compile size
            if A.shape[-1] >= _BLOCKED_MIN:
                return _chol_blocked(A)
            return _chol_unrolled(A)
        return jnp.linalg.cholesky(A)

    def _tri(L, B, lower):
        if use_unrolled:
            if L.shape[-1] >= _BLOCKED_MIN:
                return _tri_solve_blocked(L, B, lower=lower)
            return _tri_solve_unrolled(L, B, lower=lower)
        Lm = L if lower else jnp.swapaxes(L, -1, -2)
        return jax.scipy.linalg.solve_triangular(Lm, B, lower=lower)

    def _blk_solve(L_i, sc_i, B):
        Bs = B * sc_i[:, :, None]
        t = _tri(L_i, Bs, lower=True)
        X = _tri(L_i, t, lower=False)
        return X * sc_i[:, :, None]

    def factor(K_ii, K_ir, K_rr):
        dtype = K_ii.dtype
        sc_i = jax.lax.rsqrt(
            jnp.maximum(jnp.diagonal(K_ii, axis1=1, axis2=2), 1e-30)
        )  # (nb, ni)
        K_ii_t = K_ii * sc_i[:, :, None] * sc_i[:, None, :]
        L_i = _chol(K_ii_t)
        diag_i = jnp.diagonal(L_i, axis1=1, axis2=2)
        L_i_safe = jnp.where(
            jnp.isfinite(L_i), L_i, jnp.eye(L_i.shape[-1], dtype=dtype)
        )
        X_ir = _blk_solve(L_i_safe, sc_i, K_ir)  # K_ii^{-1} K_ir

        S = K_rr - _einsum("bik,bil->kl", K_ir, X_ir)
        sc_r = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(S), 1e-30))
        S_t = S * sc_r[:, None] * sc_r[None, :]
        L_r = _chol(S_t)
        diag_r = jnp.diagonal(L_r)
        L_r_safe = jnp.where(
            jnp.isfinite(L_r), L_r, jnp.eye(L_r.shape[-1], dtype=dtype)
        )

        pivots = jnp.concatenate([diag_i.ravel(), diag_r])
        finite = jnp.all(jnp.isfinite(pivots))
        p_min = jnp.where(finite, jnp.min(pivots), jnp.nan)
        p_max = jnp.where(finite, jnp.max(pivots), jnp.nan)
        factors = (L_i_safe, sc_i, X_ir, K_ir, L_r_safe, sc_r)
        return factors, p_min, p_max

    def apply(factors, rhs):
        L_i, sc_i, X_ir, K_ir, L_r, sc_r = factors
        rhs_ext = jnp.concatenate([rhs, jnp.zeros((1,), rhs.dtype)])
        b_i = rhs_ext[interior]  # (nb, ni); padded slots read 0
        b_r = rhs[reduced]  # (nr,)

        x_bi = _blk_solve(L_i, sc_i, b_i[:, :, None])[:, :, 0]

        r_red = b_r - _einsum("bik,bi->k", K_ir, x_bi)
        t = _tri(L_r, (sc_r * r_red)[:, None], lower=True)
        x_r = sc_r * _tri(L_r, t, lower=False)[:, 0]

        x_i = x_bi - _einsum("bik,k->bi", X_ir, x_r)
        x = jnp.zeros_like(rhs)
        x = x.at[interior.ravel()].set(x_i.ravel())  # phantom index dropped
        x = x.at[reduced].set(x_r)
        return x

    return factor, apply


def make_pcg_apply(apply, n_steps: int):
    """Pattern-preconditioned CG with an EXTERNAL matvec: solves
    ``K x = rhs`` where ``K`` differs from the factored pattern by a
    rank-r term and ``matvec`` applies the true K (matrix-free in the
    block path). r + 1 steps remove a rank-r discrepancy exactly; callers
    pass ``n_steps = r + 2`` for float headroom."""

    def apply_cg(factors, rhs, matvec):
        x = apply(factors, rhs)
        r = rhs - matvec(x)
        z = apply(factors, r)
        p = z
        rz = _dot(r, z)

        def body(_, carry):
            x, r, p, rz = carry
            Kp = matvec(p)
            denom = _dot(p, Kp)
            alpha = jnp.where(jnp.abs(denom) > 1e-30, rz / denom, 0.0)
            x = x + alpha * p
            r = r - alpha * Kp
            z = apply(factors, r)
            rz_new = _dot(r, z)
            beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
            p = z + beta * p
            return x, r, p, rz_new

        x, _, _, _ = jax.lax.fori_loop(0, n_steps, body, (x, r, p, rz))
        return x

    return apply_cg


def make_structured_factor(layout: StructuredLayout):
    """Dense-K entry point: gather the block-arrow pattern out of a dense
    condensed matrix and factor it with :func:`make_block_arrow_core`.
    Retained for ``kkt_solver="structured"`` (oracle/debug path); the
    production block path assembles the blocks directly and never forms
    ``K``."""
    interior = jnp.asarray(layout.interior)  # (nb, ni)
    reduced = jnp.asarray(layout.reduced)  # (nr,)
    interior_np = np.asarray(layout.interior)
    n = int(layout.n_cols) or int(
        layout.interior.size + layout.reduced.size
    )
    pad_mask = interior_np >= n  # phantom slots of ragged layouts
    has_pad = bool(pad_mask.any())
    core_factor, core_apply = make_block_arrow_core(
        layout.interior, layout.reduced, n
    )

    def factor(K):
        if has_pad:
            # phantom gathers must read 0 (a raw gather would CLAMP the
            # out-of-range index to the last real column); padded diagonal
            # slots then get the unit pivot the core expects
            K = jnp.pad(K, ((0, 1), (0, 1)))
        K_ii = K[interior[:, :, None], interior[:, None, :]]  # (nb, ni, ni)
        K_ir = K[interior[:, :, None], reduced[None, None, :]]  # (nb, ni, nr)
        K_rr = K[reduced[:, None], reduced[None, :]]  # (nr, nr)
        if has_pad:
            K = K[:-1, :-1]
            K_ii = K_ii + jnp.eye(K_ii.shape[-1], dtype=K.dtype) * jnp.asarray(
                pad_mask, K.dtype
            )[:, :, None]
        factors, p_min, p_max = core_factor(K_ii, K_ir, K_rr)
        return factors + (K,), p_min, p_max

    def apply(factors, rhs):
        """One pattern solve (exact when krylov_rank == 0)."""
        return core_apply(factors[:-1], rhs)

    if layout.krylov_rank == 0:
        return factor, apply

    # pattern-preconditioned conjugate gradients: the full K differs from
    # its block-arrow pattern by a rank-r term, and CG with the pattern
    # factorization as preconditioner removes a rank-r discrepancy in
    # r + 1 steps (we run r + 2 for float headroom)
    apply_cg = make_pcg_apply(apply, int(layout.krylov_rank) + 2)

    def apply_pcg(factors, rhs):
        K = factors[-1]
        return apply_cg(factors, rhs, lambda v: K @ v)

    return factor, apply_pcg


def make_structured_solve(layout: StructuredLayout):
    """One-shot ``solve(K, rhs) -> (x, pivot_min, pivot_max)`` convenience
    wrapper over :func:`make_structured_factor`."""
    factor, apply = make_structured_factor(layout)

    def solve(K, rhs):
        factors, p_min, p_max = factor(K)
        return apply(factors, rhs), p_min, p_max

    return solve


def make_sharded_structured_solve(
    layout: StructuredLayout, mesh, axis: str, method: str = "auto"
):
    """Time-axis-sharded structured solve over a device mesh.

    The interval-interior blocks are independent, so they shard over the
    ``axis`` of ``mesh``: each device eliminates its own subintervals (one
    small batched Cholesky), the reduced Schur contributions are combined
    with a single ``psum`` (the only cross-device traffic — an
    ``n_red x n_red`` matrix plus a vector riding ICI), the small border+
    arrow system is solved replicated, and back-substitution is local.

    This is the KKT-factorization analog of sequence parallelism (SURVEY
    §5): the "time" axis of one huge-mesh instance is spread over chips.
    ``K`` and ``rhs`` enter replicated; the number of interior blocks must
    be divisible by the axis size. Exact for ``krylov_rank == 0`` layouts.
    """
    from functools import partial

    import numpy as np_
    from pockit_tpu.parallel._compat import shard_map
    from jax.sharding import PartitionSpec as P

    nb, ni = layout.interior.shape
    n_dev = mesh.shape[axis]
    if nb % n_dev:
        raise ValueError(
            f"{nb} interior blocks not divisible by {n_dev} devices"
        )
    if layout.krylov_rank:
        raise ValueError(
            "sharded structured solve requires an exact block-arrow pattern"
        )
    interior_sh = np_.asarray(layout.interior).reshape(n_dev, nb // n_dev, ni)
    reduced = jnp.asarray(layout.reduced)
    L_cols = int(layout.n_cols) or int(
        layout.interior.size + layout.reduced.size
    )
    has_pad = bool((np_.asarray(layout.interior) >= L_cols).any())

    # same expander-avoidance policy as make_block_arrow_core: on TPU the
    # lax cholesky/triangular_solve numerics are batch-shape-dependent
    if method == "auto":
        method = "lax" if jax.default_backend() == "cpu" else "unrolled"
    if method not in ("lax", "unrolled"):
        raise ValueError(
            f"unknown method {method!r}; use 'auto', 'lax' or 'unrolled'"
        )
    use_unrolled = method == "unrolled"

    def _chol(A):
        if use_unrolled:
            # large blocks (wide-mesh reduced Schur) use the blocked form:
            # same batch-shape-invariant numerics, O(k/8) compile size
            if A.shape[-1] >= _BLOCKED_MIN:
                return _chol_blocked(A)
            return _chol_unrolled(A)
        return jnp.linalg.cholesky(A)

    def _tri(L, B, lower):
        if use_unrolled:
            if L.shape[-1] >= _BLOCKED_MIN:
                return _tri_solve_blocked(L, B, lower=lower)
            return _tri_solve_unrolled(L, B, lower=lower)
        Lm = L if lower else jnp.swapaxes(L, -1, -2)
        return jax.scipy.linalg.solve_triangular(Lm, B, lower=lower)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(),
        check_rep=False,
    )
    def _solve(my_interior, K, rhs):
        my_interior = my_interior[0]  # (nb_local, ni)
        K_ii = K[my_interior[:, :, None], my_interior[:, None, :]]
        K_ir = K[my_interior[:, :, None], reduced[None, None, :]]
        b_i = rhs[my_interior]
        if has_pad:
            # K/rhs arrive zero-extended by one phantom row/col (see
            # ``solve``); padded slots need the unit pivot before
            # equilibration (a zero diagonal would nan the Cholesky)
            pad = (my_interior >= L_cols).astype(K.dtype)
            K_ii = K_ii + jnp.eye(ni, dtype=K.dtype) * pad[:, :, None]

        sc_i = jax.lax.rsqrt(
            jnp.maximum(jnp.diagonal(K_ii, axis1=1, axis2=2), 1e-30)
        )
        L_i = _chol(K_ii * sc_i[:, :, None] * sc_i[:, None, :])

        def blk_solve(B):
            Bs = B * sc_i[:, :, None]
            t = _tri(L_i, Bs, lower=True)
            X = _tri(L_i, t, lower=False)
            return X * sc_i[:, :, None]

        X_ir = blk_solve(K_ir)
        x_bi = blk_solve(b_i[:, :, None])[:, :, 0]

        # partial Schur contributions; ONE psum pair crosses devices
        S_part = _einsum("bik,bil->kl", K_ir, X_ir)
        r_part = _einsum("bik,bi->k", K_ir, x_bi)
        S = K[reduced[:, None], reduced[None, :]] - jax.lax.psum(S_part, axis)
        r_red = rhs[reduced] - jax.lax.psum(r_part, axis)

        sc_r = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(S), 1e-30))
        L_r = _chol(S * sc_r[:, None] * sc_r[None, :])
        t = _tri(L_r, (sc_r * r_red)[:, None], lower=True)
        x_r = sc_r * _tri(L_r, t, lower=False)[:, 0]

        x_i = x_bi - _einsum("bik,k->bi", X_ir, x_r)
        x_local = jnp.zeros_like(rhs).at[my_interior.ravel()].set(x_i.ravel())
        # sum local interior pieces; add the (replicated) reduced part once
        x = jax.lax.psum(x_local, axis) + jnp.zeros_like(rhs).at[reduced].set(x_r)
        return x

    def solve(K, rhs):
        if has_pad:
            # zero-extend so phantom gathers read 0 instead of clamping;
            # phantom scatter writes land in the extra slot and are sliced
            K = jnp.pad(K, ((0, 1), (0, 1)))
            rhs = jnp.pad(rhs, ((0, 1),))
            return _solve(jnp.asarray(interior_sh), K, rhs)[:-1]
        return _solve(jnp.asarray(interior_sh), K, rhs)

    return solve
