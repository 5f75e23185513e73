"""Fused block-arrow KKT factorization as Pallas TPU kernels.

The XLA path (``structured.make_block_arrow_core``) factors the condensed
interior-point matrix with ``jnp.linalg.cholesky`` / ``solve_triangular``
on (B, nb, ni, ni) batches of tiny blocks. On TPU those lower to many
small kernels with HBM round-trips between every stage. Here the whole
factorization — equilibration, per-interval Cholesky, the triangular
solves for ``K_ii^{-1} K_ir``, the Schur accumulation, and the reduced
Cholesky — runs as two fused kernels per 128-lane batch tile, with the
**batch in the vector-lane dimension**: every Cholesky/substitution step
is an elementwise VPU op over 128 instances at once, and each input is
read from HBM exactly once.

Layout convention: factor arrays carry a TRAILING lane axis — size 1 in
the per-lane world (single solves), size B inside a ``vmap``. The
``jax.custom_batching.custom_vmap`` wrappers exploit this: the batched
rule returns batch-last factors *marked unbatched*, so the per-lane
solver code (written for ``vmap``) threads them as opaque closures into
the apply wrapper, which swaps in the batched kernels. Factors must not
be carried through a ``lax.while_loop`` under ``vmap`` (batching
promotion would broadcast them); the inertia-escalation loop therefore
lives INSIDE :func:`make_newton_dir`'s batched rule.

Reference analog: MUMPS' multifrontal factorization inside IPOPT
(``/root/reference/pockit/optimizer/ipopt.py:41-53``) — here the
"fronts" are the interval interiors, eliminated in data parallel across
both intervals and instances.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pockit_tpu.solver.structured import _tree_sum, make_block_arrow_core

_BT = 128  # batch lanes per tile

# dev-only ablation flags for on-chip escalation debugging: drop one
# component of the batched acceptance test (never set in production)
import os as _os

# every einsum in this module carries an EXPLICIT precision: the one-hot
# placement contractions and the refinement matvec run inside
# custom_vmap batching rules, which jax stages OUTSIDE the solver's
# ``jax.default_matmul_precision("highest")`` context — relying on the
# ambient config silently compiled them at DEFAULT (single-pass bf16 on
# TPU), truncating 1e5-scale rhs entries and poisoning every Newton
# direction on chip while CPU (exact-f32 DEFAULT) stayed green. Found by
# lowering the solver and counting `precision = [DEFAULT` dots (r4).
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# in-kernel building blocks (all arrays (rows, [cols,] BT); batch in lanes)
# ---------------------------------------------------------------------------


def _fwd_sub(L, B):
    """Solve L t = B for lower-triangular L (n, n, BT), B (n, m, BT).

    Dot (left-looking) form with tree-summed inner products — the
    sequential-downdate form rounds every trailing row n times and was
    measured ~100x less backward-stable than LAPACK on the equilibrated
    KKT triangles (the rhs spans the 1/delta_c dynamic range)."""
    n = L.shape[0]
    ts = []
    for k in range(n):
        v = B[k]
        if k:
            v = v - _tree_sum(
                [ts[j] * L[k, j, :][None, :] for j in range(k)]
            )
        ts.append(v / L[k, k, :][None, :])
    return jnp.stack(ts, axis=0)


def _bwd_sub(L, B):
    """Solve L^T x = B for lower-triangular L (n, n, BT), B (n, m, BT).
    Dot form with tree sums (see :func:`_fwd_sub`)."""
    n = L.shape[0]
    xs = [None] * n
    for k in reversed(range(n)):
        v = B[k]
        if k < n - 1:
            v = v - _tree_sum(
                [xs[j] * L[j, k, :][None, :] for j in range(k + 1, n)]
            )
        xs[k] = v / L[k, k, :][None, :]
    return jnp.stack(xs, axis=0)


def _blk_solve_lanes(L, sc, B):
    """(L L^T)-solve with the equilibration folded in: returns
    sc * solve(sc * B)."""
    t = _fwd_sub(L, B * sc[:, None, :])
    return _bwd_sub(L, t) * sc[:, None, :]


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def scoped_vmem_estimate(interior, reduced) -> int:
    """Rough upper bound (bytes) on the factor kernel's scoped-VMEM
    footprint for one lane tile: block windows (b-varying ones double-
    buffered by Mosaic's pipeline) plus an empirical cubic stack term for
    the unrolled in-kernel Cholesky temporaries. Calibrated on v5e
    (16 MB scoped limit): the flagship LQR structure (ni_p=16, nr_p=32)
    compiles and runs; (ni_p=24, nr_p=40) fails at a reported 19.25M.
    The model intentionally over-predicts — denying Pallas costs
    performance (XLA unrolled fallback), never correctness."""
    interior = np.asarray(interior)
    ni_p = _ceil_to(interior.shape[1], 8)
    nr_p = _ceil_to(len(np.asarray(reduced)), 8)
    mx = max(ni_p, nr_p)
    win = 4 * _BT * (
        2 * (2 * ni_p * ni_p + 2 * ni_p * nr_p + 2 * ni_p)
        + 3 * nr_p * nr_p
        + mx * mx
        + 8 * mx
    )
    stack = 256 * (ni_p**3 + nr_p**3)
    return win + stack


# conservative budget under the 16 MB scoped-vmem limit
_SCOPED_VMEM_BUDGET = 15_500_000


def fits_vmem(interior, reduced) -> bool:
    """Whether the fused factor kernel is expected to fit the TPU's
    scoped-VMEM limit for this block structure (see
    :func:`scoped_vmem_estimate`). The solver's ``kkt_solver="auto"``
    consults this to fall back to the XLA unrolled block core for large
    reduced blocks (wide meshes / many linked phases)."""
    return scoped_vmem_estimate(interior, reduced) <= _SCOPED_VMEM_BUDGET


def _eye_lanes(n, dtype):
    """(n, n, 1) identity mask built with iota (captured numpy constants
    are illegal inside a pallas kernel)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    return (r == c).astype(dtype)


def _factor_kernel(
    nb, ni_p, nr_p, ni_real, nr_real, pivot_rtol, delta_floor, attempts,
    kii_ref, kir_ref, krr_ref, dl_ref,
    li_ref, sci_ref, xir_ref, lr_ref, scr_ref, piv_ref, dblk_ref,
    s_scr, piv_scr, du_scr, lb_scr, scb_scr, pb_scr, db_scr, okb_scr,
):
    """One lane-tile of the block-arrow factorization with BLOCK-LOCAL
    inertia escalation: a block whose equilibrated Cholesky fails the
    per-lane pivot test is re-factored IN VMEM at a bumped per-lane delta
    (``attempts - 1`` retries, x10 ladder from ``delta_floor``), so an
    escalation costs microseconds of tile-local recompute instead of a
    full-batch HBM factorization round. Per-block deltas are a valid PSD
    inertia perturbation (uniform delta*I is not required for a descent
    direction); the max delta actually used is reported per lane in
    ``piv_ref[2]`` and the solver's saddle-point refinement targets the
    true system anyway. The base delta arrives per lane in ``dl_ref``
    (the kernel adds it to the diagonal — the (B, nb, ni, ni) delta
    materialization that preceded the kernel is gone)."""
    b = pl.program_id(1)
    dtype = kii_ref.dtype

    @pl.when(b == 0)
    def _init():
        BT = kii_ref.shape[-1]
        piv_scr[0, :] = jnp.full((BT,), jnp.inf, dtype)
        piv_scr[1, :] = jnp.full((BT,), -jnp.inf, dtype)
        du_scr[0, :] = dl_ref[0, :]
        okb_scr[0, :] = jnp.ones((BT,), dtype)

    def _chol_into(col_fn, diag_fn, nn, n_real, d):
        """Unrolled LEFT-LOOKING Cholesky with Jacobi equilibration of an
        (nn, nn, BT) SPD batch, batch in lanes. Left-looking (column k
        corrected by one tree-summed dot over previous columns) rather
        than right-looking sequential downdates: the downdate chain
        rounds every trailing entry n times and was measured ~14x worse
        in backward error than LAPACK on near-singular Schur complements
        — enough to stall the float32 interior point. Negative pivots
        surface as nan (sqrt of a negative); padded rows (>= n_real) are
        excluded from the pivot extrema.

        REF-WRITING: columns are written into ``lb_scr`` and previous
        columns read BACK from it, so the factorization holds only one
        column of temporaries on the Mosaic stack (a value-returning form
        kept every column live and blew the 16 MB scoped-vmem limit once
        the retry body duplicated it). ``col_fn(k, d)``/``diag_fn(d)``
        yield column k / the diagonal of A + d*I so no (nn, nn, BT) copy
        of A is materialized either. Leaves (L, sc) in lb/scb and
        (dmin, dmax) in pb."""
        diag = diag_fn(d)  # (nn, BT)
        sc = jax.lax.rsqrt(jnp.maximum(diag, 1e-30))
        scb_scr[:nn, :] = sc
        BT = diag.shape[-1]
        dmin = jnp.full((BT,), jnp.inf, dtype)
        dmax = jnp.full((BT,), -jnp.inf, dtype)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nn, 1), 0)
        for k in range(nn):
            v = col_fn(k, d) * sc * sc[k][None, :]  # (nn, BT)
            if k:
                v = v - _tree_sum(
                    [
                        lb_scr[:nn, j, :] * lb_scr[k, j, :][None, :]
                        for j in range(k)
                    ]
                )
            dk = jnp.sqrt(v[k, :])
            if k < n_real:
                dmin = jnp.minimum(dmin, dk)
                dmax = jnp.maximum(dmax, dk)
            inv = 1.0 / dk
            mask = (rows > k).astype(dtype)
            row_k = (rows == k).astype(dtype)
            lb_scr[:nn, k, :] = v * inv[None, :] * mask + row_k * dk[None, :]
        pb_scr[0, :] = dmin
        pb_scr[1, :] = dmax

    def _attempted_chol(col_fn, diag_fn, nn, n_real, base_d):
        """Factor A + d*I with block-local retries: failing lanes bump
        their d and the WHOLE tile re-factors in VMEM (lanes whose d is
        unchanged recompute identical values, so no select-merge is
        needed). Leaves the accepted (L, sc, dmin, dmax, d) in the
        lb/scb/pb/db scratch (sliced to nn)."""
        _chol_into(col_fn, diag_fn, nn, n_real, base_d)
        db_scr[0, :] = base_d

        # retries in a fori_loop: the body's stack is allocated once
        def _retry_body(_a, carry):
            dmin_c = pb_scr[0, :]
            dmax_c = pb_scr[1, :]
            need = ~(
                jnp.isfinite(dmin_c)
                & jnp.isfinite(dmax_c)
                & (dmin_c > pivot_rtol * dmax_c)
            )

            @pl.when(jnp.any(need))
            def _retry():
                d_cur = db_scr[0, :]
                d_new = jnp.where(
                    need,
                    jnp.where(
                        d_cur < delta_floor, delta_floor, d_cur * 10.0
                    ),
                    d_cur,
                )
                _chol_into(col_fn, diag_fn, nn, n_real, d_new)
                db_scr[0, :] = d_new

            return carry

        if attempts > 1:
            jax.lax.fori_loop(0, attempts - 1, _retry_body, 0)

    @pl.when(b < nb)
    def _block():
        base_d = dl_ref[0, :]
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (ni_p, 1), 0)

        # column k / diagonal of K_ii + d*I read straight off the input
        # ref — no (ni_p, ni_p, BT) value copy on the Mosaic stack
        def col_ii(k, d):
            onk = (rows_i == k).astype(dtype)
            return kii_ref[0, :, k, :] + onk * d[None, :]

        def diag_ii(d):
            return (
                jnp.stack([kii_ref[0, k, k, :] for k in range(ni_p)])
                + d[None, :]
            )

        _attempted_chol(col_ii, diag_ii, ni_p, ni_real, base_d)
        # BLOCK-LOCAL acceptance: each block's pivot ratio is judged
        # against its own extrema at its own final delta (the global
        # cross-block ratio test is meaningless once blocks sit at
        # different retry levels); the lane passes iff every block does
        dmin_b = pb_scr[0, :]
        dmax_b = pb_scr[1, :]
        ok_b = (
            jnp.isfinite(dmin_b)
            & jnp.isfinite(dmax_b)
            & (dmin_b > pivot_rtol * dmax_b)
        )
        okb_scr[0, :] = okb_scr[0, :] * ok_b.astype(dtype)
        dblk_ref[0, 0, :] = db_scr[0, :]
        L = lb_scr[:ni_p, :ni_p, :]
        sc = scb_scr[:ni_p, :]
        t = _fwd_sub(L, kir_ref[0] * sc[:, None, :])  # L^{-1} sc K_ir
        X = _bwd_sub(L, t) * sc[:, None, :]  # K_ii^{-1} K_ir
        li_ref[0] = L
        sci_ref[0] = sc
        xir_ref[0] = X

        @pl.when(b == 0)
        def _schur_init():
            eye_r = _eye_lanes(nr_p, dtype)
            s_scr[:] = krr_ref[:] + eye_r * base_d[None, None, :]

        # Schur accumulation in GRAM (syrk) form: S -= t^T t with the
        # half-solve t, NOT K_ir^T X. Mathematically identical, but the
        # Gram form's float32 error is a consistent PSD perturbation of S
        # while the K_ir^T X form injects unstructured noise amplified by
        # the 1/delta_c-scale K_ir entries — measured on the LQR gate:
        # reduced-solve relerr 0.085 (syrk, = XLA einsum path) vs 2.7
        # (rank-1 form), the difference between the f32 interior point
        # converging in 2 iterations and stalling. Tree summation for the
        # cancellation-heavy contraction.
        # NOTE two-step indexing (t[i] then broadcast): mixing an int index
        # with None (t[i, :, None, :]) routes through JAX's general gather
        # lowering, and Mosaic cannot lower >2D gathers inside a kernel.
        # The Gram sum runs ROW BY ROW (row r of S gets a full ni_p-term
        # tree sum of (nr_p, BT) slabs, written straight into the VMEM
        # scratch) — materializing outer products of S puts O(chunk *
        # nr_p^2 * BT) on the Mosaic stack and blew the 16 MB scoped-vmem
        # limit at nr_p=40; the row form peaks at ni_p * nr_p * BT live
        # and its per-entry tree is the FULL ni_p-leaf tree (better
        # summation error than any chunked variant)
        for r in range(nr_p):
            P = [t[i] * t[i][r, :][None, :] for i in range(ni_p)]
            s_scr[r, :, :] = s_scr[r, :, :] - _tree_sum(P)
        piv_scr[0, :] = jnp.minimum(piv_scr[0, :], pb_scr[0, :])
        piv_scr[1, :] = jnp.maximum(piv_scr[1, :], pb_scr[1, :])
        du_scr[0, :] = jnp.maximum(du_scr[0, :], db_scr[0, :])

    @pl.when(b == nb)
    def _schur():
        # reduced block already carries the base delta (added at Schur
        # init); retries add the EXTRA bump on top of the accumulated
        # Schur complement. Columns/diagonal read straight off the VMEM
        # scratch accumulator — no (nr_p, nr_p, BT) stack copy.
        rows_r = jax.lax.broadcasted_iota(jnp.int32, (nr_p, 1), 0)

        def col_s(k, d):
            onk = (rows_r == k).astype(dtype)
            return s_scr[:, k, :] + onk * d[None, :]

        def diag_s(d):
            return (
                jnp.stack([s_scr[k, k, :] for k in range(nr_p)])
                + d[None, :]
            )

        zero_d = jnp.zeros((kii_ref.shape[-1],), dtype)
        _attempted_chol(col_s, diag_s, nr_p, nr_real, zero_d)
        lr_ref[:] = lb_scr[:nr_p, :nr_p, :]
        scr_ref[:] = scb_scr[:nr_p, :]
        # block-local acceptance for the reduced block (cf. _block)
        dmin_r = pb_scr[0, :]
        dmax_r = pb_scr[1, :]
        ok_r = (
            jnp.isfinite(dmin_r)
            & jnp.isfinite(dmax_r)
            & (dmin_r > pivot_rtol * dmax_r)
        )
        base_d = dl_ref[0, :]
        # reduced-block delta is base (added at Schur init) + retry extra
        dblk_ref[0, 0, :] = base_d + db_scr[0, :]
        pmin = jnp.minimum(piv_scr[0, :], pb_scr[0, :])
        pmax = jnp.maximum(piv_scr[1, :], pb_scr[1, :])
        finite = jnp.isfinite(pmin) & jnp.isfinite(pmax)
        nan = jnp.full_like(pmin, jnp.nan)
        piv_ref[0, :] = jnp.where(finite, pmin, nan)
        piv_ref[1, :] = jnp.where(finite, pmax, nan)
        piv_ref[2, :] = jnp.maximum(du_scr[0, :], base_d + db_scr[0, :])
        piv_ref[3, :] = okb_scr[0, :] * ok_r.astype(dtype)


def _apply_down_kernel(
    li_ref, sci_ref, kir_ref, bi_ref, br_ref,
    xbi_ref, rred_ref,
):
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        rred_ref[:] = br_ref[:]

    x = _blk_solve_lanes(li_ref[0], sci_ref[0], bi_ref[0][:, None, :])
    xbi_ref[0] = x[:, 0, :]
    # r_red -= K_ir^T x_bi
    K_ir = kir_ref[0]
    contrib = jnp.sum(K_ir * x[:, 0, :][:, None, :], axis=0)  # (nr_p, BT)
    rred_ref[:] = rred_ref[:] - contrib


def _apply_up_kernel(lr_ref, scr_ref, rred_ref, xir_ref, xbi_ref, xr_ref, xi_ref):
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _schur_solve():
        xr = _blk_solve_lanes(lr_ref[:], scr_ref[:], rred_ref[:][:, None, :])
        xr_ref[:] = xr[:, 0, :]

    # x_i = x_bi - X_ir x_r
    X = xir_ref[0]  # (ni_p, nr_p, BT)
    xi_ref[0] = xbi_ref[0] - jnp.sum(X * xr_ref[:][None, :, :], axis=1)


# ---------------------------------------------------------------------------
# batched wrappers (pallas_call plumbing; arrays arrive batch-LEADING)
# ---------------------------------------------------------------------------


class PallasCore(NamedTuple):
    """Batched factor/apply over the padded batch-last layout."""

    factor: callable  # (K_ii, K_ir, K_rr) batch-last padded -> fac, pmin, pmax
    apply: callable  # (fac, rhs (B, n)) -> x (B, n)
    pad_move: callable  # (K_ii, K_ir, K_rr) batch-leading -> batch-last padded
    ni_p: int
    nr_p: int


def _make_pallas_core(
    interior,
    reduced,
    n,
    interpret=False,
    pivot_rtol=None,
    delta_w_floor=None,
    # block-local in-kernel retry ladder depth: a block failing its own
    # pivot-ratio test re-factors in VMEM at a bumped per-block delta up
    # to attempts-1 times before the lane buys a full-batch escalation
    # round. Production-safe since r5: acceptance is block-local and the
    # refinement matvec applies the per-block levels (d_blk output).
    attempts=1,
):
    interior = np.asarray(interior)
    reduced = np.asarray(reduced)
    nb, ni = interior.shape
    nr = len(reduced)
    ni_p, nr_p = _ceil_to(ni, 8), _ceil_to(nr, 8)
    eps32 = float(np.finfo(np.float32).eps)
    if pivot_rtol is None:
        pivot_rtol = 2.0 * float(np.sqrt(eps32))
    if delta_w_floor is None:
        delta_w_floor = 10.0 * eps32

    # numpy, not jnp.asarray: this factory may run inside an active trace
    # (ipm builds it per-dtype at trace time); jnp.asarray there returns a
    # tracer that leaks into inner jaxprs as an unloweable constant
    interior_j = np.asarray(interior)
    reduced_j = np.asarray(reduced)

    # one-hot placement operators: the gather/pad/transpose chains around
    # the kernels (and their scatter inverses) become single einsums that
    # produce/consume the batch-last kernel layout directly — batched
    # scatter is a serialized anti-pattern on TPU, and the fused einsum
    # also absorbs the (B, .) <-> (., B) transpose. Phantom interior slots
    # (ragged padding, index >= n) and row pads are all-zero rows, which
    # reproduces the old "phantom reads 0 / dropped" semantics exactly.
    G_int = np.zeros((nb, ni_p, n))
    for _b in range(nb):
        for _i in range(ni):
            _c = int(interior[_b, _i])
            if _c < n:
                G_int[_b, _i, _c] = 1.0
    G_red = np.zeros((nr_p, n))
    G_red[np.arange(nr), reduced_j] = 1.0

    def pad_move(K_ii, K_ir, K_rr):
        """(B, ...) blocks -> batch-last, rows/cols padded to 8-multiples
        with unit diagonal so padded pivots are exactly 1 (excluded from
        extrema), lanes padded to a 128-multiple (padded lanes are all-zero
        garbage — nan stays lane-local on TPU and is sliced away)."""
        dtype = K_ii.dtype
        B = K_ii.shape[0]
        B_pad = _ceil_to(B, _BT)
        if B_pad > B:
            lane = ((0, B_pad - B),)
            K_ii = jnp.pad(K_ii, lane + ((0, 0),) * 3)
            K_ir = jnp.pad(K_ir, lane + ((0, 0),) * 3)
            K_rr = jnp.pad(K_rr, lane + ((0, 0),) * 2)
        K_ii = jnp.pad(K_ii, ((0, 0), (0, 0), (0, ni_p - ni), (0, ni_p - ni)))
        if ni_p > ni:
            pad_eye = jnp.concatenate(
                [jnp.zeros((ni,), dtype), jnp.ones((ni_p - ni,), dtype)]
            )
            K_ii = K_ii + jnp.diag(pad_eye)[None, None]
        K_ir = jnp.pad(K_ir, ((0, 0), (0, 0), (0, ni_p - ni), (0, nr_p - nr)))
        K_rr = jnp.pad(K_rr, ((0, 0), (0, nr_p - nr), (0, nr_p - nr)))
        if nr_p > nr:
            pad_eye_r = jnp.concatenate(
                [jnp.zeros((nr,), dtype), jnp.ones((nr_p - nr,), dtype)]
            )
            K_rr = K_rr + jnp.diag(pad_eye_r)[None]
        out = (
            jnp.moveaxis(K_ii, 0, -1),
            jnp.moveaxis(K_ir, 0, -1),
            jnp.moveaxis(K_rr, 0, -1),
        )
        if _os.environ.get("POCKIT_PALLAS_PM_BARRIER", "").strip():
            out = jax.lax.optimization_barrier(out)
        return out

    def factor(K_ii, K_ir, K_rr, delta):
        """Inputs batch-last padded: (nb, ni_p, ni_p, B), (nb, ni_p, nr_p,
        B), (nr_p, nr_p, B); ``delta`` (B,) per-lane base regularization
        (added to the diagonal IN KERNEL). Returns (fac, p_min (B,),
        p_max (B,), delta_used (B,), d_blk (nb+1, B), ok (B,)) —
        delta_used is the per-lane max level after block-local
        escalation, d_blk the PER-BLOCK levels actually factored
        (interiors then reduced; feed to :func:`_ba_mv` so refinement
        targets the factored system), and ok the lane-level block-local
        acceptance (every block's pivot ratio passed at its final
        level)."""
        dtype = K_ii.dtype
        B = K_ii.shape[-1]
        T = B // _BT
        grid = (T, nb + 1)
        kernel = functools.partial(
            _factor_kernel,
            nb, ni_p, nr_p, ni, nr,
            float(pivot_rtol), float(delta_w_floor), int(attempts),
        )
        bmin = lambda b: jnp.minimum(b, nb - 1)
        mx = max(ni_p, nr_p)
        delta2 = delta.reshape(1, B).astype(dtype)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, ni_p, ni_p, _BT),
                    lambda t, b: (bmin(b), 0, 0, t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, ni_p, nr_p, _BT),
                    lambda t, b: (bmin(b), 0, 0, t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (nr_p, nr_p, _BT),
                    lambda t, b: (0, 0, t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, _BT), lambda t, b: (0, t), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, ni_p, ni_p, _BT),
                    lambda t, b: (bmin(b), 0, 0, t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, ni_p, _BT),
                    lambda t, b: (bmin(b), 0, t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, ni_p, nr_p, _BT),
                    lambda t, b: (bmin(b), 0, 0, t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (nr_p, nr_p, _BT),
                    lambda t, b: (0, 0, t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (nr_p, _BT), lambda t, b: (0, t), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (4, _BT), lambda t, b: (0, t), memory_space=pltpu.VMEM
                ),
                # (nb+1, 1, B) with a singleton middle dim: Mosaic requires
                # the LAST TWO block dims be 8/128-divisible or full-size,
                # so the per-block row rides the leading (grid-mapped) dim
                pl.BlockSpec(
                    (1, 1, _BT), lambda t, b: (b, 0, t),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nb, ni_p, ni_p, B), dtype),
                jax.ShapeDtypeStruct((nb, ni_p, B), dtype),
                jax.ShapeDtypeStruct((nb, ni_p, nr_p, B), dtype),
                jax.ShapeDtypeStruct((nr_p, nr_p, B), dtype),
                jax.ShapeDtypeStruct((nr_p, B), dtype),
                jax.ShapeDtypeStruct((4, B), dtype),
                jax.ShapeDtypeStruct((nb + 1, 1, B), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((nr_p, nr_p, _BT), dtype),
                pltpu.VMEM((2, _BT), dtype),
                pltpu.VMEM((1, _BT), dtype),
                pltpu.VMEM((mx, mx, _BT), dtype),
                pltpu.VMEM((mx, _BT), dtype),
                pltpu.VMEM((2, _BT), dtype),
                pltpu.VMEM((1, _BT), dtype),
                pltpu.VMEM((1, _BT), dtype),
            ],
            interpret=interpret,
        )(K_ii, K_ir, K_rr, delta2)
        L_i, sc_i, X_ir, L_r, sc_r, piv, d_blk = out
        fac = (L_i, sc_i, X_ir, K_ir, L_r, sc_r)
        return fac, piv[0], piv[1], piv[2], d_blk[:, 0, :], piv[3] > 0.5

    def apply(fac, rhs):
        """fac batch-last padded (B_pad lanes); rhs (B, n) -> x (B, n)."""
        L_i, sc_i, X_ir, K_ir, L_r, sc_r = fac
        dtype = rhs.dtype
        B_out = rhs.shape[0]
        B = L_i.shape[-1]  # lane-padded batch carried by the factors
        if B > B_out:
            rhs = jnp.pad(rhs, ((0, B - B_out), (0, 0)))
        T = B // _BT
        Gi = jnp.asarray(G_int, dtype)
        Gr = jnp.asarray(G_red, dtype)
        # gather + pad + batch-last transpose as one einsum each
        b_i = _einsum("Bn,bin->biB", rhs, Gi)  # (nb, ni_p, B)
        b_r = _einsum("Bn,rn->rB", rhs, Gr)  # (nr_p, B)

        xbi, rred = pl.pallas_call(
            _apply_down_kernel,
            grid=(T, nb),
            in_specs=[
                pl.BlockSpec(
                    (1, ni_p, ni_p, _BT),
                    lambda t, b: (b, 0, 0, t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, ni_p, _BT),
                    lambda t, b: (b, 0, t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, ni_p, nr_p, _BT),
                    lambda t, b: (b, 0, 0, t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, ni_p, _BT),
                    lambda t, b: (b, 0, t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (nr_p, _BT), lambda t, b: (0, t), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, ni_p, _BT),
                    lambda t, b: (b, 0, t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (nr_p, _BT), lambda t, b: (0, t), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nb, ni_p, B), dtype),
                jax.ShapeDtypeStruct((nr_p, B), dtype),
            ],
            interpret=interpret,
        )(L_i, sc_i, K_ir, b_i, b_r)

        xr, xi = pl.pallas_call(
            _apply_up_kernel,
            grid=(T, nb),
            in_specs=[
                pl.BlockSpec(
                    (nr_p, nr_p, _BT),
                    lambda t, b: (0, 0, t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (nr_p, _BT), lambda t, b: (0, t), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (nr_p, _BT), lambda t, b: (0, t), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, ni_p, nr_p, _BT),
                    lambda t, b: (b, 0, 0, t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, ni_p, _BT),
                    lambda t, b: (b, 0, t),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (nr_p, _BT), lambda t, b: (0, t), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, ni_p, _BT),
                    lambda t, b: (b, 0, t),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nr_p, B), dtype),
                jax.ShapeDtypeStruct((nb, ni_p, B), dtype),
            ],
            interpret=interpret,
        )(L_r, sc_r, rred, X_ir, xbi)

        # placement (scatter inverse) + batch-leading transpose, one
        # einsum each; phantom/pad rows are zero in G and vanish
        x = _einsum("biB,bin->Bn", xi, Gi) + _einsum("rB,rn->Bn", xr, Gr)
        return x[:B_out]

    # jit-wrapped: each pallas_call re-traces its kernel body (O(n^2)
    # unrolled eqns) at every call site, and the solver applies the
    # factors ~10 times per iteration (Newton rhs, refinement residuals,
    # SOC, fallback). Nested jit caches one trace+lowering per aval,
    # cutting solver build time several-fold; the kernels are opaque to
    # XLA fusion anyway, so runtime is unchanged.
    return PallasCore(
        factor=jax.jit(factor),
        apply=jax.jit(apply),
        pad_move=pad_move,
        ni_p=ni_p,
        nr_p=nr_p,
    )


# ---------------------------------------------------------------------------
# custom_vmap interface used by the solver
# ---------------------------------------------------------------------------


def make_newton_dir(
    interior,
    reduced,
    n: int,
    *,
    pivot_rtol: float,
    max_reg_tries: int,
    delta_w_floor: float,
    delta_w_max: float,
    refine_steps: int = 1,
    interpret: bool = False,
    attempts: int = 1,
    residual_rtol: float = 1e-2,
):
    """Build ``(newton_dir, apply_one)`` for the Pallas KKT path.

    - ``newton_dir(K_ii, K_ir, K_rr, rhs, dreg, step_cap) -> (dz, fac,
      delta_w, ok)``: factor with the solver's inertia-escalation
      schedule (first try at ``dreg``, then the floor, then x10 up to
      ``delta_w_max``) and back-solve ``rhs``. The escalation loop lives
      inside the batched rule so factors never thread a vmapped carry.
    - ``apply_one(fac, b) -> x``: back-solve any rhs with the factors.

    Factor leaves carry a trailing lane axis (1 per-lane, lane-padded B
    batched); batched outputs are marked unbatched so the per-lane solver
    threads them opaquely (see module docstring). Any batch size works —
    lanes are padded to a 128-multiple internally.
    """
    interior = np.asarray(interior)
    reduced = np.asarray(reduced)
    nb, ni = interior.shape
    nr = len(reduced)
    core = _make_pallas_core(
        interior,
        reduced,
        n,
        interpret=interpret,
        pivot_rtol=pivot_rtol,
        delta_w_floor=delta_w_floor,
        attempts=attempts,
    )
    # per-lane fallback pinned to the lax primitives: custom_vmap stages the
    # per-lane fn into a jaxpr on EVERY call (batched or not), so the
    # "unrolled" form would add its full O(k^2)-op trace to every solver
    # build (~2x trace time observed) while production batched solves only
    # ever run the Pallas kernels. Single unbatched solves take this lax
    # path; the batch-shape-dependent XLA expander anomaly motivating
    # "unrolled" was only ever observed at B >= 1024 lanes.
    xla_factor, xla_apply = make_block_arrow_core(
        interior, reduced, n, method="lax"
    )
    ni_p, nr_p = core.ni_p, core.nr_p

    # one-hot select/place operators for the matvec: no batched TPU
    # scatter, and the placement einsum drops phantom slots (zero rows)
    # exactly like the old "phantom reads 0 / dropped" index plumbing
    nb_mv, ni_mv = interior.shape
    G2_int = np.zeros((nb_mv, ni_mv, n))
    for _b in range(nb_mv):
        for _i in range(ni_mv):
            _c = int(interior[_b, _i])
            if _c < n:
                G2_int[_b, _i, _c] = 1.0
    G2_red = np.zeros((nr, n))
    G2_red[np.arange(nr), reduced] = 1.0

    def _ba_mv(K_ii, K_ir, K_rr, d_int, d_red, x):
        """Block-arrow matvec ``(K + D) x`` on batch-leading raw blocks
        (x ``(..., n)``; leading batch axes optional), with PER-BLOCK
        diagonal shifts: ``d_int (..., nb)`` for the interval interiors
        and ``d_red (...)`` for the reduced block — the levels the factor
        kernel actually used after block-local retries. Used for the
        in-factorization iterative refinement: the f32 interior-
        elimination loses ~a digit of backward stability on near-singular
        Schur complements vs LAPACK, and one residual correction against
        the *factored* (perturbed) system wins it back; with block-local
        escalation the factored system's shift is block-wise, so a
        uniform-delta matvec would refine toward the wrong operator."""
        Gi = jnp.asarray(G2_int, x.dtype)
        Gr = jnp.asarray(G2_red, x.dtype)
        x_i = _einsum("...n,kin->...ki", x, Gi)  # phantom slots read 0
        x_r = _einsum("...n,rn->...r", x, Gr)
        y_i = (
            _einsum("...kij,...kj->...ki", K_ii, x_i)
            + _einsum("...kij,...j->...ki", K_ir, x_r)
            + d_int[..., None] * x_i
        )
        y_r = (
            _einsum("...kij,...ki->...j", K_ir, x_i)
            + _einsum("...ij,...j->...i", K_rr, x_r)
            + d_red[..., None] * x_r
        )
        return _einsum("...ki,kin->...n", y_i, Gi) + _einsum(
            "...r,rn->...n", y_r, Gr
        )

    def _schedule(delta, tries, dreg):
        """Inertia-escalation schedule (mirrors solver/ipm.py reg_body).
        Floors are cast to the carry dtype — a stray np.float64 scalar
        would promote the f32 escalation carry under x64. A caller-side
        ``delta_w_min`` clamp arrives through ``dreg`` (the ladder only
        ever ascends from the current level, so clamping the entry point
        covers every rung)."""
        floor = jnp.asarray(delta_w_floor, delta.dtype)
        cap = jnp.asarray(delta_w_max, delta.dtype)
        return jnp.where(
            tries == 0,
            dreg,
            jnp.where(
                (tries == 1) & (dreg < floor),
                floor,
                jnp.minimum(jnp.maximum(delta, floor) * 10.0, cap),
            ),
        )

    # ---- per-lane fallback (single solves; trailing lane axis = 1) ----

    def _lane_factor(K_ii, K_ir, K_rr, delta):
        eye_i = jnp.eye(K_ii.shape[-1], dtype=K_ii.dtype)
        eye_r = jnp.eye(K_rr.shape[-1], dtype=K_ii.dtype)
        fac, p_min, p_max = xla_factor(
            K_ii + delta * eye_i, K_ir, K_rr + delta * eye_r
        )
        ok = (
            jnp.isfinite(p_min)
            & jnp.isfinite(p_max)
            & (p_min > pivot_rtol * p_max)
        )
        return tuple(leaf[..., None] for leaf in fac), ok

    @custom_vmap
    def apply_one(fac, b):
        # slice to the real extents: the batched world's factors are
        # padded to 8-multiples and this body is traced with their avals
        L_i, sc_i, X_ir, K_ir, L_r, sc_r = (leaf[..., 0] for leaf in fac)
        fac_lane = (
            L_i[:, :ni, :ni],
            sc_i[:, :ni],
            X_ir[:, :ni, :nr],
            K_ir[:, :ni, :nr],
            L_r[:nr, :nr],
            sc_r[:nr],
        )
        return xla_apply(fac_lane, b)

    @apply_one.def_vmap
    def _apply_rule(axis_size, in_batched, fac, b):
        fac_b, b_b = in_batched
        assert not any(jax.tree_util.tree_leaves(fac_b)), (
            "pallas factors must be closure-threaded, not vmapped"
        )
        assert b_b
        return core.apply(fac, b), True

    @custom_vmap
    def newton_dir(K_ii, K_ir, K_rr, rhs, dreg, step_cap, active):
        dtype = rhs.dtype

        def body(carry):
            _, _, delta, ok, tries = carry
            delta_new = _schedule(delta, tries, dreg)
            fac, chol_ok = _lane_factor(K_ii, K_ir, K_rr, delta_new)
            dz = apply_one(fac, rhs)
            for _ in range(refine_steps):
                # the lax fallback has no block-local retries: the
                # factored shift is uniform delta_new on every block
                r = rhs - _ba_mv(
                    K_ii,
                    K_ir,
                    K_rr,
                    jnp.broadcast_to(delta_new, (nb,)),
                    delta_new,
                    dz,
                )
                dz_t = dz + apply_one(fac, r)
                dz = jnp.where(jnp.all(jnp.isfinite(dz_t)), dz_t, dz)
            ok = (
                chol_ok
                & jnp.all(jnp.isfinite(dz))
                & (jnp.linalg.norm(dz) <= step_cap)
            )
            if residual_rtol:
                # residual acceptance: on an exactly singular block the
                # f32 pivot test is a rounding coin flip (backend-
                # dependent); what the solve actually achieved is not
                r_fin = rhs - _ba_mv(
                    K_ii,
                    K_ir,
                    K_rr,
                    jnp.broadcast_to(delta_new, (nb,)),
                    delta_new,
                    dz,
                )
                ok = ok & (
                    jnp.linalg.norm(r_fin)
                    <= residual_rtol
                    * jnp.maximum(jnp.linalg.norm(rhs), 1e-30)
                )
            dz = jnp.where(ok, dz, 0.0)
            return fac, dz, delta_new, ok, tries + 1

        def cond(carry):
            # inactive lanes (frozen/discarded steps) never escalate
            return (~carry[3]) & (carry[4] < max_reg_tries) & active

        fac0, _ = _lane_factor(K_ii, K_ir, K_rr, jnp.asarray(0.0, dtype))
        fac0 = jax.tree_util.tree_map(jnp.zeros_like, fac0)
        init = (
            fac0,
            jnp.zeros((n,), dtype),
            jnp.asarray(0.0, dtype),
            jnp.asarray(False),
            jnp.asarray(0, jnp.int32),
        )
        fac, dz, delta, ok, _ = jax.lax.while_loop(cond, body, init)
        return dz, fac, delta, ok

    @newton_dir.def_vmap
    def _newton_rule(
        axis_size, in_batched, K_ii, K_ir, K_rr, rhs, dreg, step_cap, active
    ):
        assert all(in_batched[:4]), "K blocks and rhs must be batched"
        dtype = rhs.dtype
        B = rhs.shape[0]
        active = jnp.broadcast_to(jnp.asarray(active), (B,))
        Kii_t, Kir_t, Krr_t = core.pad_move(K_ii, K_ir, K_rr)

        B_pad = Kii_t.shape[-1]  # lane-padded by pad_move

        def try_delta(delta):  # delta (B,) base level; kernel may escalate
            delta_p = jnp.pad(delta, (0, B_pad - B))
            # the kernel adds delta on the diagonal AND retries failing
            # blocks VMEM-locally at a bumped per-block level (block-local
            # escalation) — no (B, nb, ni, ni) delta materialization, and
            # marginal pivot failures no longer cost a full-batch HBM
            # factorization round. chol_ok is the kernel's block-local
            # acceptance: every block passed its own pivot-ratio test at
            # its final level.
            fac, p_min, p_max, d_used, d_blk, allok = core.factor(
                Kii_t, Kir_t, Krr_t, delta_p
            )
            d_used = d_used[:B]
            chol_ok = allok[:B]
            d_blk = jnp.moveaxis(d_blk, -1, 0)[:B]  # (B, nb+1)
            dz = core.apply(fac, rhs)
            for _ in range(refine_steps):
                # refine against the factored operator: per-block shifts
                r = rhs - _ba_mv(
                    K_ii, K_ir, K_rr, d_blk[:, :-1], d_blk[:, -1], dz
                )
                dz_t = dz + core.apply(fac, r)
                dz = jnp.where(
                    jnp.all(jnp.isfinite(dz_t), axis=1, keepdims=True),
                    dz_t,
                    dz,
                )
            ok = (
                chol_ok
                & jnp.all(jnp.isfinite(dz), axis=1)
                & (jnp.linalg.norm(dz, axis=1) <= step_cap)
            )
            if residual_rtol:
                # residual acceptance against the factored operator (per-
                # block shifts): a "passed" factorization of a singular
                # block produces a solve that does not solve — reject it
                # per lane and let the escalation ladder regularize,
                # identically on every backend (see options.py
                # newton_residual_rtol)
                r_fin = rhs - _ba_mv(
                    K_ii, K_ir, K_rr, d_blk[:, :-1], d_blk[:, -1], dz
                )
                ok = ok & (
                    jnp.linalg.norm(r_fin, axis=1)
                    <= residual_rtol
                    * jnp.maximum(jnp.linalg.norm(rhs, axis=1), 1e-30)
                )
            dz = jnp.where(ok[:, None], dz, 0.0)
            return fac, dz, ok, d_used

        def body(carry):
            _, _, delta, ok, tries = carry
            # outer escalation rounds: dreg -> floor -> x10 ladder
            # (_schedule mirrors solver/ipm.py reg_body; with in-kernel
            # retries enabled the floor rung is redundant but harmless)
            delta_new = jnp.where(
                ok | ~active, delta, _schedule(delta, tries, dreg)
            )
            fac, dz, ok_new, d_used = try_delta(delta_new)
            # frozen lanes keep their values only if we re-solved them —
            # simplest correct policy: re-solve everything each round
            # (rounds beyond the first are rare)
            return fac, dz, jnp.where(ok, delta, d_used), ok | ok_new, tries + 1

        def cond(carry):
            # a failing INACTIVE lane (its step is discarded by the solver
            # this iteration) must not buy the whole batch another
            # factorization round — stale frozen lanes sit at endgame
            # points that can fail the pivot test every iteration
            return jnp.any((~carry[3]) & active) & (carry[4] < max_reg_tries)

        # first (and almost always only) round at the per-lane memory level
        delta0 = jnp.broadcast_to(jnp.asarray(dreg, dtype), (B,))
        fac, dz, ok, d_used = try_delta(delta0)
        fac, dz, delta, ok, _ = jax.lax.while_loop(
            cond, body, (fac, dz, d_used, ok, jnp.asarray(1, jnp.int32))
        )
        out_batched = (
            True,
            jax.tree_util.tree_map(lambda _: False, fac),
            True,
            True,
        )
        return (dz, fac, delta, ok), out_batched

    def supports(batch_size: int) -> bool:
        return True  # lanes are padded to a 128-multiple internally

    return newton_dir, apply_one, supports
