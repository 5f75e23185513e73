"""Interior-point solver options.

A small dataclass replaces IPOPT's string-keyed option system (reference
passthrough: ``/root/reference/pockit/optimizer/ipopt.py:50-51``). All
fields are Python scalars so an options instance is a static jit argument.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class IPOptions:
    """Options for the primal-dual interior-point solver.

    Defaults follow IPOPT's monotone (Fiacco-McCormick) strategy; tolerances
    are interpreted in the solver dtype (use ~1e-8 for float64, ~1e-5 for
    float32 on TPU).
    """

    tol: float = 1e-8  # KKT error for successful termination
    max_iter: int = 100
    mu_init: float = 1e-1
    kappa_mu: float = 0.2  # linear mu shrink factor
    theta_mu: float = 1.5  # superlinear mu shrink exponent
    kappa_eps: float = 10.0  # barrier subproblem tolerance = kappa_eps * mu
    # barrier update strategy: "monotone" (Fiacco-McCormick ladder, the
    # default), "mehrotra" (affine-scaling probe retargets mu by the cubic
    # rule + second-order corrector; one extra back-substitution per
    # iteration — wins on inequality-active problems like bang-bang, ties
    # elsewhere), or "adaptive" (LOQO centrality rule; measured worse than
    # monotone on every gate, kept for comparison — tools/compare_mu.py)
    mu_strategy: str = "monotone"
    tau_min: float = 0.99  # fraction-to-boundary floor
    kappa_1: float = 1e-2  # initial-point push (absolute)
    kappa_2: float = 1e-2  # initial-point push (relative)
    s_max: float = 100.0  # KKT error scaling threshold
    # line search
    max_ls: int = 20  # backtracking steps
    # second-order correction on the first rejected trial (IPOPT §2.4);
    # disable to trade robustness on hard constraint curvature for one
    # constraint evaluation + back-solve per iteration
    soc: bool = True
    # damped Gauss-Newton feasibility step when every line-search trial
    # fails (restoration-lite); disable only for well-conditioned batches
    feasibility_fallback: bool = True
    # regularization
    delta_w_init: float = 1e-8
    delta_w_max: float = 1e10
    # hard lower clamp on the inertia regularization actually factored
    # (every escalation-ladder try runs at >= delta_w_min). Default 0.
    # Purpose: float32 inertia detectability. A nonconvex KKT matrix can
    # carry negative curvature far below the f32 pivot noise floor
    # (measured on the Goddard singular arc: lambda_min = -7.3e-3 against
    # lambda_max = 4.1e6, i.e. 1.8e-9 relative — under eps_f32 = 6e-8),
    # where Cholesky breakdown becomes a backend-dependent coin flip: the
    # CPU's rounding yields nan (escalating to an adequate delta), the
    # TPU's yields a clean-looking factorization of the indefinite system
    # whose directions wreck the run. Residual tests cannot catch this
    # (the indefinite solve has a SMALL residual; the inertia is what is
    # wrong). Setting delta_w_min ~ 1e-2 * (typical curvature scale) on
    # such problems makes every factorization decidable and the solver
    # backend-deterministic — an LM-damped Newton whose extra iterations
    # are the honest price of f32. Convex/well-scaled problems (LQR)
    # should keep 0.
    delta_w_min: float = 0.0
    delta_c: float = 1e-8  # dual regularization floor for equality rows
    delta_c_scale: float = 0.0  # mu-proportional dual regularization (0 = fixed floor)
    # relative Cholesky pivot threshold: factorization counts as failed when
    # min(diag L) <= chol_pivot_rtol * max(diag L) (catches PSD-singular K)
    chol_pivot_rtol: float = 1e-7
    # residual acceptance for the Newton solve: reject a factorization
    # whose (refined) solve leaves ||K dz - rhs|| > rtol * ||rhs|| and
    # escalate instead. On an exactly singular block the f32 pivot test
    # is a rounding coin flip — measured on the Goddard singular arc, the
    # TPU's coin lands "pass" at the delta floor where the CPU's lands
    # "fail" (same inputs), and the unregularized near-singular solve
    # poisons the duals for the rest of the run. The residual test makes
    # acceptance depend on what the solve actually achieved, identically
    # on every backend. 0 disables. Applied where the factored operator's
    # matvec is exact: the pallas path, and the block path for problems
    # with no low-rank discrepancy (krylov_rank == 0).
    newton_residual_rtol: float = 1e-2
    bound_relax: float = 1e-8  # relax bounds to avoid empty interior
    max_reg_tries: int = 10
    # iterative refinement of the condensed KKT solve (helps float32)
    refine_steps: int = 2
    # watchdog: declare divergence when primal iterates blow up
    diverge_threshold: float = 1e20
    # KKT linear solver:
    # - "auto" (the production default): when the problem fits the
    #   block-arrow pattern, "pallas" on TPU and "block" elsewhere;
    #   "dense" when it does not fit
    # - "block": per-interval assembled block-arrow factorization with
    #   matrix-free J/W products — nothing (L, L)-shaped is ever built
    # - "pallas": "block" with the factorization/back-solve fused into
    #   Pallas TPU kernels, batch-in-lanes (interpret-mode off TPU)
    # - "structured": interval-Schur factorization fed by gathering a
    #   dense condensed matrix (oracle/debug path)
    # - "dense": Cholesky of the full condensed matrix
    kkt_solver: str = "auto"
    # factor/apply primitive set for the block path: "lax"
    # (jnp.linalg.cholesky / solve_triangular — LAPACK on CPU), "unrolled"
    # (expander-free elementwise substitution — batch-shape-invariant
    # numerics, the TPU production form), or "auto" (unrolled off-CPU)
    block_core: str = "auto"
    # block-local in-kernel retry depth for the Pallas factorization: a
    # block that fails its own pivot test re-factors tile-locally in VMEM
    # at a bumped per-block delta up to (pallas_attempts - 1) times before
    # the lane asks for a full-batch escalation round. DEFAULT 1 (off):
    # measured on the f32 Goddard gate (batched, pallas path), per-block
    # retries let hard lanes pass with NONUNIFORMLY-damped blocks whose
    # directions the filter then rejects — convergence fell from 100%
    # (attempts=1) to 62%/38% (attempts=2/3) with mean iterations 6.8 ->
    # 65/104; even floor-magnitude (1e-6) nonuniform bumps showed the
    # effect. The uniform outer escalation ladder is the load-bearing
    # inertia correction. Raise only for batch-homogeneous convex
    # workloads (validated on the LQR QP bench: attempts=3 converges
    # 100% at full speed) where whole-batch escalation rounds are the
    # dominant cost. The BLOCK-LOCAL ACCEPTANCE test (each block judged
    # against its own pivot extrema) is always on and is what improved
    # step quality in r5 — this flag only controls in-kernel re-factoring.
    pallas_attempts: int = 1
    # matmul precision for the whole solve ('highest' forces true float32
    # accumulation on TPU, where the default lowers f32 matmuls to bfloat16
    # passes — fatal for Cholesky factorizations)
    matmul_precision: str = "highest"
    # stream per-iteration metrics (kkt, mu, alpha, delta_w, theta) to the
    # host via jax.debug.callback — IPOPT's console log, as an opt-in
    # (batched solves print batch aggregates)
    live_metrics: bool = False
