"""cyipopt-protocol sparse callback surface (VERDICT r4 missing #1).

The reference System is itself the problem object handed to cyipopt,
with sparse ``jacobianstructure``/``hessianstructure`` and split
``hessian_o``/``hessian_c`` value callbacks
(``/root/reference/pockit/base/systembase.py:602-835``). These tests pin
the rebuild's surface to the same contract: plain 1D value arrays whose
coordinates come from the structure methods, Hessians lower-triangle
only, so a reference-stack box could cross-check our NLP in-process.
"""

import numpy as np
import pytest

import pockit_tpu.lobatto as lobatto


@pytest.fixture(scope="module")
def lqr_system():
    system = lobatto.System(["x_f"])
    (x_f,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([-x + u])
    phase.set_integral([x**2 + 0.1 * u**2])
    phase.set_boundary_condition([1], [x_f], 0, 1)
    phase.set_discretization(4, 6)
    system.set_phase([phase])
    system.set_objective(phase.I[0] + x_f**2 / 2)
    return system


def _dense_from_coo(rows, cols, vals, shape, symmetrize=False):
    A = np.zeros(shape)
    np.add.at(A, (rows, cols), vals)  # duplicate coords sum (cyipopt rule)
    if symmetrize:
        strict = np.tril(A, -1)
        A = A + strict.T
    return A


def test_jacobian_matches_dense(lqr_system):
    compiled = lqr_system.compiled
    rng = np.random.default_rng(1)
    rows, cols = lqr_system.jacobianstructure()
    m, L = compiled.m, compiled.L
    # the pattern is genuinely sparse (block-arrow footprint)
    assert len(rows) < 0.5 * m * L
    for _ in range(3):
        x = 0.3 + 0.4 * rng.standard_normal(L)
        J_dense = np.asarray(compiled.jacobian(x))
        vals = lqr_system.jacobian(x)
        assert vals.ndim == 1 and len(vals) == len(rows)
        np.testing.assert_allclose(
            _dense_from_coo(rows, cols, vals, (m, L)), J_dense,
            rtol=1e-12, atol=1e-12,
        )


def test_hessian_split_matches_dense(lqr_system):
    compiled = lqr_system.compiled
    rng = np.random.default_rng(2)
    m, L = compiled.m, compiled.L
    ro, co = lqr_system.hessianstructure_o()
    rc_, cc_ = lqr_system.hessianstructure_c()
    assert (ro >= co).all() and (rc_ >= cc_).all()  # lower triangle only
    x = 0.3 + 0.4 * rng.standard_normal(L)
    fct_c = rng.standard_normal(m)

    H_o = np.asarray(compiled.hessian(x, np.zeros(m), 1.0))
    np.testing.assert_allclose(
        _dense_from_coo(ro, co, lqr_system.hessian_o(x), (L, L), True),
        H_o, rtol=1e-12, atol=1e-12,
    )
    H_c = np.asarray(compiled.hessian(x, fct_c, 0.0))
    np.testing.assert_allclose(
        _dense_from_coo(rc_, cc_, lqr_system.hessian_c(x, fct_c), (L, L), True),
        H_c, rtol=1e-12, atol=1e-12,
    )


def test_combined_hessian_contract(lqr_system):
    """hessian(x, fct_c, fct_o) concatenates the objective block (scaled
    by fct_o) and the constraint block at hessianstructure's coordinates;
    summing duplicates reconstructs the dense Lagrangian Hessian."""
    compiled = lqr_system.compiled
    rng = np.random.default_rng(3)
    m, L = compiled.m, compiled.L
    x = 0.3 + 0.4 * rng.standard_normal(L)
    fct_c = rng.standard_normal(m)
    fct_o = 0.7
    rows, cols = lqr_system.hessianstructure()
    vals = lqr_system.hessian(x, fct_c, fct_o)
    assert len(vals) == len(rows)
    H_ref = np.asarray(compiled.hessian(x, fct_c, fct_o))
    np.testing.assert_allclose(
        _dense_from_coo(rows, cols, vals, (L, L), True), H_ref,
        rtol=1e-12, atol=1e-12,
    )


def test_structure_survives_update(lqr_system):
    """update() invalidates the cached pattern along with the compiled
    transcription."""
    r0, _ = lqr_system.jacobianstructure()
    lqr_system.update()
    assert lqr_system._nlp_structure_cache is None
    r1, _ = lqr_system.jacobianstructure()
    np.testing.assert_array_equal(r0, r1)
