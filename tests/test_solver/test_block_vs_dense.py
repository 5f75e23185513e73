"""The block KKT path must reproduce the dense path's convergence.

For exact-pattern problems (krylov_rank == 0) both paths solve the same
linear systems, so iteration counts and iterates must agree to float
noise; for low-rank-coupled problems the matrix-free PCG makes the solve
exact, so results must still match at solution level.
"""

import dataclasses

import numpy as np
import pytest

import pockit_tpu.lobatto as lobatto
import pockit_tpu.radau as radau
from pockit_tpu.optimizer import ipm
from pockit_tpu.optimizer._common import preprocess


def _lqr():
    system = lobatto.System(["x_f"])
    (x_f,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([-x + u])
    phase.set_integral([x**2 + 0.1 * u**2])
    phase.set_boundary_condition([1], [x_f], 0, 1)
    phase.set_discretization(6, 8)
    system.set_phase([phase])
    system.set_objective(phase.I[0] + x_f**2 / 2)
    guess = lobatto.constant_guess(phase, 0)
    return system, [guess, [0.0]]


def _constrained_radau():
    system = radau.System(0)
    phase = system.new_phase(["x", "v"], ["u"])
    x, v = phase.x
    (u,) = phase.u
    phase.set_dynamics([v, u])
    phase.set_integral([u**2])
    phase.set_phase_constraint([u], [-8.0], [8.0])
    phase.set_boundary_condition([0.0, 0.0], [1.0, 0.0], 0.0, 1.0)
    phase.set_discretization(4, 6)
    system.set_phase([phase])
    system.set_objective(phase.I[0])
    guess = radau.linear_guess(phase, 0.2)
    return system, guess


def _with_system_rows():
    system = radau.System(["a"])
    (a,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([a * x + u])
    phase.set_integral([x**2 + u**2])
    phase.set_boundary_condition([1.0], [0.2], 0.0, 1.0)
    phase.set_discretization(3, 6)
    system.set_phase([phase])
    system.set_system_constraint([a], [-2.0], [-0.5])
    system.set_objective(phase.I[0] + a**2)
    guess = radau.constant_guess(phase, 0.5)
    return system, [guess, [-1.0]]


@pytest.mark.parametrize(
    "builder,obj_tol",
    [(_lqr, 1e-10), (_constrained_radau, 1e-10), (_with_system_rows, 1e-8)],
    ids=["lqr", "constrained", "system-rows"],
)
def test_block_matches_dense(builder, obj_tol):
    system, guess = builder()
    base = ipm.default_options()
    dense = dataclasses.replace(base, kkt_solver="dense")
    blockopts = dataclasses.replace(base, kkt_solver="block")

    v_d, info_d = ipm.solve(system, guess, dense)
    v_b, info_b = ipm.solve(system, guess, blockopts)

    assert info_d["status"] == 0 and info_b["status"] == 0
    assert abs(info_d["obj_val"] - info_b["obj_val"]) < obj_tol
    # exact-pattern problems take the same path step for step
    from pockit_tpu.solver.structured import structured_layout

    if structured_layout(system).krylov_rank == 0:
        assert info_d["iterations"] == info_b["iterations"]
        np.testing.assert_allclose(info_d["x"], info_b["x"], atol=1e-8)


def test_batched_block_path():
    """solve_batch on the default (auto -> block) path, varied FIXED bcs."""
    system, guess = _lqr()
    x0, _ = preprocess(system, guess)
    B = 8
    x0b = np.tile(x0, (B, 1))
    compiled = system.compiled
    bc = np.tile(np.asarray(compiled.phases[0].fixed_vals), (B, 1))
    rng = np.random.default_rng(0)
    bc[:, 0] = rng.uniform(0.5, 1.5, B)
    res = ipm.solve_batch(system, x0b, bc_overrides=(bc,))
    assert np.all(np.asarray(res.status) == 0)
    # LQR cost scales with x0^2 (plus the x_f static term handled inside)
    ref = np.asarray(res.obj)[0] / bc[0, 0] ** 2
    np.testing.assert_allclose(
        np.asarray(res.obj), ref * bc[:, 0] ** 2, rtol=1e-6
    )


def _isoperimetric():
    """System constraint on a nonlinear-integrand integral: the in-pattern
    y_sys * dc/dI * d2I/dz2 Lagrangian curvature must be assembled with
    current-point weights (regression: the block path diverged here when
    system rows were excluded from the assembly entirely)."""
    system = lobatto.System(["x_f"])
    (x_f,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([-x + u])
    phase.set_integral([x**2 + 0.1 * u**2, u**2])
    phase.set_boundary_condition([1], [x_f], 0, 1)
    phase.set_discretization(6, 8)
    system.set_phase([phase])
    system.set_system_constraint([phase.I[1]], [0.0], [0.4])
    system.set_objective(phase.I[0] + x_f**2 / 2)
    guess = lobatto.constant_guess(phase, 0)
    return system, [guess, [0.0]]


def _cross_phase_objective():
    """Objective coupling integrals of DIFFERENT phases (I_p0 * I_p1):
    krylov_rank must count both (regression: cross-phase detection)."""
    system = lobatto.System(0)
    phases = []
    for k in range(2):
        ph = system.new_phase(["x"], ["u"])
        (x,) = ph.x
        (u,) = ph.u
        ph.set_dynamics([-x + u])
        ph.set_integral([x**2 + u**2])
        ph.set_boundary_condition([1.0 if k == 0 else None], [None], float(k), float(k + 1))
        ph.set_discretization(3, 6)
        phases.append(ph)
    system.set_phase(phases)
    system.set_objective(phases[0].I[0] * phases[1].I[0])
    guesses = [lobatto.constant_guess(ph, 0.5) for ph in phases]
    return system, guesses


@pytest.mark.parametrize(
    "builder,obj_tol",
    [(_isoperimetric, 1e-7), (_cross_phase_objective, 1e-7)],
    ids=["isoperimetric", "cross-phase-objective"],
)
def test_block_matches_dense_lagrangian_head(builder, obj_tol):
    """Lagrangian-head couplings (system rows / cross-phase integrals):
    the block path must converge to the dense path's solution."""
    system, guess = builder()
    base = ipm.default_options()
    dense = dataclasses.replace(base, kkt_solver="dense")
    blockopts = dataclasses.replace(base, kkt_solver="block")

    v_d, info_d = ipm.solve(system, guess, dense)
    v_b, info_b = ipm.solve(system, guess, blockopts)
    assert info_d["status"] == 0, info_d
    assert info_b["status"] == 0, info_b
    assert abs(info_d["obj_val"] - info_b["obj_val"]) < obj_tol

    from pockit_tpu.solver.structured import structured_layout

    assert structured_layout(system).krylov_rank > 0


def test_block_path_all_func_boundaries():
    """A phase with zero FIXED boundary slots (all FUNC/FREE) must build
    and solve on the block path (regression: empty-bc gather crash)."""
    import sympy as sp

    system = lobatto.System(["c"])
    (c,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([-x + u])
    phase.set_integral([x**2 + u**2])
    # EVERY boundary slot is a FUNC of the static — zero FIXED slots, so
    # the runtime bc vector is empty (the crashing configuration)
    phase.set_boundary_condition([c], [2 * c], 0.1 * c, c)
    phase.set_discretization(3, 6)
    system.set_phase([phase])
    system.set_objective(phase.I[0] + (c - 1.0) ** 2)
    guess = lobatto.constant_guess(phase, 1.0)

    base = ipm.default_options()
    blockopts = dataclasses.replace(base, kkt_solver="block")
    v, info = ipm.solve(system, [guess, [1.0]], blockopts)
    assert info["status"] == 0, info
    dense = dataclasses.replace(base, kkt_solver="dense")
    _, info_d = ipm.solve(system, [guess, [1.0]], dense)
    assert abs(info["obj_val"] - info_d["obj_val"]) < 1e-9


def _ragged_lgl():
    """hp-refined-style ragged degrees within one LGL phase."""
    system = lobatto.System(["x_f"])
    (x_f,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([-x + u])
    phase.set_integral([x**2 + 0.1 * u**2])
    phase.set_boundary_condition([1], [x_f], 0, 1)
    phase.set_discretization([0, 0.25, 0.6, 1.0], [5, 8, 6])
    system.set_phase([phase])
    system.set_objective(phase.I[0] + x_f**2 / 2)
    guess = lobatto.constant_guess(phase, 0)
    return system, [guess, [0.0]]


def _ragged_radau_constrained():
    """Ragged Radau mesh with an active path constraint."""
    system = radau.System(0)
    phase = system.new_phase(["x", "v"], ["u"])
    x, v = phase.x
    (u,) = phase.u
    phase.set_dynamics([v, u])
    phase.set_integral([u**2])
    phase.set_phase_constraint([u], [-8.0], [8.0])
    phase.set_boundary_condition([0.0, 0.0], [1.0, 0.0], 0.0, 1.0)
    phase.set_discretization([0, 0.3, 0.55, 1.0], [7, 4, 6])
    system.set_phase([phase])
    system.set_objective(phase.I[0])
    guess = radau.linear_guess(phase, 0.2)
    return system, guess


def _ragged_mixed_phases():
    """Two phases of different uniform degree (cross-phase ragged)."""
    system = lobatto.System(["s0"])
    (s0,) = system.s
    phases = []
    for k, deg in enumerate([5, 7]):
        ph = system.new_phase(["x"], ["u"])
        (x,) = ph.x
        (u,) = ph.u
        ph.set_dynamics([-0.5 * x + (k + 1) * u])
        ph.set_integral([x**2 + u**2])
        ph.set_boundary_condition(
            [1.0 if k == 0 else s0],
            [s0 if k == 0 else None],
            float(k),
            float(k + 1),
        )
        ph.set_discretization(3, deg)
        phases.append(ph)
    system.set_phase(phases)
    system.set_objective(phases[0].I[0] + phases[1].I[0])
    guesses = [lobatto.constant_guess(ph, 0.5) for ph in phases]
    return system, guesses + [[0.5]]


@pytest.mark.parametrize(
    "builder",
    [_ragged_lgl, _ragged_radau_constrained, _ragged_mixed_phases],
    ids=["ragged-lgl", "ragged-radau-constrained", "ragged-mixed-phases"],
)
def test_ragged_block_matches_dense(builder):
    """Ragged interval degrees (hp-refined meshes) stay on the block path
    via degree bucketing + phantom padding, matching dense step for step
    on exact-pattern problems."""
    system, guess = builder()
    from pockit_tpu.solver.structured import structured_layout
    from pockit_tpu.transcription.kkt import make_block_kkt

    layout = structured_layout(system)
    assert layout is not None
    assert (np.asarray(layout.interior) >= int(system.L)).any(), (
        "builder no longer produces a ragged (padded) layout"
    )
    assert make_block_kkt(system) is not None

    base = ipm.default_options()
    dense = dataclasses.replace(base, kkt_solver="dense")
    blockopts = dataclasses.replace(base, kkt_solver="block")
    v_d, info_d = ipm.solve(system, guess, dense)
    v_b, info_b = ipm.solve(system, guess, blockopts)
    assert info_d["status"] == 0 and info_b["status"] == 0
    assert abs(info_d["obj_val"] - info_b["obj_val"]) < 1e-9
    if layout.krylov_rank == 0:
        assert info_d["iterations"] == info_b["iterations"]
        np.testing.assert_allclose(info_d["x"], info_b["x"], atol=1e-8)


def test_refined_mesh_stays_on_block_path():
    """solve -> refine -> solve keeps the block path: refinement produces
    per-interval degrees and those must not fall back to dense (VERDICT
    r1 item 4; the reference's refine loop is systembase.py:1146-1234)."""
    import dataclasses as dc

    import sympy as sp

    from pockit_tpu.transcription.kkt import make_block_kkt

    system = radau.System(0)
    phase = system.new_phase(["x", "v"], ["u"])
    x, v = phase.x
    (u,) = phase.u
    phase.set_dynamics([v, u - sp.sin(5 * x)])
    phase.set_integral([u**2])
    phase.set_boundary_condition([0, 0], [1, 0], 0, 1)
    phase.set_discretization(3, 4)
    system.set_phase([phase])
    system.set_objective(phase.I[0])
    guess = radau.constant_guess(phase, 0.5)

    opts = dc.replace(ipm.default_options(), kkt_solver="block")
    var, info = ipm.solve(system, guess, opts)
    assert info["status"] == 0
    saw_ragged = False
    for _ in range(3):
        if system.check(var, 1e-12, 1e-12):
            break
        var = system.refine(var, 1e-12, 1e-12)
        degs = list(map(int, phase.d.num_point))
        saw_ragged = saw_ragged or len(set(degs)) > 1
        assert make_block_kkt(system) is not None, (
            f"refined mesh {degs} fell off the block path"
        )
        var, info = ipm.solve(system, var, opts)
        assert info["status"] == 0
        _, info_d = ipm.solve(
            system, var, dc.replace(ipm.default_options(), kkt_solver="dense")
        )
        assert abs(info["obj_val"] - info_d["obj_val"]) < 1e-8
    assert saw_ragged, "refinement never produced a ragged mesh; weaken test"
