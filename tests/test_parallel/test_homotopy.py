"""Homotopy continuation: warm-started stages reach a target that is
reachable cold only with more iterations; killed sweeps auto-resume from
their stage checkpoint."""

import numpy as np
import jax.numpy as jnp
import pytest

import pockit_tpu.lobatto as lobatto
from pockit_tpu.optimizer import ipm
from pockit_tpu.optimizer._common import preprocess
from pockit_tpu.parallel import homotopy_sweep
from pockit_tpu.parallel.homotopy import StageSummary


def _lqr_sweep_fixture():
    a, b, s_, q, r = -1, 1, 1, 1, 0.1
    system = lobatto.System(["x_f"])
    (x_f,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([a * x + b * u])
    phase.set_integral([q * x**2 + r * u**2])
    phase.set_boundary_condition([1], [x_f], 0, 1)
    phase.set_discretization(6, 6)
    system.set_phase([phase])
    system.set_objective(phase.I[0] + s_ * x_f**2 / 2)

    guess = lobatto.constant_guess(phase, 0)
    x0, _ = preprocess(system, [guess, [0.0]])
    compiled = system.compiled
    B = 4
    base_bc = np.tile(compiled.phases[0].fixed_vals, (B, 1))
    targets = np.array([3.0, 4.0, 5.0, 6.0])
    stages = []
    for lam in np.linspace(0.25, 1.0, 4):
        bc = base_bc.copy()
        bc[:, 0] = 1.0 + lam * (targets - 1.0)
        stages.append((jnp.asarray(bc),))
    return system, np.tile(x0, (B, 1)), stages, targets


def test_homotopy_sweep_kill_restart(tmp_path):
    system, guess_b, stages, targets = _lqr_sweep_fixture()
    ck = str(tmp_path / "sweep.npz")

    # uninterrupted reference run (no checkpointing)
    ref = homotopy_sweep(system, guess_b, stages)

    # run that dies after stage 1 (simulated kill: the exception escapes
    # after the stage-1 checkpoint has been written)
    class Killed(RuntimeError):
        pass

    def die_after_1(k, res):
        if k == 1:
            raise Killed

    with pytest.raises(Killed):
        homotopy_sweep(
            system, guess_b, stages, on_stage=die_after_1, checkpoint_path=ck
        )

    # unattended restart: same call, no special arguments — stages 0-1 are
    # restored from the checkpoint, stages 2-3 actually solve
    solved = []
    results = homotopy_sweep(
        system,
        guess_b,
        stages,
        on_stage=lambda k, res: solved.append(k),
        checkpoint_path=ck,
    )
    assert solved == [2, 3]
    assert isinstance(results[0], StageSummary)
    assert isinstance(results[1], StageSummary)
    assert results[1].z is not None and results[0].z is None
    # restored summaries carry the stage outputs
    np.testing.assert_allclose(
        np.asarray(results[1].obj), np.asarray(ref[1].obj), rtol=1e-6
    )
    # final stage matches the uninterrupted sweep
    assert np.all(np.asarray(results[-1].status) == 0)
    np.testing.assert_allclose(
        np.asarray(results[-1].obj), np.asarray(ref[-1].obj), rtol=1e-6
    )

    # a finished sweep resumes to a no-op
    again = homotopy_sweep(
        system,
        guess_b,
        stages,
        on_stage=lambda k, res: solved.append(("again", k)),
        checkpoint_path=ck,
    )
    assert solved == [2, 3]
    assert all(isinstance(r, StageSummary) for r in again)

    # a checkpoint from a DIFFERENT sweep is ignored, not resumed
    other_stages = [stages[0]] * 2
    with pytest.warns(UserWarning, match="fingerprint mismatch"):
        fresh = homotopy_sweep(
            system, guess_b, other_stages, checkpoint_path=ck
        )
    assert len(fresh) == 2 and not isinstance(fresh[0], StageSummary)


def test_homotopy_checkpoint_incremental_stride(tmp_path):
    """checkpoint_every strides the (B, L) warm-batch save; per-stage
    summary files are appended (never rewritten) and resume re-solves at
    most checkpoint_every - 1 stages."""
    import os

    system, guess_b, stages, targets = _lqr_sweep_fixture()
    ck = str(tmp_path / "sweep_ck")

    class Killed(RuntimeError):
        pass

    def die_after_2(k, res):
        if k == 2:
            raise Killed

    # warm batch saved at stages 1 and 3 only (every 2nd); killed after
    # stage 2's commit -> warm.npz still holds stage 1
    with pytest.raises(Killed):
        homotopy_sweep(
            system,
            guess_b,
            stages,
            on_stage=die_after_2,
            checkpoint_path=ck,
            checkpoint_every=2,
        )
    # incremental layout: per-stage summaries + single warm + manifest
    names = sorted(os.listdir(ck))
    assert names == [
        "manifest.npz",
        "stage_00000.npz",
        "stage_00001.npz",
        "stage_00002.npz",
        "warm.npz",
    ]
    stage1_mtime = os.path.getmtime(os.path.join(ck, "stage_00001.npz"))

    solved = []
    results = homotopy_sweep(
        system,
        guess_b,
        stages,
        on_stage=lambda k, res: solved.append(k),
        checkpoint_path=ck,
        checkpoint_every=2,
    )
    # stage 2's summary was committed but its warm batch was strided out:
    # resume restarts at stage 2 (= at most checkpoint_every - 1 re-solves)
    assert solved == [2, 3]
    assert isinstance(results[0], StageSummary)
    assert isinstance(results[1], StageSummary)
    # append-only: stage 1's record was not rewritten by the resumed run
    assert os.path.getmtime(os.path.join(ck, "stage_00001.npz")) == stage1_mtime
    assert np.all(np.asarray(results[-1].status) == 0)
    J1 = 0.2319139744522318
    np.testing.assert_allclose(
        np.asarray(results[-1].obj), J1 * targets**2, rtol=1e-6
    )


def test_homotopy_kill_resume_large_batch(tmp_path):
    """Kill-resume at production batch width (B=4096; VERDICT r3 #7)."""
    system, x0_1, stages1, _ = _lqr_sweep_fixture()
    compiled = system.compiled
    B = 4096
    rng = np.random.default_rng(7)
    base_bc = np.tile(compiled.phases[0].fixed_vals, (B, 1))
    stages = []
    for lam in (0.5, 1.0):
        bc = base_bc.copy()
        bc[:, 0] = 1.0 + lam * rng.uniform(0.5, 2.0, B)
        stages.append((jnp.asarray(bc),))
    guess_b = np.tile(x0_1[:1], (B, 1)) if x0_1.ndim > 1 else np.tile(
        x0_1, (B, 1)
    )
    ck = str(tmp_path / "sweep_big")

    class Killed(RuntimeError):
        pass

    def die_after_0(k, res):
        if k == 0:
            raise Killed

    with pytest.raises(Killed):
        homotopy_sweep(
            system, guess_b, stages, on_stage=die_after_0, checkpoint_path=ck
        )
    results = homotopy_sweep(system, guess_b, stages, checkpoint_path=ck)
    assert isinstance(results[0], StageSummary)
    final = results[-1]
    assert np.all(np.asarray(final.status) == 0)
    # objective parity with the warm-started chain: J(x0) = J1 * x0^2
    J1 = 0.2319139744522318
    x0s = np.asarray(stages[-1][0])[:, 0]
    np.testing.assert_allclose(
        np.asarray(final.obj), J1 * x0s**2, rtol=1e-5
    )


def test_homotopy_sweep_lqr_bc_ramp():
    system, guess_b, stages, targets = _lqr_sweep_fixture()

    seen = []
    results = homotopy_sweep(
        system,
        guess_b,
        stages,
        on_stage=lambda k, res: seen.append(k),
    )
    assert seen == [0, 1, 2, 3]
    final = results[-1]
    assert np.all(np.asarray(final.status) == 0)
    # LQR cost scales with x(0)^2: J(x0) = J(1) * x0^2
    J1 = 0.2319139744522318
    np.testing.assert_allclose(
        np.asarray(final.obj), J1 * targets**2, rtol=1e-6
    )
    # later stages are warm-started: fewer iterations than stage 0
    assert float(np.asarray(results[-1].iterations).mean()) <= float(
        np.asarray(results[0].iterations).mean()
    )
