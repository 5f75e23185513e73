"""AOT solver artifacts: export -> serialize -> reload -> parity."""

import numpy as np
import pytest

import pockit_tpu.lobatto as lobatto
from pockit_tpu.optimizer import ipm
from pockit_tpu.optimizer._common import preprocess
from pockit_tpu.solver import IPOptions
from pockit_tpu.utils import load_batch_solver, save_batch_solver


def _lqr():
    system = lobatto.System(["x_f"])
    (x_f,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([-x + u])
    phase.set_integral([x**2 + 0.1 * u**2])
    phase.set_boundary_condition([1], [x_f], 0, 1)
    phase.set_discretization(6, 7)
    system.set_phase([phase])
    system.set_objective(phase.I[0] + x_f**2 / 2)
    return system, phase


def test_aot_roundtrip_matches_live_solve(tmp_path):
    system, phase = _lqr()
    guess = lobatto.constant_guess(phase, 0)
    x0, _ = preprocess(system, [guess, [0.0]])
    B = 8
    rng = np.random.default_rng(0)
    bc = np.tile(np.asarray(system.compiled.phases[0].fixed_vals), (B, 1))
    bc[:, 0] = rng.uniform(0.5, 1.5, B)
    opts = IPOptions(tol=1e-9)

    path = tmp_path / "lqr_b8.pockit_aot"
    save_batch_solver(path, system, B, opts)
    assert path.stat().st_size > 0

    call = load_batch_solver(path)
    res_aot = call(np.tile(x0, (B, 1)), bc)

    res_live = ipm.solve_batch(
        system, np.tile(x0, (B, 1)), bc_overrides=(bc,), optimizer_options=opts
    )
    assert np.all(np.asarray(res_aot.status) == 0)
    # the exported program bakes bounds in as constants while the live path
    # passes them as arguments — XLA may fuse the two programs differently,
    # so compare tightly rather than bit-exactly
    np.testing.assert_allclose(
        np.asarray(res_aot.obj), np.asarray(res_live.obj), rtol=1e-12, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(res_aot.z), np.asarray(res_live.z), rtol=0, atol=1e-10
    )

    # bytes round-trip without touching disk
    blob = path.read_bytes()
    call2 = load_batch_solver(blob)
    res2 = call2(np.tile(x0, (B, 1)), bc)
    np.testing.assert_array_equal(np.asarray(res2.z), np.asarray(res_aot.z))  # same artifact: bitwise


def test_aot_rejects_wrong_batch_shape(tmp_path):
    system, phase = _lqr()
    guess = lobatto.constant_guess(phase, 0)
    x0, _ = preprocess(system, [guess, [0.0]])
    path = tmp_path / "b4.pockit_aot"
    save_batch_solver(path, system, 4, IPOptions(tol=1e-9))
    call = load_batch_solver(path)
    bc = np.tile(np.asarray(system.compiled.phases[0].fixed_vals), (8, 1))
    with pytest.raises(Exception):
        call(np.tile(x0, (8, 1)), bc)  # artifact pinned to B=4


def test_install_skips_trace_and_matches(tmp_path):
    """install_batch_solver / install_drain_round pre-populate the ipm jit
    caches so solve_batch / solve_batch_drained run the artifact instead of
    tracing; results must match the traced path."""
    from pockit_tpu.utils.aot import (
        export_batch_solver,
        export_drain_round,
        install_batch_solver,
        install_drain_round,
    )

    system, phase = _lqr()
    guess = lobatto.constant_guess(phase, 0)
    x0, _ = preprocess(system, [guess, [0.0]])
    B, Bd = 8, 4
    rng = np.random.default_rng(1)
    bc = np.tile(np.asarray(system.compiled.phases[0].fixed_vals), (B, 1))
    bc[:, 0] = rng.uniform(0.5, 1.5, B)
    gb = np.tile(x0, (B, 1))

    opts_fast = IPOptions(tol=1e-9, max_iter=3)  # guarantees stragglers
    opts_drain = IPOptions(tol=1e-9, max_iter=60)

    # traced reference first (fresh caches)
    st_ref, obj_ref, it_ref, z_ref = ipm.solve_batch_drained(
        system,
        gb,
        bc_overrides=(bc,),
        optimizer_options=opts_drain,
        first_pass_options=opts_fast,
        drain_frac=B // Bd,
    )
    assert np.all(st_ref == 0)

    # wipe the jit caches, install artifacts, re-run
    compiled = system.compiled
    compiled._ipm_cache.pop((opts_fast, "vmap"), None)
    compiled._ipm_cache.pop((opts_drain, "drain_round"), None)
    install_batch_solver(
        system, opts_fast, export_batch_solver(system, B, opts_fast)
    )
    install_drain_round(
        system, opts_drain, export_drain_round(system, B, Bd, opts_drain)
    )
    assert (opts_fast, "vmap") in compiled._ipm_cache
    st, obj, it, z = ipm.solve_batch_drained(
        system,
        gb,
        bc_overrides=(bc,),
        optimizer_options=opts_drain,
        first_pass_options=opts_fast,
        drain_frac=B // Bd,
    )
    np.testing.assert_array_equal(st, st_ref)
    np.testing.assert_allclose(obj, obj_ref, rtol=1e-10, atol=0)
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(z_ref), rtol=0, atol=1e-9
    )

    # artifact names are platform/version/precision-stamped
    from pockit_tpu.utils.aot import artifact_name

    name = artifact_name("bench_lqr_firstpass", B)
    assert f"B{B}" in name and name.endswith(".stablehlo")
