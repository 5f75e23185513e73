"""Homotopy continuation: warm-started stages reach a target that is
reachable cold only with more iterations."""

import numpy as np
import jax.numpy as jnp

import pockit_tpu.lobatto as lobatto
from pockit_tpu.optimizer import ipm
from pockit_tpu.optimizer._common import preprocess
from pockit_tpu.parallel import homotopy_sweep


def test_homotopy_sweep_lqr_bc_ramp():
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

    # ramp x(0) from 1 to [3, 4, 5, 6] in 4 stages
    targets = np.array([3.0, 4.0, 5.0, 6.0])
    stages = []
    for lam in np.linspace(0.25, 1.0, 4):
        bc = base_bc.copy()
        bc[:, 0] = 1.0 + lam * (targets - 1.0)
        stages.append((jnp.asarray(bc),))

    seen = []
    results = homotopy_sweep(
        system,
        np.tile(x0, (B, 1)),
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
