"""Batched MPC sweep (BASELINE.json config 5): thousands of LQR instances
with perturbed boundary conditions solved simultaneously, then a
warm-started replan step — the pattern of real-time MPC on accelerators.

Run: python examples/mpc_sweep.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pockit_tpu.lobatto import System, constant_guess
from pockit_tpu.optimizer import ipm
from pockit_tpu.optimizer._common import preprocess
from pockit_tpu.solver import IPOptions

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

a, b, s_, q, r = -1, 1, 1, 1, 0.1
system = System(["x_f"])
(x_f,) = system.s
phase = system.new_phase(["x"], ["u"])
(x,) = phase.x
(u,) = phase.u
phase.set_dynamics([a * x + b * u])
phase.set_integral([q * x**2 + r * u**2])
phase.set_boundary_condition([1], [x_f], 0, 1)
phase.set_discretization(10, 10)
system.set_phase([phase])
system.set_objective(phase.I[0] + s_ * x_f**2 / 2)

compiled = system.compiled
x0, _ = preprocess(system, [constant_guess(phase, 0), [0.0]])

# sweep: perturbed initial conditions x(0) ~ U[0.5, 1.5]
rng = np.random.default_rng(0)
bc = np.tile(compiled.phases[0].fixed_vals, (B, 1))
bc[:, 0] = rng.uniform(0.5, 1.5, B)

opts = IPOptions(tol=2e-5, max_iter=60) if not jax.config.jax_enable_x64 else None

t0 = time.time()
res = ipm.solve_batch(
    system, np.tile(x0, (B, 1)), bc_overrides=(jnp.asarray(bc),),
    optimizer_options=opts,
)
jax.block_until_ready(res)
t_cold = time.time() - t0
conv = float(np.mean(np.asarray(res.status) == 0))
print(f"cold sweep: B={B}  {t_cold:.3f}s (incl. compile)  converged={conv:.1%}")

# MPC replan: boundary conditions drift, warm-start from previous solutions
bc2 = bc.copy()
bc2[:, 0] += rng.normal(0, 0.02, B)
t0 = time.time()
res2 = ipm.solve_batch(
    system, np.asarray(res.z), bc_overrides=(jnp.asarray(bc2),),
    optimizer_options=opts,
)
jax.block_until_ready(res2)
t_warm = time.time() - t0
conv2 = float(np.mean(np.asarray(res2.status) == 0))
print(
    f"warm replan: {t_warm:.3f}s  converged={conv2:.1%}  "
    f"mean iters {float(np.asarray(res2.iterations).mean()):.2f}  "
    f"({B / t_warm:.0f} replans/s)"
)
