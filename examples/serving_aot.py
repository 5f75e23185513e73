"""Serving with ahead-of-time solver artifacts.

A production fleet should not pay the solver's trace time (tens of
seconds) in every process. Export the batched solve once — per platform,
batch size, mesh, and option set — and serving processes deserialize the
artifact in milliseconds, going straight to (persistently cached) XLA
compilation.

Run: python examples/serving_aot.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from pockit_tpu.lobatto import System, constant_guess
from pockit_tpu.optimizer._common import preprocess
from pockit_tpu.optimizer.ipm import default_options
from pockit_tpu.utils import load_batch_solver, save_batch_solver

# -- the flagship LQR problem ------------------------------------------------
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

B = 256
ARTIFACT = "/tmp/lqr_b256.pockit_aot"

# -- build box: trace + lower once, ship the artifact ------------------------
t0 = time.time()
# dtype-appropriate tolerance (1e-8 in float64, 2e-5 in float32 — the
# f32 TPU serving case cannot reach 1e-6)
save_batch_solver(ARTIFACT, system, B, default_options())
print(f"exported {os.path.getsize(ARTIFACT)/1e6:.1f} MB in {time.time()-t0:.1f}s")

# -- serving box: deserialize (no tracing), solve sweeps ---------------------
t0 = time.time()
call = load_batch_solver(ARTIFACT)
print(f"loaded in {time.time()-t0:.3f}s (no trace)")

x0, _ = preprocess(system, [constant_guess(phase, 0), [0.0]])
rng = np.random.default_rng(0)
bc = np.tile(np.asarray(system.compiled.phases[0].fixed_vals), (B, 1))
bc[:, 0] = rng.uniform(0.5, 1.5, B)

t0 = time.time()
res = call(np.tile(x0, (B, 1)), bc)
conv = np.asarray(res.status) == 0
print(
    f"first call (compile+run) {time.time()-t0:.1f}s; "
    f"converged {conv.sum()}/{B}"
)
t0 = time.time()
bc[:, 0] = rng.uniform(0.5, 1.5, B)
res = call(np.tile(x0, (B, 1)), bc)
np.asarray(res.obj)
print(f"steady-state call {time.time()-t0:.3f}s")
