"""CI gate for the r4 bf16-staging hazard (BENCH_NOTES "bf16
custom_vmap-rule bug").

TPU lowers float32 dots at DEFAULT precision as single-pass bfloat16.
The solver forces ``jax.default_matmul_precision("highest")``, but that
context does NOT reach code jax stages outside its dynamic extent —
custom_vmap batching rules, shard_map bodies, late-staged factories —
so an einsum there silently compiles at DEFAULT: exact f32 on CPU (tests
stay green by construction) while the chip truncates 1e5-scale KKT
entries into garbage Newton directions. That regression cost two days of
chip time in round 4 and is invisible to every value-level test on CPU.

This test pins the builder's own diagnostic as CI: lower the FULL
batched solver program (the pallas path, whose custom_vmap rules are
where the bug lived) and assert that not a single dot carries DEFAULT
precision. ``jax.jit(...).lower()`` reproduces the staging on any
backend; the lowering runs in a subprocess with x64 disabled so the
traced program is exactly the float32 program production compiles (the
main suite's forced float64 would otherwise promote through the numpy
placement constants).
"""

import json
import subprocess
import sys

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
assert not jax.config.jax_enable_x64
import json, re
import numpy as np
import jax.numpy as jnp
from pockit_tpu.lobatto import System, constant_guess
from pockit_tpu.optimizer.ipm import _solver_for
from pockit_tpu.solver import IPOptions, broadcast_bounds

system = System(["x_f"])
(x_f,) = system.s
phase = system.new_phase(["x"], ["u"])
(x,) = phase.x
(u,) = phase.u
phase.set_dynamics([-x + u])
phase.set_integral([x**2 + 0.1 * u**2])
phase.set_boundary_condition([1], [x_f], 0, 1)
phase.set_discretization(10, 10)
system.set_phase([phase])
system.set_objective(phase.I[0] + x_f**2 / 2)
compiled = system.compiled

# the flagship first-pass configuration on the pallas path (its
# custom_vmap batching rules are the staging surface that regressed)
opts = IPOptions(
    tol=5e-6, max_iter=4, refine_steps=3, max_ls=4,
    soc=False, feasibility_fallback=False, kkt_solver="pallas",
)
_, solve_fn, bounds0 = _solver_for(system, opts)
B = 8
bounds_b = broadcast_bounds(bounds0, B)
n_bc = len(compiled.phases[0].fixed_vals)
rt = {"bc": (jnp.zeros((B, n_bc), jnp.float32),)}
z = jnp.zeros((B, compiled.L), jnp.float32)

txt = jax.jit(jax.vmap(solve_fn)).lower(z, bounds_b, rt).as_text()
bad = re.findall(r"precision = \[[^\]]*DEFAULT[^\]]*\]", txt)
print(json.dumps({
    "n_highest": txt.count("precision = [HIGHEST"),
    "n_default": len(bad),
    "first_bad": bad[0] if bad else "",
}))
"""


def test_no_default_precision_dots_in_batched_solver():
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT], capture_output=True, text=True,
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    # the program must actually contain the solver's dots (a trivially
    # empty lowering would pass the zero-DEFAULT check vacuously)
    assert out["n_highest"] > 100, out
    assert out["n_default"] == 0, (
        f"{out['n_default']} dot(s) lowered at DEFAULT matmul precision — "
        "on TPU these compile to single-pass bfloat16 and silently poison "
        "the solver (r4 post-mortem). First offender: " + out["first_bad"]
    )
