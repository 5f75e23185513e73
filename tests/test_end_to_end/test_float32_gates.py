"""Float32 end-to-end gates on CPU (VERDICT round-1, item 7).

The conftest forces float64 for the main suite, so the float32 numerics
(Jacobi equilibration, dtype-scaled regularization floors, saddle-point
refinement) were previously validated only by ``bench.py`` on live TPU
hardware. These gates pin them in CI: each runs the solver in a
subprocess with x64 disabled (JAX default = float32) on the CPU backend,
over the default (block) KKT path.
"""

import json
import subprocess
import sys

import pytest

_PRELUDE = """
import jax
jax.config.update("jax_platforms", "cpu")
import json
import numpy as np
import sympy as sp
import pockit_tpu.lobatto as lobatto
import pockit_tpu.radau as radau
from pockit_tpu.optimizer import ipm
assert not jax.config.jax_enable_x64
"""

_LQR = _PRELUDE + """
system = lobatto.System(["x_f"])
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
val, info = ipm.solve(system, [lobatto.constant_guess(phase, 0), [0.0]])
print(json.dumps({"status": info["status"], "obj": info["obj_val"],
                  "iters": info["iterations"]}))
"""

_BANG_BANG = _PRELUDE + """
system = radau.System(0)
phase = system.new_phase(["x", "v"], ["u"])
x, v = phase.x
(u,) = phase.u
phase.set_dynamics([v, u])
phase.set_integral([1])
phase.set_phase_constraint([u], [-1.0], [1.0], bang_bang_control=True)
phase.set_boundary_condition([0.0, 0.0], [1.0, 0.0], 0.0, None)
phase.set_discretization(5, 7)
system.set_phase([phase])
system.set_objective(phase.I[0])
guess = radau.linear_guess(phase, 0.5)
guess.t_f = 3.0
val, info = ipm.solve(system, guess)
st1 = info["status"]
val = system.refine(val)
val, info = ipm.solve(system, val)
switch_gap = float(np.min(np.abs(np.asarray(phase._mesh) - 0.5)))
print(json.dumps({"status": max(st1, info["status"]), "obj": info["obj_val"],
                  "switch_gap": switch_gap}))
"""

_ORBIT = _PRELUDE + """
T_THRUST, MDOT, TF = 0.1405, 0.0749, 3.32
system = lobatto.System(["r_f"])
(r_f,) = system.s
phase = system.new_phase(["r", "u", "v"], ["phi"])
r, u, v = phase.x
(phi,) = phase.u
t = phase.t
acc = T_THRUST / (1 - MDOT * t)
phase.set_dynamics([u, v**2 / r - 1 / r**2 + acc * sp.sin(phi),
                    -u * v / r + acc * sp.cos(phi)])
phase.set_boundary_condition([1.0, 0.0, 1.0], [r_f, 0.0, 1 / sp.sqrt(r_f)],
                             0.0, TF)
phase.set_discretization(15, 8)
system.set_phase([phase])
system.set_objective(-r_f)
guess = lobatto.linear_guess(phase, 1.0)
guess.x[0] = 1.0 + 0.5 * phase.t_x
guess.x[1] = 0.1
guess.x[2] = 1.0
guess.u[0] = 0.5
result, info = ipm.solve(system, [guess, [1.5]])
print(json.dumps({"status": info["status"], "r_f": float(result[1][0]),
                  "iters": info["iterations"]}))
"""


def _run(script: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_f32_lqr_gate():
    out = _run(_LQR)
    assert out["status"] == 0
    # float32 parity against the published float64 objective
    assert out["obj"] == pytest.approx(0.2319139744522318, abs=5e-6)
    assert out["iters"] <= 12


def test_f32_bang_bang_gate():
    out = _run(_BANG_BANG)
    assert out["status"] == 0
    assert out["obj"] == pytest.approx(2.0, abs=5e-4)
    # refinement placed a border at the analytic switch (scaled 0.5)
    assert out["switch_gap"] < 2e-2


def test_f32_orbit_gate():
    out = _run(_ORBIT)
    assert out["status"] == 0
    assert out["r_f"] == pytest.approx(1.5253, abs=5e-3)


_ISOPERIMETRIC = _PRELUDE + """
# Lagrangian-head gate: a system constraint on a nonlinear-integrand
# integral exercises the current-point alpha weighting and the f32
# pattern-preconditioned CG correction on the default (block) path
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
val, info = ipm.solve(system, [lobatto.constant_guess(phase, 0), [0.0]])
print(json.dumps({"status": info["status"], "obj": info["obj_val"],
                  "iters": info["iterations"]}))
"""


def test_f32_isoperimetric_gate():
    out = _run(_ISOPERIMETRIC)
    assert out["status"] == 0
    # f64 reference for this configuration (dense and block paths agree):
    # the energy bound binds, objective 0.2515982153412504
    assert out["obj"] == pytest.approx(0.2515982153, abs=5e-5)
    assert out["iters"] <= 40
