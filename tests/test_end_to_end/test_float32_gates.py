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


_GODDARD = _PRELUDE + """
# exercises three float32-robustness mechanisms at once:
# - extreme-coefficient exp folding (sympy splits 310*exp(-500*(h-1))
#   into 4.35e219*exp(-500*h), inf in f32 without the fold);
# - pinned (lb == ub) controls substituted as parameters (an equal-bound
#   box has an empty f32 barrier interior -> inf duals at init);
# - the Mehrotra probe (the monotone ladder hovers at KKT ~2-5e-5 on the
#   singular arc; mehrotra converges in ~14 iterations).
import sympy as sp
from pockit_tpu.solver import IPOptions
U_MAX, C_EX, D0, BETA, MF = 3.5, 0.5, 310.0, 500.0, 0.6
system = radau.System(["t_a", "t_b", "t_f", "h_a", "v_a", "m_a",
                       "h_b", "v_b", "h_f"])
t_a, t_b, t_f, h_a, v_a, m_a, h_b, v_b, h_f = system.s
def make_phase(u_lb, u_ub, bc0, bcf, t0, t1):
    ph = system.new_phase(["h", "v", "m"], ["u"])
    h, v, m = ph.x
    (u,) = ph.u
    drag = D0 * v**2 * sp.exp(-BETA * (h - 1))
    ph.set_dynamics([v, (u - drag) / m - 1 / h**2, -u / C_EX])
    ph.set_phase_constraint([u], [u_lb], [u_ub])
    ph.set_boundary_condition(bc0, bcf, t0, t1)
    ph.set_discretization(4, 7)
    return ph
p1 = make_phase(U_MAX, U_MAX, [1.0, 0.0, 1.0], [h_a, v_a, m_a], 0.0, t_a)
p2 = make_phase(0.0, U_MAX, [h_a, v_a, m_a], [h_b, v_b, MF], t_a, t_b)
p3 = make_phase(0.0, 0.0, [h_b, v_b, MF], [h_f, 0.0, MF], t_b, t_f)
system.set_phase([p1, p2, p3])
system.set_objective(-h_f)
guesses = []
for ph, (h0, h1), (vv0, vv1), (mm0, mm1), uu in [
    (p1, (1.0, 1.005), (0.0, 0.1), (1.0, 0.8), U_MAX),
    (p2, (1.005, 1.01), (0.1, 0.05), (0.8, MF), 1.0),
    (p3, (1.01, 1.013), (0.05, 0.0), (MF, MF), 0.0),
]:
    g = radau.linear_guess(ph, 0.5)
    g.x[0] = h0 + (h1 - h0) * ph.t_x
    g.x[1] = vv0 + (vv1 - vv0) * ph.t_x
    g.x[2] = mm0 + (mm1 - mm0) * ph.t_x
    g.u[0] = uu
    guesses.append(g)
statics = [0.023, 0.068, 0.2, 1.005, 0.1, 0.8, 1.01, 0.05, 1.0128]
opts = IPOptions(tol=1e-5, max_iter=60, refine_steps=3,
                 mu_strategy="mehrotra")
result, info = ipm.solve(system, guesses + [statics],
                         optimizer_options=opts)
# pinned controls must come back at their pinned values
u1 = np.asarray(result[0].u[0])
u3 = np.asarray(result[2].u[0])
print(json.dumps({"status": info["status"], "h_f": float(result[-1][-1]),
                  "iters": info["iterations"],
                  "u1_err": float(np.max(np.abs(u1 - U_MAX))),
                  "u3_err": float(np.max(np.abs(u3)))}))
"""


def test_f32_goddard_gate():
    out = _run(_GODDARD)
    assert out["status"] == 0
    assert out["h_f"] == pytest.approx(1.012837, abs=1e-3)
    assert out["iters"] <= 40
    assert out["u1_err"] < 1e-6
    assert out["u3_err"] < 1e-6
