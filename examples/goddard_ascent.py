"""Three-phase rocket ascent (Goddard problem, normalized units) —
BASELINE.json config 4: linked phases with linkage conditions and path
constraints.

    max h(t_f)
    h' = v,  v' = (u - D(h, v)) / m - 1 / h²,  m' = -u / c
    D(h, v) = D0 v² exp(-beta (h - 1)),  0 <= u <= u_max
    h(0) = 1, v(0) = 0, m(0) = 1, m(t_f) = 0.6

The optimal thrust is bang-singular-bang: full thrust, a singular arc, then
coast. Phase boundaries are free (statics t_a, t_b, t_f); states link
through statics via FUNC boundary conditions. The classic optimum for
these parameters is h* ≈ 1.01284.

Run: python examples/goddard_ascent.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)  # demo scripts favor accuracy

import numpy as np
import sympy as sp

import pockit_tpu.radau as radau
from pockit_tpu.optimizer import ipm

U_MAX, C_EX, D0, BETA = 3.5, 0.5, 310.0, 500.0
M0, MF = 1.0, 0.6

system = radau.System(
    ["t_a", "t_b", "t_f", "h_a", "v_a", "m_a", "h_b", "v_b", "h_f"]
)
t_a, t_b, t_f, h_a, v_a, m_a, h_b, v_b, h_f = system.s


def make_phase(u_lb, u_ub, bc0, bcf, t0, t1, mesh, deg):
    ph = system.new_phase(["h", "v", "m"], ["u"])
    h, v, m = ph.x
    (u,) = ph.u
    drag = D0 * v**2 * sp.exp(-BETA * (h - 1))
    ph.set_dynamics([v, (u - drag) / m - 1 / h**2, -u / C_EX])
    ph.set_phase_constraint([u], [u_lb], [u_ub])
    ph.set_boundary_condition(bc0, bcf, t0, t1)
    ph.set_discretization(mesh, deg)
    return ph


# phase 1: full thrust
p1 = make_phase(
    U_MAX, U_MAX, [1.0, 0.0, 1.0], [h_a, v_a, m_a], 0.0, t_a, 4, 7
)
# phase 2: singular arc (free thrust), burns the remaining fuel
p2 = make_phase(
    0.0, U_MAX, [h_a, v_a, m_a], [h_b, v_b, MF], t_a, t_b, 4, 7
)
# phase 3: coast to apex
p3 = make_phase(0.0, 0.0, [h_b, v_b, MF], [h_f, 0.0, MF], t_b, t_f, 4, 7)

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

statics0 = [0.023, 0.068, 0.2, 1.005, 0.1, 0.8, 1.01, 0.05, 1.0128]
result, info = ipm.solve(system, guesses + [statics0])
print("status:", info["status_msg"].decode())
statics = result[-1]
names = ["t_a", "t_b", "t_f", "h_a", "v_a", "m_a", "h_b", "v_b", "h_f"]
for n, v_ in zip(names, statics):
    print(f"  {n} = {float(v_):.6f}")
print("max altitude:", float(statics[-1]), "(classic optimum ~1.01284)")
