"""README LQR example (reference: ``/root/reference/README.md:60-101``).

Run: python examples/lqr.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from pockit_tpu.lobatto import System, constant_guess
from pockit_tpu.optimizer import ipm

# LQR problem:
# min ∫_0^1 (q x^2 + r u^2) dt + s x_f^2 / 2
# s.t. x' = a x + b u, x(0) = 1
a, b, s, q, r = -1, 1, 1, 1, 0.1

system = System(["x_f"])  # one free parameter x_f
(x_f,) = system.s
phase = system.new_phase(["x"], ["u"])
(x,) = phase.x
(u,) = phase.u
phase.set_dynamics([a * x + b * u])
phase.set_integral([q * x**2 + r * u**2])
phase.set_boundary_condition([1], [x_f], 0, 1)
phase.set_discretization(10, 10)
system.set_phase([phase])
system.set_objective(phase.I[0] + s * x_f**2 / 2)

guess_p = constant_guess(phase, 0)
[var_p, var_s], info = ipm.solve(system, [guess_p, [0.0]])

print("status:", info["status_msg"].decode())
print("objective:", info["obj_val"])  # 0.2319139744522318 (pockit/IPOPT)
print("x_f:", float(var_s[0]))

# dense interpolation for plotting/export
t_out = np.linspace(0, 1, 101)
x_out = var_p.V_x(t_out) @ var_p.x[0]
u_out = var_p.V_u(t_out) @ var_p.u[0]
print("x(0.5) =", x_out[50], " u(0.5) =", u_out[50])
