"""Brachistochrone with free final time (BASELINE.json config 2).

Minimum-time descent from (0, 0) to (2, 2) under gravity, Radau mesh, with
the solve -> check -> refine loop driving the collocation residual below
tolerance. The optimum is the cycloid; T* ≈ 0.81647 for g = 10.

Run: python examples/brachistochrone.py
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

G, X_F, Y_F = 10.0, 2.0, 2.0

system = radau.System(0)
phase = system.new_phase(["x", "y", "v"], ["theta"])
x, y, v = phase.x
(theta,) = phase.u
phase.set_dynamics([v * sp.sin(theta), v * sp.cos(theta), G * sp.cos(theta)])
phase.set_integral([1])
phase.set_phase_constraint([theta], [0.0], [np.pi])
phase.set_boundary_condition([0.0, 0.0, 0.0], [X_F, Y_F, None], 0.0, None)
phase.set_discretization(6, 7)
system.set_phase([phase])
system.set_objective(phase.I[0])

guess = radau.linear_guess(phase, 1.0)
guess.x[2] = 5.0 * phase.t_x  # ramp speed: v = 0 everywhere is singular
guess.u[0] = 1.0
guess.t_f = 1.0

var, info = ipm.solve(system, guess)
print("initial solve:", info["status_msg"].decode(), "T =", info["obj_val"])

for round_ in range(5):
    if system.check(var):
        break
    var = system.refine(var)
    var, info = ipm.solve(system, var)
    print(f"refine round {round_}: N = {phase.N}, T = {info['obj_val']:.10f}")

print("final time:", var.t_f - var.t_0)
print("mesh check passed:", system.check(var))
