"""Iteration-count comparison of barrier strategies across the e2e gates.

Runs each gate problem once per ``mu_strategy`` in {monotone, adaptive,
mehrotra} and reports iterations / status / objective. This is the
decision harness for VERDICT r2 item 5: a candidate adaptive rule ships
as a winning option only if it beats the monotone ladder here AND drops
the LQR-batch mean iteration count (tools/profile_iter.py / bench.py).

Usage: python tools/compare_mu.py [--f32]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    if "--f32" not in sys.argv:
        jax.config.update("jax_enable_x64", True)

    import numpy as np

    from pockit_tpu.optimizer import ipm
    from pockit_tpu.solver import IPOptions

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests",
            "test_end_to_end",
        ),
    )

    gates = []

    # --- LQR (bench headline config) ---------------------------------
    def lqr():
        import bench

        system, phase, guess = bench.build_lqr()
        return system, [guess, [0.0]]

    gates.append(("lqr", lqr))

    # --- brachistochrone ----------------------------------------------
    def brach():
        import sympy as sp

        import pockit_tpu.lobatto as lobatto

        system = lobatto.System(0)
        phase = system.new_phase(["x", "y", "v"], ["theta"])
        x, y, v = phase.x
        (theta,) = phase.u
        phase.set_dynamics(
            [v * sp.sin(theta), -v * sp.cos(theta), 9.8 * sp.cos(theta)]
        )
        phase.set_integral([1])
        phase.set_boundary_condition([0, 0, 0], [2, -2, None], 0, None)
        phase.set_discretization(10, 8)
        system.set_phase([phase])
        system.set_objective(phase.I[0])
        guess = lobatto.linear_guess(phase, 0.5)
        guess.t_f = 1.0
        return system, guess

    gates.append(("brach", brach))

    # --- bang-bang min-time double integrator -------------------------
    def bang():
        import pockit_tpu.radau as radau

        system = radau.System(0)
        phase = system.new_phase(["x", "v"], ["u"])
        x, v = phase.x
        (u,) = phase.u
        t = phase.t
        phase.set_dynamics([v, u])
        phase.set_integral([1])
        phase.set_phase_constraint(
            [u, t], [-1.0, 0.5], [1.0, 6.0], bang_bang_control=[True, False]
        )
        phase.set_boundary_condition([0.0, 0.0], [1.0, 0.0], 0.0, None)
        phase.set_discretization(3, 6)
        system.set_phase([phase])
        system.set_objective(phase.I[0])
        guess = radau.linear_guess(phase, 0.5)
        guess.t_f = 3.0
        return system, guess

    gates.append(("bang", bang))

    # --- orbit transfer -------------------------------------------------
    def orbit():
        import sympy as sp

        import pockit_tpu.lobatto as lobatto
        from test_orbit_transfer import TF, T_THRUST, MDOT, _build_guess

        system = lobatto.System(["r_f"])
        (r_f,) = system.s
        phase = system.new_phase(["r", "u", "v"], ["phi"])
        r, u, v = phase.x
        (phi,) = phase.u
        t = phase.t
        acc = T_THRUST / (1 - MDOT * t)
        phase.set_dynamics(
            [
                u,
                v**2 / r - 1 / r**2 + acc * sp.sin(phi),
                -u * v / r + acc * sp.cos(phi),
            ]
        )
        phase.set_boundary_condition(
            [1.0, 0.0, 1.0], [r_f, 0.0, 1 / sp.sqrt(r_f)], 0.0, TF
        )
        phase.set_discretization(15, 8)
        system.set_phase([phase])
        system.set_objective(-r_f)
        return system, [_build_guess(phase), [1.5]]

    gates.append(("orbit", orbit))

    # --- three-phase Goddard ------------------------------------------
    def goddard():
        from test_goddard import _build, _guesses

        system, phases = _build()
        return system, _guesses(system, phases)

    gates.append(("goddard", goddard))

    strategies = ["monotone", "adaptive", "mehrotra"]
    print(f"{'gate':<10}" + "".join(f"{s:>22}" for s in strategies))
    for name, build in gates:
        row = [f"{name:<10}"]
        for strat in strategies:
            system, guess = build()
            opts = IPOptions(
                tol=1e-8 if jax.config.jax_enable_x64 else 2e-5,
                mu_strategy=strat,
            )
            try:
                _, info = ipm.solve(system, guess, opts)
                row.append(
                    f"{info['iterations']:>5d} it  st={info['status']}"
                    f" {info['obj_val']:+.4f}"[:22].rjust(22)
                )
            except Exception as exc:
                row.append(f"ERR {type(exc).__name__}"[:22].rjust(22))
        print("".join(row))


if __name__ == "__main__":
    main()
