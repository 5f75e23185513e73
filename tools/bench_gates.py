"""On-chip batched benches for the non-LQR gate configurations.

VERDICT r2 item 2: the block-arrow path's O(N·n^3) scaling advantage at
larger meshes was argued analytically (BENCH_NOTES) but only the 10x10
LQR had ever been timed on chip. This times two more configurations:

- orbit transfer at a 40x10 Radau mesh (the mesh `solver/structured.py`
  uses for its flop-count claim): 400 collocation points, L~=1645;
- the 3-phase Goddard rocket (linked phases, FUNC interior times,
  path-constrained thrust): the multi-phase block pattern.

Protocol (CLAUDE.md tunnel rules): fresh boundary-condition draws per
timed repetition; completion forced by the host-numpy returns of
``solve_batch_drained``; lane 0 stays at the nominal problem so objective
parity is checkable even though the rest of the batch is perturbed.

Usage: python tools/bench_gates.py [B] [gates...]   (default B=1024, both)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T_THRUST, MDOT, TF = 0.1405, 0.0749, 3.32
R_F_KNOWN = 1.5253
U_MAX, C_EX, D0, BETA, MF = 3.5, 0.5, 310.0, 500.0, 0.6
H_STAR = 1.012837


def build_orbit():
    """Max-radius orbit transfer on a 40x10 Radau mesh (f32-solvable)."""
    import sympy as sp

    import pockit_tpu.radau as radau

    system = radau.System(["r_f"])
    (r_f,) = system.s
    phase = system.new_phase(["r", "u", "v"], ["phi"])
    r, u, v = phase.x
    (phi,) = phase.u
    t = phase.t
    acc = T_THRUST / (1 - MDOT * t)
    phase.set_dynamics(
        [u, v**2 / r - 1 / r**2 + acc * sp.sin(phi),
         -u * v / r + acc * sp.cos(phi)]
    )
    phase.set_boundary_condition(
        [1.0, 0.0, 1.0], [r_f, 0.0, 1 / sp.sqrt(r_f)], 0.0, TF
    )
    phase.set_discretization(40, 10)
    system.set_phase([phase])
    system.set_objective(-r_f)
    guess = radau.linear_guess(phase, 1.0)
    guess.x[0] = 1.0 + 0.5 * phase.t_x
    guess.x[1] = 0.1
    guess.x[2] = 1.0
    guess.u[0] = 0.5
    return system, [guess, [1.5]]


def orbit_bc(compiled, B, rng):
    # fixed_vals order: x0 FIXED (r,u,v), u_f, t0, tf. Perturbed circular
    # starts: r0 ~ U(0.99, 1.03), v0 = 1/sqrt(r0); lane 0 nominal.
    bc = np.tile(compiled.phases[0].fixed_vals, (B, 1))
    r0 = rng.uniform(0.99, 1.03, B)
    r0[0] = 1.0
    bc[:, 0] = r0
    bc[:, 2] = 1.0 / np.sqrt(r0)
    return (bc,)


def build_goddard():
    import sympy as sp

    import pockit_tpu.radau as radau

    system = radau.System(
        ["t_a", "t_b", "t_f", "h_a", "v_a", "m_a", "h_b", "v_b", "h_f"]
    )
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
    return system, guesses + [statics]


def goddard_bc(compiled, B, rng):
    # p1 fixed_vals: BC slots [h0, v0, m0, t0] first, then the pinned
    # control slots (u pinned to U_MAX in phase 1, to 0 in phase 3 —
    # pinned lb==ub variables append AFTER the BC slots); perturb launch
    # mass m0 (slot 2); lane 0 nominal. p2/p3 fixed values (the MF slots
    # and p3's pinned-u slots) stay as configured.
    bcs = []
    for i, cp in enumerate(compiled.phases):
        bc = np.tile(cp.fixed_vals, (B, 1))
        if i == 0:
            m0 = rng.uniform(0.97, 1.03, B)
            m0[0] = 1.0
            bc[:, 2] = m0
        bcs.append(bc)
    return tuple(bcs)


GATES = {
    "orbit": (build_orbit, orbit_bc, 60, ("r_f", -R_F_KNOWN)),
    # mehrotra: on the singular-arc Goddard in f32, the monotone ladder
    # hovers at KKT ~2-5e-5 for 120 iters (permanent inertia
    # regularization bias); the Mehrotra probe converges in 14
    "goddard": (build_goddard, goddard_bc, 60, ("h_f", -H_STAR)),
}
GATE_MU = {"goddard": "mehrotra"}
# f32 KKT floor on the singular-arc Goddard is ~2-5e-5 (the inertia
# regularization the singular reduced Hessian forces biases the step);
# 5e-5 converges every perturbed lane, 2e-5 strands ~40%
GATE_TOL_F32 = {"goddard": 5e-5}
# f32 inertia-detectability floors (IPOptions.delta_w_min): both gates
# carry negative curvature far below the f32 pivot noise band, where
# Cholesky breakdown is a backend-dependent coin flip — the TPU's
# rounding accepts indefinite factorizations the CPU's rejects, and the
# resulting directions wreck the batch (measured: goddard 6.9%%
# converged on chip at floor 0 vs 100%% at 1e-1; see BENCH_NOTES r5).
# The floor is released in the endgame so tolerance is still reachable.
GATE_DWMIN_F32 = {"goddard": 1e-1, "orbit": 3e-3}


def run_gate(name, B, n_rep=3):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    from pockit_tpu.optimizer import ipm
    from pockit_tpu.optimizer._common import preprocess
    from pockit_tpu.solver import IPOptions

    build, draw, first_iters, (obj_name, obj_star) = GATES[name]
    system, guess = build()
    x0, _ = preprocess(system, guess)
    compiled = system.compiled
    x0b = jnp.asarray(np.tile(x0, (B, 1)))
    rng = np.random.default_rng(0)

    on_tpu = jax.default_backend() != "cpu"
    f32 = not jax.config.jax_enable_x64
    tol = GATE_TOL_F32.get(name, 1e-5) if f32 else 1e-7
    mu = GATE_MU.get(name, "monotone") if f32 else "monotone"
    dwmin = GATE_DWMIN_F32.get(name, 0.0) if f32 else 0.0
    opts_fast = IPOptions(
        tol=tol, max_iter=first_iters, refine_steps=3, mu_strategy=mu,
        delta_w_min=dwmin,
    )
    opts_drain = IPOptions(
        tol=tol, max_iter=120, refine_steps=3, mu_strategy=mu,
        delta_w_min=dwmin,
    )

    def solve_all(bc):
        return ipm.solve_batch_drained(
            system, x0b, bc,
            optimizer_options=opts_drain,
            first_pass_options=opts_fast,
        )

    t0 = time.time()
    status, obj, iters, _ = solve_all(draw(compiled, B, rng))
    compile_s = time.time() - t0

    walls, convs, objs0, iter_means = [], [], [], []
    for _ in range(n_rep):
        bc = draw(compiled, B, rng)
        t0 = time.time()
        status, obj, iters, _ = solve_all(bc)
        walls.append(time.time() - t0)
        convs.append(float(np.mean(status == 0)))
        objs0.append(float(obj[0]))
        iter_means.append(float(np.mean(iters)))

    dt = float(np.median(walls))
    rec = {
        "gate": name,
        "B": B,
        "solves_per_s": round(B / dt, 1),
        "wall_s_per_batch": round(dt, 3),
        "converged_frac": round(float(np.mean(convs)), 4),
        "mean_iters": round(float(np.mean(iter_means)), 2),
        "compile_s": round(compile_s, 1),
        obj_name: round(-float(np.mean(objs0)), 6),
        "parity_err_lane0": round(abs(float(np.mean(objs0)) - obj_star), 6),
        "platform": jax.devices()[0].platform,
        "L": int(system.L),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    args = [a for a in sys.argv[1:]]
    B = int(args.pop(0)) if args and args[0].isdigit() else 1024
    names = args or list(GATES)
    for name in names:
        run_gate(name, B)


if __name__ == "__main__":
    main()
