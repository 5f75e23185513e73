"""Interval-local derivative blocks vs the dense-AD oracle."""

import jax
import numpy as np
import pytest
import sympy as sp

import pockit_tpu.lobatto as lobatto
import pockit_tpu.radau as radau
from pockit_tpu.transcription.blocks import make_block_derivatives


def _lqr(mod):
    system = mod.System(["x_f"])
    (x_f,) = system.s
    phase = system.new_phase(["x"], ["u"])
    (x,) = phase.x
    (u,) = phase.u
    phase.set_dynamics([-x + u])
    phase.set_integral([x**2 + 0.1 * u**2])
    phase.set_boundary_condition([1], [x_f], 0, 1)
    phase.set_discretization(4, 6)
    system.set_phase([phase])
    system.set_objective(phase.I[0] + x_f**2 / 2)
    return system


def _orbit(mod):
    system = mod.System(["r_f"])
    (r_f,) = system.s
    phase = system.new_phase(["r", "u", "v"], ["phi"])
    r, u, v = phase.x
    (phi,) = phase.u
    t = phase.t
    acc = 0.1405 / (1 - 0.0749 * t)
    phase.set_dynamics(
        [u, v**2 / r - 1 / r**2 + acc * sp.sin(phi), -u * v / r + acc * sp.cos(phi)]
    )
    phase.set_phase_constraint([phi + 0.05 * r], [-9.0], [9.0])
    phase.set_boundary_condition(
        [1.0, 0.0, 1.0], [r_f, 0.0, 1 / sp.sqrt(r_f)], 0.0, 3.32
    )
    phase.set_discretization(5, 6)
    system.set_phase([phase])
    system.set_objective(-r_f)
    return system


def _free_time(mod):
    system = mod.System(0)
    phase = system.new_phase(["x", "v"], ["u"])
    x, v = phase.x
    (u,) = phase.u
    phase.set_dynamics([v, u])
    phase.set_integral([1])
    phase.set_boundary_condition([0.0, 0.0], [1.0, 0.0], 0.0, None)
    phase.set_discretization(3, 5)
    system.set_phase([phase])
    system.set_objective(phase.I[0])
    return system


@pytest.mark.parametrize(
    "builder,mod",
    [
        (_lqr, lobatto),
        (_lqr, radau),
        (_orbit, lobatto),
        (_orbit, radau),
        (_free_time, radau),
    ],
    ids=["lqr-lgl", "lqr-lgr", "orbit-lgl", "orbit-lgr", "freetime-lgr"],
)
def test_blocks_match_dense(builder, mod):
    system = builder(mod)
    p = system.p[0]
    layout, jac_blocks, hess_blocks = make_block_derivatives(system)
    rng = np.random.default_rng(0)
    z = rng.uniform(0.6, 1.2, system.L)
    m = len(system.c_lb)
    lam = rng.normal(size=m)
    fct_o = 0.8

    J_dense = np.asarray(system.jacobian(z))
    W_dense = np.asarray(system.hessian(z, lam, fct_o))

    Jb = np.asarray(jac_blocks(z))
    Wb = np.asarray(hess_blocks(z, lam, fct_o))

    cols = layout.local_cols
    N = cols.shape[0]
    rows_i = Jb.shape[1]

    # rows of interval i in the dense ordering (same gather the blocks use)
    from pockit_tpu.transcription.blocks import make_block_derivatives as _m

    # reconstruct W from scattered blocks + the pure-statics objective term
    W_rec = np.zeros_like(W_dense)
    for i in range(N):
        W_rec[np.ix_(cols[i], cols[i])] += Wb[i]
    import jax.numpy as jnp

    s = z[system.l_s : system.r_s]
    if system.n_s:
        g_hess = jax.hessian(
            lambda s_: system.F_o(
                [jnp.asarray(0.0)] * p.n_I + [s_[k] for k in range(system.n_s)]
            )
        )(jnp.asarray(s))
        W_rec[system.l_s :, system.l_s :] += fct_o * np.asarray(g_hess)
    np.testing.assert_allclose(W_rec, W_dense, rtol=1e-8, atol=1e-9)

    # Jacobian blocks: compare against the dense rows/cols restriction
    # using the same interval->row mapping the blocks module builds
    d = p.d
    n = int(d.num_point[0])
    lob = d.family == "lobatto"
    dyn_rows_i = (n - 1 if lob else n)
    pts_u = n
    for i in range(N):
        idx = []
        for v in range(p.n_x):
            r0 = v * int(d.L_d) + (i * (n - 1) if lob else int(d.l_m[i]))
            idx.extend(range(r0, r0 + dyn_rows_i))
        base_path = p.n_x * int(d.L_d)
        for c in range(p.n_c):
            r0 = base_path + c * d.L_m + int(d.l_m[i])
            idx.extend(range(r0, r0 + (n if lob else pts_u)))
        np.testing.assert_allclose(
            Jb[i], J_dense[np.ix_(idx, cols[i])], rtol=1e-8, atol=1e-10
        )
        # and the dense rows have NO entries outside the local columns
        mask = np.ones(system.L, dtype=bool)
        mask[cols[i]] = False
        assert np.max(np.abs(J_dense[np.ix_(idx, np.where(mask)[0])])) < 1e-12


@pytest.mark.parametrize("seed", range(6))
def test_blocks_random_configs(seed):
    """Random shapes/BCs: blocks must reproduce dense W exactly."""
    rng = np.random.default_rng(100 + seed)
    mod = lobatto if seed % 2 else radau
    n_x = int(rng.integers(1, 3))
    n_u = int(rng.integers(1, 3))
    n_s = int(rng.integers(1, 3))
    system = mod.System(n_s)
    s_syms = system.s
    phase = system.new_phase(n_x, n_u)
    xs, us = phase.x, phase.u
    dyn = []
    for i in range(n_x):
        expr = sum(float(rng.normal()) * x_ for x_ in xs) + sum(
            float(rng.normal()) * u_ for u_ in us
        )
        expr = expr + sp.sin(xs[i]) * float(rng.normal()) + s_syms[0] * us[0]
        dyn.append(expr)
    phase.set_dynamics(dyn)
    phase.set_integral([sum(x_**2 for x_ in xs) + s_syms[-1] * us[0]])
    if rng.random() < 0.5:
        phase.set_phase_constraint(
            [us[0] * xs[0] + s_syms[0]], [-3.0], [3.0]
        )
    bc0 = [
        (float(rng.normal()) if rng.random() < 0.5 else s_syms[0] ** 2)
        for _ in range(n_x)
    ]
    bcf = [
        (None if rng.random() < 0.5 else sp.cos(s_syms[-1]))
        for _ in range(n_x)
    ]
    t_f = None if rng.random() < 0.5 else 1.0 + s_syms[0] ** 2
    phase.set_boundary_condition(bc0, bcf, 0.0, t_f)
    phase.set_discretization(int(rng.integers(2, 5)), int(rng.integers(4, 7)))
    system.set_phase([phase])
    system.set_objective(phase.I[0] + sum(s_**2 for s_ in s_syms))

    layout, jac_blocks, hess_blocks = make_block_derivatives(system)
    z = rng.uniform(0.4, 1.1, system.L)
    m = len(system.c_lb)
    lam = rng.normal(size=m)
    fct_o = float(rng.uniform(0.2, 1.5))

    W_dense = np.asarray(system.hessian(z, lam, fct_o))
    Wb = np.asarray(hess_blocks(z, lam, fct_o))
    cols = layout.local_cols
    W_rec = np.zeros_like(W_dense)
    for i in range(cols.shape[0]):
        W_rec[np.ix_(cols[i], cols[i])] += Wb[i]
    import jax.numpy as jnp

    s = z[system.l_s :]
    g_hess = jax.hessian(
        lambda s_: system.F_o(
            [jnp.asarray(0.0)] * phase.n_I + [s_[k] for k in range(n_s)]
        )
    )(jnp.asarray(s))
    W_rec[system.l_s :, system.l_s :] += fct_o * np.asarray(g_hess)
    np.testing.assert_allclose(W_rec, W_dense, rtol=1e-7, atol=1e-8)
