"""Three-phase Goddard rocket ascent (BASELINE config 4): linked phases,
free interior times, bang-singular-bang thrust, known optimum h* ≈ 1.01284.
Also exercises checkpoint/resume round-tripping on a multi-phase system.
"""

import numpy as np
import pytest
import sympy as sp

import pockit_tpu.radau as radau
from pockit_tpu.optimizer import ipm
from pockit_tpu.utils import load_solution, save_solution

U_MAX, C_EX, D0, BETA = 3.5, 0.5, 310.0, 500.0
MF = 0.6
H_STAR = 1.012837


def _build():
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
    return system, (p1, p2, p3)


def _guesses(system, phases):
    guesses = []
    for ph, (h0, h1), (vv0, vv1), (mm0, mm1), uu in [
        (phases[0], (1.0, 1.005), (0.0, 0.1), (1.0, 0.8), U_MAX),
        (phases[1], (1.005, 1.01), (0.1, 0.05), (0.8, MF), 1.0),
        (phases[2], (1.01, 1.013), (0.05, 0.0), (MF, MF), 0.0),
    ]:
        g = radau.linear_guess(ph, 0.5)
        g.x[0] = h0 + (h1 - h0) * ph.t_x
        g.x[1] = vv0 + (vv1 - vv0) * ph.t_x
        g.x[2] = mm0 + (mm1 - mm0) * ph.t_x
        g.u[0] = uu
        guesses.append(g)
    return guesses + [[0.023, 0.068, 0.2, 1.005, 0.1, 0.8, 1.01, 0.05, 1.0128]]


def test_goddard_three_phase(tmp_path):
    system, phases = _build()
    result, info = ipm.solve(system, _guesses(system, phases))
    assert info["status"] == 0, info
    statics = result[-1]
    assert float(statics[-1]) == pytest.approx(H_STAR, abs=5e-4)
    # singular-arc structure: full thrust phase 1, coast phase 3
    assert np.all(np.abs(result[0].u[0] - U_MAX) < 1e-6)
    assert np.all(np.abs(result[2].u[0]) < 1e-6)
    # phase times are ordered
    t_a, t_b, t_f = (float(statics[i]) for i in range(3))
    assert 0 < t_a < t_b < t_f

    # checkpoint round trip: save, reload, warm-start re-solve in ~1 iter
    path = str(tmp_path / "goddard.npz")
    save_solution(path, system, result)
    value = load_solution(path, system)
    for v_new, v_old in zip(value[:3], result[:3]):
        np.testing.assert_array_equal(v_new.data, v_old.data)
    result2, info2 = ipm.solve(system, value)
    assert info2["status"] == 0
    assert info2["iterations"] <= info["iterations"]
    assert float(result2[-1][-1]) == pytest.approx(float(statics[-1]), abs=1e-7)
