"""Bang-bang (discontinuous) mesh refinement.

Places mesh points at control switch times, found as real roots of the
interpolating polynomial of the scaled bang-bang function minus 1/2, and
nudges interval borders toward suspected switches in unsaturated intervals.
Behavioral port of the reference algorithm
(``/root/reference/pockit/base/phasebase.py:1580-1828, 2241-2305``); all
work is host-side numpy at refinement time.
"""

from __future__ import annotations

import numpy as np

_SHOCK_THRESHOLD = 0.1
_FACTOR = 1.0


def _switch_roots(y: np.ndarray, P_fn) -> np.ndarray:
    """Real roots in (-1, 1) of the polynomial interpolating ``y`` on the
    family's reference nodes (reference: ``_find_root_discontinuous``)."""
    coef = P_fn(len(y)) @ y
    roots = np.roots(coef)
    filtered = sorted(
        float(r.real) for r in roots if np.isreal(r) and -1.0 < r.real < 1.0
    )
    return np.array(filtered)


def _classify(f, dtol):
    if f is None:
        return -100
    if f < dtol:
        return 0
    if f > 1 - dtol:
        return 1
    return 10


def _boundary_ok(f_ll, f_lr, f_rl, f_rr, dtol):
    """Whether the left/right borders of an unsaturated interval look
    consistent (no hidden switch at the border)."""
    c_l = _classify(f_ll, dtol) + _classify(f_lr, dtol)
    c_r = _classify(f_rl, dtol) + _classify(f_rr, dtol)
    return c_l <= 2, c_r <= 2


def _clean_mesh(mesh_new, mesh_old, length_min, length_max):
    """Sort/filter candidate mesh points, merging too-dense points (keeping
    old mesh points when possible) and splitting too-sparse gaps
    (reference: ``_mesh_gen_discontinuous``)."""
    mesh_new = sorted(mesh_new)
    mesh = [0.0]
    for m_ in mesh_new:
        if length_min < m_ < 1 - length_min:
            mesh.append(m_)
    mesh.append(1.0)

    old = set(np.asarray(mesh_old).tolist())
    clean = [0.0]
    for i in range(len(mesh) - 1):
        m_ = mesh[i + 1]
        if m_ - clean[-1] < length_min:  # too dense
            if clean[-1] in old:
                clean[-1] = m_
            elif m_ in old:
                pass
            else:
                clean[-1] = (m_ + clean[-1]) / 2
            continue
        if m_ - clean[-1] > length_max:  # too sparse
            last = clean[-1]
            n_split = int(np.ceil((m_ - last) / length_max))
            for j in range(n_split):
                clean.append(last + (m_ - last) * (j + 1) / n_split)
            continue
        clean.append(m_)
    return np.array(clean)


def refine_discontinuous_mesh(
    phase,
    f_bb: np.ndarray,
    dtol: float,
    num_point_min: int,
    num_point_max: int,
    mesh_length_min: float,
    mesh_length_max: float,
):
    """Return ``(mesh_new, num_point_new)`` for the next solve iteration."""
    mesh = phase._mesh
    N = phase.N
    n_b = phase.n_b
    l_m, r_m = phase.l_m, phase.r_m
    d = phase.d

    # mean of each bang-bang function per interval (quadrature on [-1, 1])
    f_mean = np.empty((n_b, N))
    for m_ in range(N):
        w = d.w_itv[m_]
        for b_ in range(n_b):
            f_mean[b_, m_] = w @ f_bb[b_, l_m[m_] : r_m[m_]] / 2

    # interior mesh points with no shock across them can be dropped/merged
    no_shock = set()
    for p_ in range(1, N):
        if all(
            abs(f_mean[b_, p_ - 1] - f_mean[b_, p_]) <= _SHOCK_THRESHOLD
            for b_ in range(n_b)
        ):
            no_shock.add(p_)

    mesh_new: list[float] = []
    to_delete: set[int] = set()
    ok = np.zeros((n_b, N), dtype=bool)
    index_mid = N // 2

    def _seg(b_, m_):
        return f_bb[b_, l_m[m_] : r_m[m_]]

    def _process_roots(b_, m_, reverse: bool):
        mesh_l, mesh_r = mesh[m_], mesh[m_ + 1]
        mesh_m = (mesh_l + mesh_r) / 2
        mesh_d = mesh_r - mesh_l
        seg = _seg(b_, m_)
        if np.any(seg < 0.5) and np.any(seg > 0.5):
            roots = _switch_roots(seg - 0.5, phase.d.P) * mesh_d / 2 + mesh_m
            for root in (reversed(roots) if reverse else roots):
                near_l = root < mesh_l + mesh_length_min
                near_r = root > mesh_r - mesh_length_min
                first, second = (near_r, near_l) if reverse else (near_l, near_r)
                if first:
                    idx = m_ + 1 if reverse else m_
                    if idx not in to_delete:
                        to_delete.add(idx)
                        mesh_new.append(root)
                        ok[b_, m_] = True
                elif second:
                    idx = m_ if reverse else m_ + 1
                    if idx not in to_delete:
                        to_delete.add(idx)
                        mesh_new.append(root)
                        ok[b_, m_] = True
                else:
                    mesh_new.append(root)
                    ok[b_, m_] = True
        elif np.all(seg < dtol) or np.all(seg > 1 - dtol):
            ok[b_, m_] = True

    for b_ in range(n_b):
        for m_ in range(index_mid):
            _process_roots(b_, m_, reverse=False)
        for m_ in reversed(range(index_mid, N)):
            _process_roots(b_, m_, reverse=True)

    def _nudge_left(m_, r_s, mesh_l, mesh_d):
        if m_ not in to_delete:
            mesh_new.append(mesh_l + r_s * mesh_d)
            to_delete.add(m_)
        else:
            idx_r = m_ + 1
            while idx_r in no_shock:
                idx_r += 1
            if idx_r not in to_delete and idx_r < N:
                mesh_new.append(mesh[idx_r] - r_s * mesh_d)
                to_delete.add(idx_r)

    def _nudge_right(m_, r_s, mesh_r, mesh_d):
        if m_ + 1 not in to_delete:
            mesh_new.append(mesh_r - r_s * mesh_d)
            to_delete.add(m_ + 1)
        else:
            idx_l = m_
            while idx_l in no_shock:
                idx_l -= 1
            if idx_l not in to_delete and idx_l > 0:
                mesh_new.append(mesh[idx_l] + r_s * mesh_d)
                to_delete.add(idx_l)

    def _process_unsaturated(b_, m_, reverse: bool):
        if ok[b_, m_]:
            return
        mesh_l, mesh_r = mesh[m_], mesh[m_ + 1]
        mesh_d = mesh_r - mesh_l
        r_i = abs(f_mean[b_, m_] - round(f_mean[b_, m_]))
        r_s = r_i * _FACTOR
        f_lr = f_bb[b_, l_m[m_]]
        f_rl = f_bb[b_, r_m[m_] - 1]
        f_ll = None if m_ == 0 else f_bb[b_, l_m[m_] - 1]
        f_rr = None if m_ == N - 1 else f_bb[b_, r_m[m_]]
        ok_l, ok_r = _boundary_ok(f_ll, f_lr, f_rl, f_rr, dtol)
        if reverse:
            if not ok_r:
                _nudge_right(m_, r_s, mesh_r, mesh_d)
            if not ok_l:
                _nudge_left(m_, r_s, mesh_l, mesh_d)
        else:
            if not ok_l:
                _nudge_left(m_, r_s, mesh_l, mesh_d)
            if not ok_r:
                _nudge_right(m_, r_s, mesh_r, mesh_d)

    for b_ in range(n_b):
        for m_ in range(index_mid):
            _process_unsaturated(b_, m_, reverse=False)
        for m_ in reversed(range(index_mid, N)):
            _process_unsaturated(b_, m_, reverse=True)

    for p_ in range(1, N):
        if p_ not in to_delete and p_ not in no_shock:
            mesh_new.append(mesh[p_])

    mesh_clean = _clean_mesh(mesh_new, mesh[1:-1], mesh_length_min, mesh_length_max)
    num_point_new = []
    for i in range(len(mesh_clean) - 1):
        if mesh_clean[i + 1] - mesh_clean[i] < min(1e-2, mesh_length_min * 10):
            num_point_new.append(num_point_min)
        else:
            num_point_new.append(num_point_max)
    return mesh_clean, num_point_new
