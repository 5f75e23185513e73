"""Solution/guess container for a discretized phase.

Mirrors the reference ``VariableBase`` (``/root/reference/pockit/base/
variablebase.py:65-460``): a flat host-side vector with named views, dense
interpolation matrices for plotting/export, mesh adaptation, and guess
builders. Interpolation matrices are dense numpy (host path — device code
never touches this class).
"""

from __future__ import annotations

from typing import Iterable, Type

import numpy as np

from pockit_tpu.base.bc import BcType
from pockit_tpu.numerics import V_interpolation, D_interpolation
from pockit_tpu.numerics.layout import lr_c


class BatchIndexArray:
    """Index a batch of variable slices out of a flat vector."""

    def __init__(self, data, l_index, r_index):
        if not len(l_index) == len(r_index):
            raise ValueError("l_index and r_index must have the same length")
        self._data = data
        self._l_index = l_index
        self._r_index = r_index
        self._n = len(l_index)

    def __getitem__(self, i: int) -> np.ndarray:
        return self._data[self._l_index[i] : self._r_index[i]]

    def __setitem__(self, i: int, value) -> None:
        self._data[self._l_index[i] : self._r_index[i]] = value

    def __len__(self) -> int:
        return self._n


class VariableBase:
    """Optimization variable for one discretized phase."""

    def __init__(self, phase, data: np.ndarray) -> None:
        data = np.asarray(data, dtype=np.float64)
        if len(data) != phase.L:
            raise ValueError(f"data must have length {phase.L}, got {len(data)}")
        self._data = data
        self._l_v = phase.l_v
        self._r_v = phase.r_v
        self._n_x = phase.n_x
        self._n_u = phase.n_u
        self._n = phase.n
        self._array_state = BatchIndexArray(
            data, self._l_v[: self._n_x], self._r_v[: self._n_x]
        )
        self._array_control = BatchIndexArray(
            data, self._l_v[self._n_x :], self._r_v[self._n_x :]
        )
        self._mesh = phase._mesh
        self._num_point = phase._num_point
        self._N = phase.N
        self._t_x = phase.t_x
        self._t_u = phase.t_u
        self._l_x = phase.l_x
        self._r_x = phase.r_x
        self._l_u = phase.l_u
        self._r_u = phase.r_u

    # -- time partition helpers (reference: variablebase.py:136-172) -----
    @staticmethod
    def _almost_equal(a, b) -> bool:
        return bool(np.isclose(a, b, rtol=1e-8, atol=1e-8))

    def _interval_partition(self, t: np.ndarray):
        """Assign each (scaled) output time to a subinterval; a repeated time
        at an interval border crosses into the next interval (so
        discontinuous controls can be sampled from both sides)."""
        parts = [[] for _ in range(self._N)]
        n_old = 0
        for i, t_ in enumerate(t):
            while self._mesh[n_old + 1] < t_ and not self._almost_equal(
                self._mesh[n_old + 1], t_
            ):
                n_old += 1
            if (
                self._almost_equal(self._mesh[n_old + 1], t_)
                and i > 0
                and self._almost_equal(t[i - 1], t_)
                and n_old + 1 < self._N
            ):
                n_old += 1
            parts[n_old].append(t_)
        return parts

    def _guard_t(self, t: np.ndarray) -> np.ndarray:
        t = np.array(t, dtype=np.float64)
        for i in range(len(t) - 1):
            if not np.isclose(t[i], t[i + 1]) and t[i] > t[i + 1]:
                raise ValueError("t is not in ascending order")
        if t[0] < self.t_0:
            if np.isclose(t[0], self.t_0, rtol=0, atol=1e-8):
                t[0] = self.t_0
            else:
                raise ValueError("t[0] must be equal or greater than t_0")
        if t[-1] > self.t_f:
            if np.isclose(t[-1], self.t_f, rtol=0, atol=1e-8):
                t[-1] = self.t_f
            else:
                raise ValueError("t[-1] must be equal or smaller than t_f")
        return (t - self.t_0) / (self.t_f - self.t_0)

    # -- dense assembly (shared vs non-shared borders) -------------------
    @staticmethod
    def _assemble_c(num_point, blocks) -> np.ndarray:
        """Stack per-interval interpolation blocks over a shared-border
        variable grid."""
        l_c, r_c = lr_c(num_point)
        L_col = int(r_c[-1])
        rows = sum(b.shape[0] for b in blocks)
        M = np.zeros((rows, L_col))
        r0 = 0
        for i, b in enumerate(blocks):
            if not b.shape[0]:
                continue
            M[r0 : r0 + b.shape[0], l_c[i] : l_c[i] + b.shape[1]] = b
            r0 += b.shape[0]
        return M

    @staticmethod
    def _assemble_nc(blocks) -> np.ndarray:
        """Block-diagonal stack over a non-shared variable grid."""
        rows = sum(b.shape[0] for b in blocks)
        cols = sum(b.shape[1] for b in blocks)
        M = np.zeros((rows, cols))
        r0 = c0 = 0
        for b in blocks:
            M[r0 : r0 + b.shape[0], c0 : c0 + b.shape[1]] = b
            r0 += b.shape[0]
            c0 += b.shape[1]
        return M

    def _assemble_x(self, blocks) -> np.ndarray:
        raise NotImplementedError

    def _assemble_u(self, blocks) -> np.ndarray:
        raise NotImplementedError

    def _matrix(self, t, nodes, l_idx, r_idx, builder, assemble):
        t = self._guard_t(t)
        parts = self._interval_partition(t)
        blocks = [
            builder(nodes[l_idx[i] : r_idx[i]], np.array(t_))
            for i, t_ in enumerate(parts)
        ]
        return assemble(blocks)

    def V_x(self, t) -> np.ndarray:
        """Value interpolation matrix for states at output times ``t``."""
        return self._matrix(
            t, self._t_x, self._l_x, self._r_x, V_interpolation, self._assemble_x
        )

    def V_u(self, t) -> np.ndarray:
        """Value interpolation matrix for controls at output times ``t``."""
        return self._matrix(
            t, self._t_u, self._l_u, self._r_u, V_interpolation, self._assemble_u
        )

    def D_x(self, t) -> np.ndarray:
        """Derivative interpolation matrix for states at output times ``t``.

        Derivatives are taken with respect to the phase-scaled time
        ``τ = (t - t_0) / (t_f - t_0)``, matching the reference convention
        (``variablebase.py:260-284``); divide by ``t_f - t_0`` for
        physical-time derivatives.
        """
        return self._matrix(
            t, self._t_x, self._l_x, self._r_x, D_interpolation, self._assemble_x
        )

    def D_u(self, t) -> np.ndarray:
        """Derivative interpolation matrix for controls at output times ``t``
        (with respect to phase-scaled time, see :meth:`D_x`)."""
        return self._matrix(
            t, self._t_u, self._l_u, self._r_u, D_interpolation, self._assemble_u
        )

    # -- accessors -------------------------------------------------------
    @property
    def x(self) -> BatchIndexArray:
        """State variables, indexable by state number."""
        return self._array_state

    @property
    def u(self) -> BatchIndexArray:
        """Control variables, indexable by control number."""
        return self._array_control

    @property
    def t_0(self) -> float:
        return self._data[-2]

    @t_0.setter
    def t_0(self, value: float) -> None:
        self._data[-2] = value

    @property
    def t_f(self) -> float:
        return self._data[-1]

    @t_f.setter
    def t_f(self, value: float) -> None:
        self._data[-1] = value

    @property
    def data(self) -> np.ndarray:
        """The flat phase vector (pass to the solver)."""
        return self._data

    @property
    def t_x(self) -> np.ndarray:
        """Physical time at the state interpolation nodes."""
        return self._t_x * (self.t_f - self.t_0) + self.t_0

    @property
    def t_u(self) -> np.ndarray:
        """Physical time at the control interpolation nodes."""
        return self._t_u * (self.t_f - self.t_0) + self.t_0

    def adapt(self, phase):
        """Re-interpolate onto a phase with a different mesh (warm start for
        the refine loop; reference: ``variablebase.py:360-385``)."""
        V_x = self.V_x(phase.t_x * (self.t_f - self.t_0) + self.t_0)
        V_u = self.V_u(phase.t_u * (self.t_f - self.t_0) + self.t_0)
        data_new = np.empty(phase.L)
        for i in range(phase.n_x):
            data_new[phase.l_v[i] : phase.r_v[i]] = V_x @ self.x[i]
        for i in range(phase.n_u):
            data_new[phase.l_v[phase.n_x + i] : phase.r_v[phase.n_x + i]] = (
                V_u @ self.u[i]
            )
        data_new[-2] = self._data[-2]
        data_new[-1] = self._data[-1]
        return type(self)(phase, data_new)


def constant_guess_base(
    Variable: Type[VariableBase], phase, value: float = 1.0
) -> VariableBase:
    """Constant guess honoring FIXED boundary conditions (reference:
    ``variablebase.py:388-420``)."""
    if not phase.ok:
        raise ValueError("phase is not fully configured")
    value = float(value)
    v = Variable(phase, np.full(phase.L, value))
    for i in range(phase.n_x):
        if phase.info_bc_0[i].t == BcType.FIXED:
            v.x[i][0] = phase.bc_0[i]
        if phase.info_bc_f[i].t == BcType.FIXED:
            v.x[i][-1] = phase.bc_f[i]
    if phase.info_t_0.t == BcType.FIXED:
        v.t_0 = phase.t_0
    else:
        v.t_0 -= 0.5
    if phase.info_t_f.t == BcType.FIXED:
        v.t_f = phase.t_f
    else:
        v.t_f += 0.5
    return v


def linear_guess_base(
    Variable: Type[VariableBase], phase, default: float = 1.0
) -> VariableBase:
    """Linear guess between FIXED boundary conditions (reference:
    ``variablebase.py:423-460``)."""
    if not phase.ok:
        raise ValueError("phase is not fully configured")
    default = float(default)
    v = Variable(phase, np.full(phase.L, default))
    for i in range(phase.n_x):
        t0_fixed = phase.info_bc_0[i].t == BcType.FIXED
        tf_fixed = phase.info_bc_f[i].t == BcType.FIXED
        if t0_fixed and tf_fixed:
            v.x[i] = v._t_x * (phase.bc_f[i] - phase.bc_0[i]) + phase.bc_0[i]
        elif t0_fixed:
            v.x[i] = phase.bc_0[i]
        elif tf_fixed:
            v.x[i] = phase.bc_f[i]
    if phase.info_t_0.t == BcType.FIXED:
        v.t_0 = phase.t_0
    else:
        v.t_0 -= 0.5
    if phase.info_t_f.t == BcType.FIXED:
        v.t_f = phase.t_f
    else:
        v.t_f += 0.5
    return v
