"""Legendre-Gauss-Lobatto pseudospectral scheme.

Suitable for problems with continuous state and control variables; the
discontinuous check/refine machinery is deliberately unavailable (LGL nodes
cannot represent control discontinuities — reference:
``/root/reference/pockit/lobatto/phase.py:32-48``).
"""

from functools import partial

import numpy as np

from pockit_tpu.base.phase import PhaseBase
from pockit_tpu.base.system import SystemBase
from pockit_tpu.base.variable import (
    VariableBase,
    constant_guess_base,
    linear_guess_base,
)

_NOT_IMPL = (
    "Lobatto nodes cannot approximate discontinuous functions precisely."
)


class Phase(PhaseBase):
    """LGL phase: states and controls share interval borders."""

    _family = "lobatto"

    def check_discontinuous(self, *args, **kwargs):
        """Raises:
        NotImplementedError: always (use the Radau scheme)."""
        raise NotImplementedError(_NOT_IMPL)

    def refine_discontinuous(self, *args, **kwargs):
        """Raises:
        NotImplementedError: always (use the Radau scheme)."""
        raise NotImplementedError(_NOT_IMPL)

    def check(
        self,
        variable,
        static_parameter=None,
        absolute_tolerance_continuous: float = 1e-8,
        relative_tolerance_continuous: float = 1e-8,
        tolerance_discontinuous: float = 1e-3,
        tolerance_mesh: float = 1e-4,
    ) -> bool:
        """Check the continuous error (same as :meth:`check_continuous`)."""
        return self.check_continuous(
            variable,
            static_parameter,
            absolute_tolerance_continuous,
            relative_tolerance_continuous,
            tolerance_mesh,
        )

    def refine(
        self,
        variable,
        static_parameter=None,
        absolute_tolerance_continuous: float = 1e-8,
        relative_tolerance_continuous: float = 1e-8,
        tolerance_discontinuous: float = 1e-3,
        num_point_min: int = 6,
        num_point_max: int = 12,
        mesh_length_min: float = 1e-3,
        mesh_length_max: float = 1.0,
    ) -> None:
        """Refine for the continuous error only."""
        if not self.check_continuous(
            variable,
            static_parameter,
            absolute_tolerance_continuous,
            relative_tolerance_continuous,
            mesh_length_min,
        ):
            self.refine_continuous(
                variable,
                static_parameter,
                absolute_tolerance_continuous,
                relative_tolerance_continuous,
                num_point_min,
                num_point_max,
                mesh_length_min,
                mesh_length_max,
            )


class Variable(VariableBase):
    """LGL variable: shared-border assembly for both states and controls."""

    def _assemble_x(self, blocks) -> np.ndarray:
        return self._assemble_c(self._num_point, blocks)

    def _assemble_u(self, blocks) -> np.ndarray:
        return self._assemble_c(self._num_point, blocks)


class System(SystemBase):
    """LGL system."""

    _class_phase = Phase

    def check_discontinuous(self, *args, **kwargs):
        """Raises:
        NotImplementedError: always (use the Radau scheme)."""
        raise NotImplementedError(_NOT_IMPL)

    def refine_discontinuous(self, *args, **kwargs):
        """Raises:
        NotImplementedError: always (use the Radau scheme)."""
        raise NotImplementedError(_NOT_IMPL)

    def check(
        self,
        value,
        absolute_tolerance_continuous: float = 1.0e-8,
        relative_tolerance_continuous: float = 1.0e-8,
        tolerance_discontinuous: float = 1.0e-3,
        tolerance_mesh: float = 1.0e-4,
    ) -> bool:
        """Check the continuous error (same as :meth:`check_continuous`)."""
        return self.check_continuous(
            value,
            absolute_tolerance_continuous=absolute_tolerance_continuous,
            relative_tolerance_continuous=relative_tolerance_continuous,
            tolerance_mesh=tolerance_mesh,
        )

    def refine(
        self,
        value,
        absolute_tolerance_continuous: float = 1.0e-8,
        relative_tolerance_continuous: float = 1.0e-8,
        tolerance_discontinuous: float = 1.0e-3,
        num_point_min: int = 6,
        num_point_max: int = 12,
        mesh_length_min: float = 1.0e-3,
        mesh_length_max: float = 1.0,
    ):
        """Refine for the continuous error only; returns adapted variables."""
        return self.refine_continuous(
            value,
            absolute_tolerance_continuous=absolute_tolerance_continuous,
            relative_tolerance_continuous=relative_tolerance_continuous,
            num_point_min=num_point_min,
            num_point_max=num_point_max,
            mesh_length_min=mesh_length_min,
            mesh_length_max=mesh_length_max,
        )


constant_guess = partial(constant_guess_base, Variable)
linear_guess = partial(linear_guess_base, Variable)

__all__ = ["Phase", "System", "Variable", "constant_guess", "linear_guess"]
