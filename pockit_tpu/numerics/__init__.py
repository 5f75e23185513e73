"""Host-side numerics: quadrature nodes/weights, Lagrange interpolation,
mesh index layout.

All functions here run in float64 numpy on the host at problem-construction
time; results become static constants baked into jitted TPU programs.
"""

from pockit_tpu.numerics.layout import lr_c, lr_nc
from pockit_tpu.numerics.quadrature import xw_lgl, xw_lgr
from pockit_tpu.numerics.lagrange import (
    barycentric_weights,
    lagrange_values,
    differentiation_matrix,
    integral_matrix,
    V_interpolation,
    D_interpolation,
    polynomial_coefficients,
)

__all__ = [
    "lr_c",
    "lr_nc",
    "xw_lgl",
    "xw_lgr",
    "barycentric_weights",
    "lagrange_values",
    "differentiation_matrix",
    "integral_matrix",
    "V_interpolation",
    "D_interpolation",
    "polynomial_coefficients",
]
