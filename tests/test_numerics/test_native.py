"""Native C++ numerics must agree with the numpy reference path."""

import os

import numpy as np
import pytest

from pockit_tpu.numerics import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _numpy_lgl(n):
    os.environ["POCKIT_TPU_NO_NATIVE"] = "1"
    try:
        # bypass the cached, native-preferring wrapper
        from pockit_tpu.numerics import quadrature

        return quadrature.xw_lgl.__wrapped__(n)
    finally:
        del os.environ["POCKIT_TPU_NO_NATIVE"]


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 8, 10, 12, 16, 20])
def test_native_lgl_matches_numpy(n):
    from pockit_tpu.numerics import quadrature

    xn, wn = native.lgl(n)
    assert np.all(np.diff(xn) > 0)
    assert abs(np.sum(wn) - 2.0) < 1e-13
    # quadrature exactness up to degree 2n-3
    for deg in range(0, max(2 * n - 2, 1)):
        exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
        assert abs(wn @ xn**deg - exact) < 1e-11


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 12, 16])
def test_native_lgr_matches_properties(n):
    xn, wn = native.lgr(n)
    assert xn[0] == -1.0
    assert np.all(np.diff(xn) > 0)
    assert abs(np.sum(wn) - 2.0) < 1e-13
    for deg in range(0, 2 * n - 1):
        exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
        assert abs(wn @ xn**deg - exact) < 1e-11


def test_native_gauss():
    x, w = native.gauss(12)
    for deg in range(0, 24):
        exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
        assert abs(w @ x**deg - exact) < 1e-12


def test_native_integral_matrix_matches_numpy():
    from pockit_tpu.numerics.lagrange import integral_matrix

    x, _ = native.lgl(9)
    I_native = native.integral_matrix(x, x[:-1])
    I_numpy = integral_matrix(x, x[:-1])
    np.testing.assert_allclose(I_native, I_numpy, atol=1e-13)
