"""ctypes binding to the native C++ collocation numerics library.

Loads ``libpockit_colloc.so`` (built from ``native/colloc.cpp``); attempts
an on-demand ``make`` if the shared object is missing and the toolchain is
available. All entry points return ``None`` gracefully when the native
library is unavailable so callers can fall back to the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_NAME = "libpockit_colloc.so"

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if os.environ.get("POCKIT_TPU_NO_NATIVE"):
        return None
    so_path = os.path.abspath(os.path.join(_NATIVE_DIR, _SO_NAME))
    if not os.path.exists(so_path):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    dptr = ctypes.POINTER(ctypes.c_double)
    lib.pockit_lgl.argtypes = [ctypes.c_int, dptr, dptr]
    lib.pockit_lgl.restype = ctypes.c_int
    lib.pockit_lgr.argtypes = [ctypes.c_int, dptr, dptr]
    lib.pockit_lgr.restype = ctypes.c_int
    lib.pockit_gauss.argtypes = [ctypes.c_int, dptr, dptr]
    lib.pockit_gauss.restype = ctypes.c_int
    lib.pockit_integral_matrix.argtypes = [
        dptr,
        ctypes.c_int,
        dptr,
        ctypes.c_int,
        dptr,
    ]
    lib.pockit_integral_matrix.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    """Whether the native library could be loaded (builds it if needed)."""
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _nodes(fn_name: str, num_point: int):
    lib = _load()
    if lib is None:
        return None
    x = np.empty(num_point)
    w = np.empty(num_point)
    rc = getattr(lib, fn_name)(num_point, _ptr(x), _ptr(w))
    if rc != 0:
        return None
    return x, w


def lgl(num_point: int):
    """Native LGL nodes/weights, or ``None`` if unavailable."""
    return _nodes("pockit_lgl", num_point)


def lgr(num_point: int):
    """Native LGR nodes/weights, or ``None`` if unavailable."""
    return _nodes("pockit_lgr", num_point)


def gauss(num_point: int):
    """Native Gauss-Legendre nodes/weights, or ``None`` if unavailable."""
    return _nodes("pockit_gauss", num_point)


def integral_matrix(nodes_in: np.ndarray, nodes_out: np.ndarray):
    """Native integral matrix, or ``None`` if unavailable."""
    lib = _load()
    if lib is None:
        return None
    nodes_in = np.ascontiguousarray(nodes_in, dtype=np.float64)
    nodes_out = np.ascontiguousarray(nodes_out, dtype=np.float64)
    n, m = len(nodes_in), len(nodes_out)
    out = np.zeros((m, n))
    rc = lib.pockit_integral_matrix(_ptr(nodes_in), n, _ptr(nodes_out), m, _ptr(out))
    if rc != 0:
        return None
    return out
