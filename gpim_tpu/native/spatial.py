"""
Greedy spatial suppression for batch query-point selection.

Algorithm (contract of reference boptim.update_points, boptim.py:326-376):
walk candidate points in descending acquisition order; each accepted point
suppresses every remaining candidate within Euclidean distance ``dscale``.

A compiled C++ kernel (spatial.cpp, built by build.sh into _spatial.so and
loaded via ctypes) handles large candidate sets; a vectorized numpy fallback
is used when the shared library is absent.
"""

import ctypes
import os

import numpy as np

__all__ = ["spaced_batch", "suppress_within", "native_available"]

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "_spatial.so")
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.spaced_batch.restype = ctypes.c_int64
            lib.spaced_batch.argtypes = [
                ctypes.POINTER(ctypes.c_double),  # points (n*d)
                ctypes.c_int64,                   # n
                ctypes.c_int64,                   # d
                ctypes.c_double,                  # dscale
                ctypes.c_int64,                   # max_out
                ctypes.POINTER(ctypes.c_int64),   # out indices
            ]
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def native_available():
    """True when the compiled C++ helper is loadable."""
    return _load() is not None


def spaced_batch(points, dscale, max_out=None):
    """Greedy selection of points spaced at least ``dscale`` apart.

    Args:
        points: (n, d) candidate coordinates in descending priority order.
        dscale: exclusion radius.
        max_out: optional cap on the number of selected points.

    Returns:
        List of selected row positions into ``points`` (ascending priority
        order preserved).
    """
    pts = np.ascontiguousarray(points, np.float64)
    n, d = pts.shape
    if n == 0:
        return []
    cap = n if max_out is None else min(int(max_out), n)
    lib = _load()
    if lib is not None:
        out = np.empty(cap, np.int64)
        cnt = lib.spaced_batch(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n, d, float(dscale), cap,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out[:cnt].tolist()
    # numpy fallback: O(k*n) vectorized suppression sweeps
    alive = np.ones(n, bool)
    selected = []
    r2 = float(dscale) ** 2
    while len(selected) < cap:
        remaining = np.nonzero(alive)[0]
        if remaining.size == 0:
            break
        i = remaining[0]
        selected.append(int(i))
        diff = pts[remaining] - pts[i]
        alive[remaining[np.einsum("ij,ij->i", diff, diff) <= r2]] = False
    return selected


def suppress_within(points, center, dscale):
    """Row positions of ``points`` within ``dscale`` of ``center``
    (the ball query of reference boptim.py:361)."""
    pts = np.asarray(points, np.float64)
    diff = pts - np.asarray(center, np.float64)
    return np.nonzero(np.einsum("ij,ij->i", diff, diff)
                      <= float(dscale) ** 2)[0].tolist()
