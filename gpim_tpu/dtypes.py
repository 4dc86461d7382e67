"""
Precision handling.

The reference selects between torch single/double default tensor types via a
``precision`` kwarg defaulting to "double" (gpr.py:92-99, skgpr.py:96-103).
Here precision resolves to an explicit numpy/jax dtype that is threaded
through every computation; no global default-dtype mutation is needed.

TPU-first policy: float64 on TPU is emulated by XLA and an order of magnitude
slower than float32, so when ``precision`` is not given explicitly it defaults
to "single" on accelerator backends and "double" on CPU.
"""

import jax
import numpy as np


def resolve_dtype(precision=None):
    """Map a precision string ('single' | 'double' | None) to a numpy dtype.

    None means "auto": double on CPU (reference parity), single on TPU/GPU
    (hardware-native speed).
    """
    if precision is None:
        precision = "double" if jax.default_backend() == "cpu" else "single"
    if precision == "single":
        return np.float32
    if precision == "double":
        return np.float64
    raise ValueError(
        "precision must be 'single', 'double' or None, got %r" % (precision,))


def default_jitter(dtype):
    """Numerical-stability jitter matched to the working precision."""
    return 1.0e-5 if np.dtype(dtype) == np.float64 else 1.0e-4


def round_up(x, multiple):
    """Round ``x`` up to the nearest multiple (used for padding buckets)."""
    return int(-(-int(x) // multiple) * multiple)
