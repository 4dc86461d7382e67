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

import os

import jax
import numpy as np

_cache_decided = False


def _maybe_enable_compile_cache():
    """Enable the persistent compilation cache once the backend is known.

    Runs lazily at first model construction (after backend resolution) so an
    unset JAX_PLATFORMS that silently falls back to CPU does NOT enable the
    shared cache: XLA:CPU AOT artifacts are host-CPU-feature specific and a
    shared cache dir (e.g. NFS home) risks SIGILL on other machines.
    Accelerator (TPU/GPU) executables have no such portability hazard, and
    caching matters most there (remote-compile cold starts cost tens of
    seconds). GPIM_TPU_NO_COMPILE_CACHE opts out entirely.
    """
    global _cache_decided
    if _cache_decided:
        return
    _cache_decided = True
    if os.environ.get("GPIM_TPU_NO_COMPILE_CACHE"):
        return
    if jax.default_backend() == "cpu":
        return
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/gpim_tpu_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these options
        pass


def resolve_dtype(precision=None):
    """Map a precision string ('single' | 'double' | None) to a numpy dtype.

    None means "auto": double on CPU (reference parity), single on TPU/GPU
    (hardware-native speed). Also triggers the one-time persistent-cache
    decision, which needs the resolved backend.
    """
    _maybe_enable_compile_cache()
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
