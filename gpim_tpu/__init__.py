"""
gpim_tpu
========

TPU-native Gaussian-process framework for sparse scientific image and
hyperspectral data, built from scratch on JAX/XLA/Pallas.

Provides the same capabilities (and the same five-name public API surface) as
the reference GPim library (ziatdinovmax/GPim, /root/reference/gpim/__init__.py:1-5):

- ``utils``            : NaN-masked grid preparation, synthetic corruption and
                         all plotting helpers (reference: gpim/gprutils.py)
- ``reconstructor``    : exact and inducing-point (VFE) sparse GP regression
                         for 2D images / 3D spectroscopic grids
                         (reference: gpim/gpreg/gpr.py)
- ``skreconstructor``  : structured-kernel-interpolation (SKI) and
                         spectral-mixture GP for 2D-4D grids
                         (reference: gpim/gpreg/skgpr.py)
- ``vreconstructor``   : multi-output (correlated / independent "parallel")
                         GP for vector-valued data such as EELS stacks
                         (reference: gpim/gpreg/vgpr.py)
- ``boptimizer``       : GP-based Bayesian optimization loop for automated
                         experiments (reference: gpim/gpbayes/boptim.py)

Unlike the reference (a Pyro/GPyTorch/torch wrapper bound to a single CUDA
device), everything here is jit-compiled XLA: training loops run as a single
``lax.scan`` program, Gram matrices are built by fused (optionally Pallas)
TPU kernels, predictions are chunk-batched under ``lax.map``, and multi-chip
scaling goes through ``jax.sharding`` meshes (see ``gpim_tpu.parallel``).
"""

import jax as _jax

# Double precision must be enabled before any jax computation. The reference
# defaults to float64 (gpr.py:92-99); on TPU f64 is emulated and slow, so the
# per-model `precision` kwarg defaults to "single" on accelerators and
# "double" on CPU (see gpim_tpu/dtypes.py).
_jax.config.update("jax_enable_x64", True)

# TPU matmuls default to bfloat16 inputs; GP numerics (pairwise-distance
# expansions, Gram solves) need true float32 - bf16 collapses the distance
# between neighboring grid points to zero and makes Gram matrices singular.
# Hot paths that can tolerate lower precision opt back down explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: GP programs recompile per data-shape bucket,
# and on remote-compile TPU setups a cold compile costs tens of seconds -
# caching across processes amortizes it to ~nothing. The enable decision is
# deferred to the first backend resolution (dtypes._maybe_enable_compile_cache,
# called by every model constructor): only accelerator backends cache -
# XLA:CPU AOT artifacts are host-CPU-feature specific and a shared cache dir
# would risk SIGILL on other machines (GPIM_TPU_NO_COMPILE_CACHE opts out).

from gpim_tpu import utils
from gpim_tpu.gpreg.gpr import reconstructor
from gpim_tpu.gpreg.skgpr import skreconstructor
from gpim_tpu.gpreg.vgpr import vreconstructor
from gpim_tpu.gpbayes.boptim import boptimizer

__version__ = "0.1.0"

__all__ = [
    "utils",
    "reconstructor",
    "skreconstructor",
    "vreconstructor",
    "boptimizer",
]
