"""Pure-function covariance kernels and constraint bijectors."""

from gpim_tpu.kernels.functional import (  # noqa: F401
    KERNELS, get_kernel_fn, kernel_diag, matern52, rational_quadratic, rbf,
    spectral_mixture)
from gpim_tpu.kernels import transforms  # noqa: F401
