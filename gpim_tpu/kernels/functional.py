"""
Stationary covariance functions as pure jax functions ``k(params, X1, X2)``.

Capability parity with both reference kernel factories:
- RBF / RationalQuadratic / Matern52 with ARD lengthscales
  (reference gpim/kernels/pyro_kernels.py:58-68);
- RBF / Matern52 / SpectralMixture with ARD and isotropic options
  (reference gpim/kernels/gpytorch_kernels.py:60-73).

``params`` is a dict of *constrained* values:
- 'lengthscale': (d,) or (1,) ARD / isotropic lengthscales
- 'variance'   : () output variance (amplitude^2)
- 'alpha'      : () scale-mixture exponent (RationalQuadratic only)
- spectral mixture: 'weights' (Q,), 'means' (Q, d), 'scales' (Q, d)

All functions broadcast over leading batch axes of the parameter arrays via
vmap at the call site (used by the multi-output "parallel" GP).
"""

import jax.numpy as jnp

from gpim_tpu.ops.gram import pairwise_dist, pairwise_sq_dist

__all__ = [
    "rbf", "matern52", "rational_quadratic", "spectral_mixture",
    "get_kernel_fn", "kernel_diag", "KERNELS",
]

_SQRT5 = 5.0 ** 0.5


def rbf(params, X1, X2):
    r"""k(x, x') = \sigma^2 exp(-0.5 ||(x - x') / l||^2)."""
    ls = params["lengthscale"]
    d2 = pairwise_sq_dist(X1 / ls, X2 / ls)
    return params["variance"] * jnp.exp(-0.5 * d2)


def matern52(params, X1, X2):
    r"""Matern-5/2: \sigma^2 (1 + sqrt5 r + 5 r^2/3) exp(-sqrt5 r)."""
    ls = params["lengthscale"]
    r = pairwise_dist(X1 / ls, X2 / ls)
    poly = 1.0 + _SQRT5 * r + (5.0 / 3.0) * r * r
    return params["variance"] * poly * jnp.exp(-_SQRT5 * r)


def rational_quadratic(params, X1, X2):
    r"""RQ: \sigma^2 (1 + r^2 / (2 \alpha))^{-\alpha} with trainable alpha."""
    ls = params["lengthscale"]
    alpha = params["alpha"]
    d2 = pairwise_sq_dist(X1 / ls, X2 / ls)
    return params["variance"] * (1.0 + d2 / (2.0 * alpha)) ** (-alpha)


def spectral_mixture(params, X1, X2):
    r"""Spectral mixture (Wilson & Adams):

    k(tau) = sum_q w_q prod_d exp(-2 pi^2 tau_d^2 s_{qd}^2) cos(2 pi m_{qd} tau_d)

    with tau = x - x', mixture weights w, spectral means m and spectral
    standard deviations s. Matches GPyTorch's SpectralMixtureKernel form
    (reference gpytorch_kernels.py:69-72).
    """
    tau = X1[:, None, :] - X2[None, :, :]          # (n, m, d)
    two_pi = 2.0 * jnp.pi
    out = 0.0
    # Q is small (default 4); an unrolled sum keeps memory at one (n, m, d)
    # buffer instead of materializing (Q, n, m, d).
    for q in range(params["weights"].shape[0]):
        s = params["scales"][q]
        m = params["means"][q]
        exp_term = jnp.exp(-2.0 * jnp.pi ** 2 * jnp.sum(
            (tau * s) ** 2, axis=-1))
        cos_term = jnp.prod(jnp.cos(two_pi * tau * m), axis=-1)
        out = out + params["weights"][q] * exp_term * cos_term
    return out


KERNELS = {
    "RBF": rbf,
    "Matern52": matern52,
    "RationalQuadratic": rational_quadratic,
    "Spectral": spectral_mixture,
}


def get_kernel_fn(kernel_type):
    """Look up a kernel function by the reference's string names."""
    try:
        return KERNELS[kernel_type]
    except KeyError:
        raise NotImplementedError(
            "Select one of the currently available kernels: " +
            ", ".join(sorted(KERNELS)))


def kernel_diag(kernel_type, params, X):
    """diag(k(X, X)) without forming the Gram matrix."""
    n = X.shape[0]
    if kernel_type == "Spectral":
        return jnp.full((n,), jnp.sum(params["weights"]), X.dtype)
    return jnp.full((n,), params["variance"], X.dtype)
