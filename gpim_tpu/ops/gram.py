"""
Gram-matrix building blocks (XLA path).

The covariance ("Gram") matrix is the single hottest op in GP training: the
reference delegates it to torch broadcasting inside Pyro/GPyTorch kernels.
Here it is expressed MXU-first: the cross term of the squared distance is one
large matmul, and the elementwise kernel shape (exp / Matern polynomial / RQ
power) fuses into it under XLA. A hand-tiled Pallas variant for the fused
distance+covariance lives in gpim_tpu/ops/pallas_gram.py and is picked up by
the kernels when profitable.
"""

import jax
import jax.numpy as jnp

__all__ = ["pairwise_sq_dist", "pairwise_dist"]


def pairwise_sq_dist(X1, X2):
    """Pairwise squared Euclidean distances between rows of X1 and X2.

    Dispatches to the fused Pallas tile kernel (ops/pallas_gram.py) when the
    shapes qualify - one HBM pass, exact zeros at coincident points.
    Otherwise uses the |a|^2 + |b|^2 - 2ab expansion (the -2ab term maps onto
    the MXU) with mean-centering for numerical robustness in float32: grid
    coordinates can be O(100) while relevant distances are O(1), and
    centering removes most of the cancellation error of the expansion.
    """
    from gpim_tpu.ops import pallas_gram
    if pallas_gram.pallas_supported(
            X1.shape[0], X2.shape[0], X1.shape[1], X1.dtype):
        return pallas_gram.pairwise_sq_dist_pallas(X1, X2)
    center = jnp.mean(X1, axis=0, keepdims=True)
    a = X1 - center
    b = X2 - center
    aa = jnp.sum(a * a, axis=-1)
    bb = jnp.sum(b * b, axis=-1)
    # True-f32 matmul is mandatory here: the TPU's default bf16 operands
    # carry ~3 significant digits, which zeroes out distances between
    # neighboring grid points and makes the Gram matrix singular.
    ab = jnp.dot(a, b.T, precision=jax.lax.Precision.HIGHEST)
    d2 = aa[:, None] + bb[None, :] - 2.0 * ab
    # Snap distances below the expansion's round-off floor to exactly zero:
    # coincident points (Gram diagonal, prediction at measured pixels) must
    # give d2 = 0 exactly, or k(x, x) collapses to 0 instead of the kernel
    # variance once lengthscales are small relative to the coordinate span.
    eps = jnp.finfo(d2.dtype).eps
    floor = 8.0 * eps * (jnp.max(aa) + jnp.max(bb) + 1.0)
    d2 = jnp.where(d2 < floor, 0.0, d2)
    return jnp.maximum(d2, 0.0)


def pairwise_dist(X1, X2, eps=1e-12):
    """Pairwise Euclidean distance with a smooth-at-zero gradient."""
    return jnp.sqrt(pairwise_sq_dist(X1, X2) + eps)
