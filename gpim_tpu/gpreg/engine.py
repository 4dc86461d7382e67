"""
Functional GP core: jit-compiled training and prediction programs.

This replaces the reference's Pyro engine (gpr.py:170-255 drives
pyro.contrib.gp models with a Python-side Adam loop) with single-compilation
XLA programs:

- the whole Adam training loop is ONE ``lax.scan`` over iterations, so a
  1000-step optimization is a single device program instead of 1000
  host-dispatched steps;
- observations are NaN-compacted on host and padded to a static bucket size;
  a 0/1 mask folds the padding out of the marginal likelihood *exactly*
  (padded rows/cols of the covariance are replaced by identity rows, padded
  targets by zeros - the Cholesky factorization then block-decouples and the
  padded entries contribute nothing to either the quadratic form or the
  log-determinant). Bucketing keeps XLA recompiles rare as data grows during
  Bayesian-optimization runs;
- prediction is chunk-batched with ``lax.map`` over fixed-size tiles
  (replacing the manual num_batches splitting of skgpr.py:309-326);
- the sparse path is the Titsias variational free energy (VFE) bound, the
  same approximation family as Pyro's SparseGPRegression default
  (reference gpr.py:146-155), with trainable inducing points.

Hyperparameters are optimized in unconstrained space; interval-transform
log-Jacobians are added to the objective, which is exactly the MAP objective
Pyro's Trace_ELBO produces for Uniform-prior sample sites
(pyro_kernels.py:77-94).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.scipy.linalg import cho_solve, solve_triangular

from gpim_tpu.kernels.functional import get_kernel_fn, kernel_diag
from gpim_tpu.kernels.transforms import (
    interval_forward, interval_log_jacobian, positive_forward)

__all__ = [
    "constrain", "exact_loss", "vfe_loss", "train",
    "predict_exact", "predict_vfe", "pad_rows", "chunk_rows",
]

_LOG_2PI = math.log(2.0 * math.pi)


# --------------------------------------------------------------------------
# Parameter handling
# --------------------------------------------------------------------------

def constrain(u, bounds):
    """Map unconstrained parameters to their constrained domains.

    Keys of ``u``: 'lengthscale', 'variance', 'noise', optional 'alpha'
    (RationalQuadratic), optional 'Xu' (inducing points, unconstrained).
    ``bounds``: 'ls_lo', 'ls_hi', 'var_lo', 'var_hi' arrays.
    """
    p = {
        "lengthscale": interval_forward(
            u["lengthscale"], bounds["ls_lo"], bounds["ls_hi"]),
        "variance": interval_forward(
            u["variance"], bounds["var_lo"], bounds["var_hi"]),
        "noise": positive_forward(u["noise"]),
    }
    if "alpha" in u:
        p["alpha"] = positive_forward(u["alpha"])
    if "Xu" in u:
        p["Xu"] = u["Xu"]
    return p


def _log_jacobian(u, bounds):
    """Interval-transform log-Jacobian (the MAP prior term)."""
    return (interval_log_jacobian(u["lengthscale"],
                                  bounds["ls_lo"], bounds["ls_hi"]) +
            interval_log_jacobian(u["variance"],
                                  bounds["var_lo"], bounds["var_hi"]))


def _record(p):
    """Per-iteration hyperparameter snapshot (public `hyperparams` contract,
    reference gpr.py:195-199)."""
    rec = {
        "lengthscale": p["lengthscale"],
        "variance": p["variance"],
        "noise": p["noise"],
    }
    if "Xu" in p:
        rec["inducing_points"] = p["Xu"]
    return rec


# --------------------------------------------------------------------------
# Masked marginal likelihoods
# --------------------------------------------------------------------------

def _masked_system(K, noise, mask, jitter):
    """Replace padded rows/cols of (K + noise I) with identity rows."""
    mm = mask[:, None] * mask[None, :]
    eye = jnp.eye(K.shape[0], dtype=K.dtype)
    diag_fix = (1.0 - mask) * eye
    return mm * (K + (noise + jitter) * eye) + diag_fix


def exact_loss(u, X, y, mask, bounds, jitter, *, kernel):
    """Masked negative log marginal likelihood + MAP prior terms."""
    kfn = get_kernel_fn(kernel)
    p = constrain(u, bounds)
    A = _masked_system(kfn(p, X, X), p["noise"], mask, jitter)
    L = jnp.linalg.cholesky(A)
    ym = y * mask
    # quadratic form via one triangular solve: y^T A^-1 y = |L^-1 y|^2
    z = solve_triangular(L, ym, lower=True)
    n_eff = jnp.sum(mask)
    nll = (0.5 * jnp.dot(z, z)
           + jnp.sum(jnp.log(jnp.diagonal(L)) * mask)
           + 0.5 * n_eff * _LOG_2PI)
    return nll - _log_jacobian(u, bounds)


def vfe_loss(u, X, y, mask, bounds, jitter, *, kernel):
    """Masked Titsias VFE bound (negated) with trainable inducing points.

    Matches the approximation family of Pyro's SparseGPRegression
    (reference gpr.py:154-155; Xu initialization mirrored in gpr.py:151).
    """
    kfn = get_kernel_fn(kernel)
    p = constrain(u, bounds)
    Xu = p["Xu"]
    m = Xu.shape[0]
    noise = p["noise"]
    Kmm = kfn(p, Xu, Xu) + jitter * jnp.eye(m, dtype=X.dtype)
    Kmn = kfn(p, Xu, X) * mask[None, :]
    Lm = jnp.linalg.cholesky(Kmm)
    A = solve_triangular(Lm, Kmn, lower=True) / jnp.sqrt(noise)
    B = jnp.eye(m, dtype=X.dtype) + A @ A.T
    LB = jnp.linalg.cholesky(B)
    ym = y * mask
    c = solve_triangular(LB, A @ ym, lower=True) / jnp.sqrt(noise)
    n_eff = jnp.sum(mask)
    kdiag = kernel_diag(kernel, p, X) * mask
    trace_term = (jnp.sum(kdiag) / noise - jnp.sum(A * A))
    nll = (0.5 * n_eff * (_LOG_2PI + jnp.log(noise))
           + jnp.sum(jnp.log(jnp.diagonal(LB)))
           + 0.5 * jnp.dot(ym, ym) / noise
           - 0.5 * jnp.dot(c, c)
           + 0.5 * trace_term)
    return nll - _log_jacobian(u, bounds)


# --------------------------------------------------------------------------
# Training: the whole Adam loop is one lax.scan program
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("kernel", "iterations", "sparse"))
def train(u0, X, y, mask, bounds, lr, jitter, *,
          kernel, iterations, sparse):
    """Run ``iterations`` Adam steps; returns (final_u, trajectory dict).

    The trajectory holds the post-update constrained hyperparameters of every
    iteration plus the pre-update loss - the same time series the reference
    accumulates in Python lists (gpr.py:195-199).
    """
    loss_fn = vfe_loss if sparse else exact_loss
    opt = optax.adam(learning_rate=lr)
    opt_state = opt.init(u0)

    def step(carry, _):
        u, opt_state = carry
        loss, g = jax.value_and_grad(
            partial(loss_fn, kernel=kernel))(u, X, y, mask, bounds, jitter)
        updates, opt_state = opt.update(g, opt_state, u)
        u = optax.apply_updates(u, updates)
        rec = _record(constrain(u, bounds))
        rec["loss"] = loss
        return (u, opt_state), rec

    (u_final, _), traj = jax.lax.scan(
        step, (u0, opt_state), None, length=iterations)
    return u_final, traj


# --------------------------------------------------------------------------
# Prediction: chunk-batched over the test grid
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("kernel", "noiseless"))
def predict_exact(u, X, y, mask, bounds, jitter, Xtest_chunks, *,
                  kernel, noiseless=False):
    """Exact GP predictive mean/variance over chunked test points.

    ``Xtest_chunks`` has shape (n_chunks, chunk, d); chunks are processed
    sequentially by lax.map so peak memory stays at one (n, chunk) solve.
    Variance includes observation noise when ``noiseless=False``, matching
    ``model(Xtest, full_cov=False, noiseless=False)`` (reference gpr.py:248).
    """
    kfn = get_kernel_fn(kernel)
    p = constrain(u, bounds)
    A = _masked_system(kfn(p, X, X), p["noise"], mask, jitter)
    L = jnp.linalg.cholesky(A)
    alpha = cho_solve((L, True), y * mask)

    def one(xc):
        Ks = kfn(p, xc, X) * mask[None, :]
        mean = Ks @ alpha
        V = solve_triangular(L, Ks.T, lower=True)
        var = kernel_diag(kernel, p, xc) - jnp.sum(V * V, axis=0)
        if not noiseless:
            var = var + p["noise"]
        return mean, jnp.maximum(var, 0.0)

    means, variances = jax.lax.map(one, Xtest_chunks)
    return means.reshape(-1), variances.reshape(-1)


@partial(jax.jit, static_argnames=("kernel", "noiseless"))
def predict_vfe(u, X, y, mask, bounds, jitter, Xtest_chunks, *,
                kernel, noiseless=False):
    """Sparse (VFE) GP predictive mean/variance over chunked test points."""
    kfn = get_kernel_fn(kernel)
    p = constrain(u, bounds)
    Xu = p["Xu"]
    m = Xu.shape[0]
    noise = p["noise"]
    Kmm = kfn(p, Xu, Xu) + jitter * jnp.eye(m, dtype=X.dtype)
    Kmn = kfn(p, Xu, X) * mask[None, :]
    Lm = jnp.linalg.cholesky(Kmm)
    A = solve_triangular(Lm, Kmn, lower=True) / jnp.sqrt(noise)
    B = jnp.eye(m, dtype=X.dtype) + A @ A.T
    LB = jnp.linalg.cholesky(B)
    c = solve_triangular(LB, A @ (y * mask), lower=True) / jnp.sqrt(noise)

    def one(xc):
        Ks = kfn(p, xc, Xu)
        w1 = solve_triangular(Lm, Ks.T, lower=True)      # (m, chunk)
        w2 = solve_triangular(LB, w1, lower=True)        # (m, chunk)
        mean = w2.T @ c
        var = (kernel_diag(kernel, p, xc)
               - jnp.sum(w1 * w1, axis=0)
               + jnp.sum(w2 * w2, axis=0))
        if not noiseless:
            var = var + noise
        return mean, jnp.maximum(var, 0.0)

    means, variances = jax.lax.map(one, Xtest_chunks)
    return means.reshape(-1), variances.reshape(-1)


# --------------------------------------------------------------------------
# Host-side shape plumbing
# --------------------------------------------------------------------------

def pad_rows(arr, bucket):
    """Pad axis 0 up to the next multiple of ``bucket`` (with zeros).

    Returns (padded, original_length). Bucketing bounds the number of
    distinct jit shapes as the training set grows one point at a time
    during Bayesian-optimization runs.
    """
    import numpy as np
    n = arr.shape[0]
    n_pad = int(-(-max(n, 1) // bucket) * bucket)
    if n_pad == n:
        return arr, n
    pad = [(0, n_pad - n)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad), n


def chunk_rows(arr, chunk):
    """Zero-pad axis 0 to a multiple of ``chunk`` and reshape to
    (n_chunks, chunk, ...). Returns (chunked, original_length)."""
    padded, n = pad_rows(arr, chunk)
    return padded.reshape((-1, chunk) + arr.shape[1:]), n
