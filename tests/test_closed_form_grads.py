"""
Closed-form MLL gradient correctness: the fast custom-VJP path
(engine._nll_fast, used for the stationary kernel family) must match
reverse-mode autodiff through the Cholesky factorization exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpim_tpu.gpreg import engine
from gpim_tpu.kernels.transforms import positive_inverse, interval_inverse


def _setup(kernel, d=3, iso=False, n=40, seed=0):
    rng = np.random.RandomState(seed)
    X = jnp.asarray(rng.rand(n, d) * 6)
    y = jnp.asarray(np.sin(np.asarray(X)[:, 0]) + 0.1 * rng.rand(n))
    mask = jnp.asarray((rng.rand(n) > 0.2).astype(np.float64))
    dls = 1 if iso else d
    bounds = {"ls_lo": jnp.zeros(dls), "ls_hi": jnp.full(dls, 5.0),
              "var_lo": jnp.asarray(1e-4), "var_hi": jnp.asarray(10.0)}
    u = {"lengthscale": interval_inverse(jnp.full(dls, 1.3),
                                         bounds["ls_lo"], bounds["ls_hi"]),
         "variance": interval_inverse(jnp.asarray(0.8),
                                      bounds["var_lo"], bounds["var_hi"]),
         "noise": positive_inverse(jnp.asarray(0.2))}
    if kernel == "RationalQuadratic":
        u["alpha"] = positive_inverse(jnp.asarray(1.7))
    return X, y, mask, bounds, u


@pytest.mark.parametrize("kernel", ["RBF", "Matern52", "RationalQuadratic"])
@pytest.mark.parametrize("iso", [False, True])
def test_fast_grads_match_autodiff(kernel, iso):
    X, y, mask, bounds, u = _setup(kernel, iso=iso)
    jitter = 1e-10

    def loss_fast(u):
        return engine.exact_loss(u, X, y, mask, bounds, jitter,
                                 kernel=kernel)

    def loss_ref(u):
        p = engine.constrain(u, bounds)
        return (engine._exact_nll_autodiff(p, X, y, mask, jitter, kernel)
                - engine._log_jacobian(u, bounds))

    v1, g1 = jax.value_and_grad(loss_fast)(u)
    v2, g2 = jax.value_and_grad(loss_ref)(u)
    assert abs(float(v1 - v2)) < 1e-10
    assert set(g1) == set(g2)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-9, atol=1e-12, err_msg=k)


def test_fast_path_value_matches_reference_nll():
    """The forward value itself equals the plain masked NLL."""
    X, y, mask, bounds, u = _setup("RBF")
    p = engine.constrain(u, bounds)
    fast = float(engine._nll_fast("RBF", p, X, y, mask, 1e-10))
    ref = float(engine._exact_nll_autodiff(p, X, y, mask, 1e-10, "RBF"))
    assert abs(fast - ref) < 1e-10


def test_task_mll_fast_matches_autodiff():
    """The per-task (EELS 'parallel GP') loss with constant mean must give
    identical gradients through the fast path and plain autodiff."""
    from gpim_tpu.gpreg import multi

    rng = np.random.RandomState(3)
    n, d, T = 30, 2, 4
    X = jnp.asarray(rng.rand(n, d) * 6)
    Y = jnp.asarray(rng.rand(n, T))
    mask = jnp.asarray((rng.rand(n) > 0.2).astype(np.float64))
    bounds = {"ls_lo": jnp.zeros(d), "ls_hi": jnp.full(d, 5.0)}
    u = {"lengthscale": jnp.zeros((T, d)),
         "outputscale": jnp.zeros((T,)),
         "noise": jnp.full((T,), -1.0),
         "mean": jnp.full((T,), 0.3)}

    def loss_fast(u):
        return multi._iv_loss(u, X, Y, mask, bounds, 1e-10, kernel="RBF")

    def loss_ref(u):
        def one(ut, yt):
            p = multi._constrain_task(ut, bounds)
            kfn = multi.get_kernel_fn("RBF")
            A = multi._masked_gram(kfn, p, X, mask, 1e-10)
            L = jnp.linalg.cholesky(A)
            ym = (yt - p["mean"]) * mask
            z = multi.solve_triangular(L, ym, lower=True)
            return (0.5 * jnp.dot(z, z)
                    + jnp.sum(jnp.log(jnp.diagonal(L)) * mask)
                    + 0.5 * jnp.sum(mask) * multi._LOG_2PI)
        nll = jnp.sum(jax.vmap(one, in_axes=(0, 1))(u, Y))
        from gpim_tpu.kernels.transforms import interval_log_jacobian
        jac = jax.vmap(lambda l: interval_log_jacobian(
            l, bounds["ls_lo"], bounds["ls_hi"]))(u["lengthscale"])
        return nll - jnp.sum(jac)

    v1, g1 = jax.value_and_grad(loss_fast)(u)
    v2, g2 = jax.value_and_grad(loss_ref)(u)
    assert abs(float(v1 - v2)) < 1e-9
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-8, atol=1e-12, err_msg=k)


def test_vfe_wide_core_matches_autodiff():
    """engine._vfe_wide's closed-form backward (one wide gemm via the
    A Kmn^T = sqrt(noise)(B-I)Lm^T identity) must equal autodiff of the
    naive whitened formulation to f64 round-off - values AND all gradients
    (Xu, lengthscale, variance, noise)."""
    import math
    from gpim_tpu.gpreg import engine
    from gpim_tpu.kernels.functional import get_kernel_fn, kernel_diag
    from gpim_tpu.kernels.transforms import positive_inverse
    from gpim_tpu.ops.linalg import safe_cholesky
    from gpim_tpu.ops.tri import tri_inverse
    from jax.scipy.linalg import solve_triangular

    dtype = jnp.float64
    n, m, d = 150, 12, 2
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.rand(n, d) * 5, dtype)
    y = jnp.asarray(np.sin(np.asarray(X)[:, 0]) + 0.05 * rng.randn(n), dtype)
    mask = jnp.asarray((rng.rand(n) < 0.9).astype(np.float64))
    bounds = {"ls_lo": jnp.zeros((d,), dtype),
              "ls_hi": jnp.full((d,), 5.0, dtype),
              "var_lo": jnp.asarray(1e-4, dtype),
              "var_hi": jnp.asarray(10.0, dtype)}
    u = {"lengthscale": jnp.asarray(rng.randn(d) * 0.3, dtype),
         "variance": jnp.asarray(0.2, dtype),
         "noise": positive_inverse(jnp.asarray(0.3, dtype)),
         "Xu": jnp.asarray(rng.rand(m, d) * 5, dtype)}
    jitter = jnp.asarray(1e-8, dtype)

    def naive(u):
        kfn = get_kernel_fn("RBF")
        p = engine.constrain(u, bounds)
        Xu, noise = p["Xu"], p["noise"]
        mm = Xu.shape[0]
        Kmm = kfn(p, Xu, Xu) + jitter * jnp.eye(mm, dtype=dtype)
        Kmn = kfn(p, Xu, X) * mask[None, :]
        Lm = safe_cholesky(Kmm)
        A = (tri_inverse(Lm) @ Kmn) / jnp.sqrt(noise)
        B = jnp.eye(mm, dtype=dtype) + A @ A.T
        LB = safe_cholesky(B)
        ym = y * mask
        c = solve_triangular(LB, A @ ym, lower=True) / jnp.sqrt(noise)
        tr = jnp.sum(kernel_diag("RBF", p, X) * mask) / noise \
            - jnp.sum(A * A)
        nll = (0.5 * jnp.sum(mask) * (math.log(2 * math.pi)
                                      + jnp.log(noise))
               + jnp.sum(jnp.log(jnp.diagonal(LB)))
               + 0.5 * jnp.dot(ym, ym) / noise
               - 0.5 * jnp.dot(c, c) + 0.5 * tr)
        return nll - engine._log_jacobian(u, bounds)

    fast = lambda u: engine.vfe_loss(u, X, y, mask, bounds, jitter,
                                     kernel="RBF")
    v1, g1 = jax.value_and_grad(naive)(u)
    v2, g2 = jax.value_and_grad(fast)(u)
    assert abs(float(v1 - v2)) < 1e-10
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-9, atol=1e-12, err_msg=k)


def test_spectral_mll_from_gram_matches_autodiff():
    """The spectral path's gram-level closed-form backward
    (engine.mll_from_gram) must equal full autodiff through the Cholesky
    to f64 round-off for every spectral parameter."""
    import math
    from gpim_tpu.gpreg import structured
    from gpim_tpu.ops.linalg import safe_cholesky
    from jax.scipy.linalg import solve_triangular

    dtype = jnp.float64
    n, d, Q = 150, 2, 3
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.rand(n, d) * 8, dtype)
    y = jnp.asarray(np.sin(2 * np.asarray(X)[:, 0]) + 0.05 * rng.randn(n),
                    dtype)
    mask = jnp.asarray((rng.rand(n) < 0.9).astype(np.float64))
    u = structured.init_spectral_params(
        np.asarray(X), np.asarray(y), Q, 0, np.float64)
    jitter = jnp.asarray(1e-8, dtype)

    def naive(u):
        p = structured._constrain_sm(u)
        A = structured._sm_system(p, X, mask, jitter)
        L = safe_cholesky(A)
        ym = (y - p["mean"]) * mask
        z = solve_triangular(L, ym, lower=True)
        return (0.5 * jnp.dot(z, z)
                + jnp.sum(jnp.log(jnp.diagonal(L)) * mask)
                + 0.5 * jnp.sum(mask) * math.log(2 * math.pi))

    fast = lambda u: structured._sm_loss(u, X, y, mask, jitter)
    v1, g1 = jax.value_and_grad(naive)(u)
    v2, g2 = jax.value_and_grad(fast)(u)
    assert abs(float(v1 - v2)) < 1e-10
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-9, atol=1e-12, err_msg=k)
