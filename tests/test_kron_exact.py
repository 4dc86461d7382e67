"""
Exact Kronecker grid inference (ops/kron_exact.py): value, gradients and
predictions must match brute-force dense computation with the explicitly
materialized Kronecker covariance.
"""

import numpy as np
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from gpim_tpu.ops import kron_exact


def _rbf_factor(g, ls, var=1.0):
    d2 = (g[:, None] - g[None, :]) ** 2 / ls ** 2
    return var * jnp.exp(-0.5 * d2)


def _setup(seed=0, dims=(5, 6, 7)):
    rng = np.random.RandomState(seed)
    axes = [jnp.asarray(np.sort(rng.rand(s) * 4)) for s in dims]
    ls = [0.9, 1.3, 0.7]
    factors = [_rbf_factor(axes[k], ls[k], 1.4 if k == 0 else 1.0)
               for k in range(3)]
    Y = jnp.asarray(rng.rand(*dims))
    noise = jnp.asarray(0.05)
    return axes, ls, factors, Y, noise


def _dense_nll(factors, noise, Y):
    A = np.kron(np.kron(np.asarray(factors[0]), np.asarray(factors[1])),
                np.asarray(factors[2]))
    A = A + float(noise) * np.eye(A.shape[0])
    yf = np.asarray(Y).reshape(-1)
    L = np.linalg.cholesky(A)
    import scipy.linalg as sla
    z = sla.solve_triangular(L, yf, lower=True)
    return (0.5 * z @ z + np.sum(np.log(np.diag(L)))
            + 0.5 * len(yf) * np.log(2 * np.pi))


def test_kron_nll_value():
    _, _, factors, Y, noise = _setup()
    got = float(kron_exact.kron_nll(tuple(factors), noise, Y))
    want = _dense_nll(factors, noise, Y)
    assert_allclose(got, want, rtol=1e-9)


def test_kron_nll_gradients_vs_dense_autodiff():
    _, _, factors, Y, noise = _setup()

    def dense_loss(factors, noise, Y):
        A = jnp.kron(jnp.kron(factors[0], factors[1]), factors[2])
        A = A + noise * jnp.eye(A.shape[0], dtype=A.dtype)
        yf = Y.reshape(-1)
        L = jnp.linalg.cholesky(A)
        z = jax.scipy.linalg.solve_triangular(L, yf, lower=True)
        return (0.5 * z @ z + jnp.sum(jnp.log(jnp.diagonal(L)))
                + 0.5 * yf.size * jnp.log(2 * jnp.pi))

    g_fast = jax.grad(lambda f, n, y: kron_exact.kron_nll(tuple(f), n, y),
                      argnums=(0, 1, 2))(factors, noise, Y)
    g_ref = jax.grad(dense_loss, argnums=(0, 1, 2))(factors, noise, Y)
    for a, b in zip(g_fast[0], g_ref[0]):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-10)
    assert_allclose(float(g_fast[1]), float(g_ref[1]), rtol=1e-8)
    assert_allclose(np.asarray(g_fast[2]), np.asarray(g_ref[2]),
                    rtol=1e-7, atol=1e-10)


def test_kron_predict_matches_dense_gp():
    axes, ls, factors, Y, noise = _setup()
    rng = np.random.RandomState(1)
    m = 17
    Xt = jnp.asarray(rng.rand(m, 3) * 4)

    def cross(k):
        def e(xcol):
            d2 = (xcol[:, None] - axes[k][None, :]) ** 2 / ls[k] ** 2
            return (1.4 if k == 0 else 1.0) * jnp.exp(-0.5 * d2)
        return e

    chunks = Xt.reshape(1, m, 3)
    mean, var = kron_exact.kron_predict_chunks(
        tuple(factors), [cross(k) for k in range(3)], noise, Y,
        jnp.asarray(1.4), chunks, noiseless=False)

    # dense reference
    A = np.kron(np.kron(np.asarray(factors[0]), np.asarray(factors[1])),
                np.asarray(factors[2]))
    A = A + float(noise) * np.eye(A.shape[0])
    yf = np.asarray(Y).reshape(-1)
    # explicit row construction
    E0 = np.asarray(cross(0)(Xt[:, 0]))
    E1 = np.asarray(cross(1)(Xt[:, 1]))
    E2 = np.asarray(cross(2)(Xt[:, 2]))
    rows = np.einsum("ba,bc,bd->bacd", E0, E1, E2).reshape(m, -1)
    alpha = np.linalg.solve(A, yf)
    mean_ref = rows @ alpha
    var_ref = 1.4 - np.einsum("bi,ij,bj->b", rows,
                              np.linalg.inv(A), rows) + float(noise)
    assert_allclose(np.asarray(mean)[:m], mean_ref, rtol=1e-7, atol=1e-9)
    assert_allclose(np.asarray(var)[:m], var_ref, rtol=1e-6, atol=1e-8)


def test_skgpr_routes_full_grid_to_kron():
    """skreconstructor picks the exact Kronecker engine for full-grid
    no-NaN data above the structured-size threshold, and reconstructs it."""
    from gpim_tpu.gpreg.skgpr import skreconstructor
    from gpim_tpu.utils import gridutils
    rng = np.random.RandomState(0)
    t = np.linspace(0, 4, 24)
    R = (np.sin(t)[:, None, None] * np.cos(t)[None, :, None]
         * np.linspace(1, 2, 24)[None, None, :])
    R = R + 0.01 * rng.randn(*R.shape)
    R = (R - R.min()) / np.ptp(R)
    X = gridutils.get_full_grid(R)
    model = skreconstructor(X, R, X, kernel="RBF", ski=True,
                            iterations=30, verbose=0,
                            ski_min_points=1000, precision="single")
    assert model._kron_engine is not None
    mean, sd, hp = model.run()
    assert mean.shape == R.shape and sd.shape == R.shape
    assert not np.isnan(mean).any() and not np.isnan(sd).any()
    rmse = float(np.sqrt(np.mean((mean - R) ** 2)))
    assert rmse < 0.1
    assert hp["lengthscale"].shape[0] == 30
