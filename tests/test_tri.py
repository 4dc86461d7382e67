"""
Batched-bisection triangular inverse (ops/tri.py): numerical parity with
the direct XLA solve, vmap compatibility, and gradient flow — this op sits
on the exact-MLL training hot path (engine._nll_fast_bwd).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from gpim_tpu.ops.tri import tri_inverse, inv_from_cholesky


def _spd_chol(n, seed=0, dtype=np.float64):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, max(8, n // 16))
    A = X @ X.T + n * np.eye(n)
    return np.linalg.cholesky(A).astype(dtype)


def test_tri_inverse_matches_direct_solve():
    # covers: below-bisect fallback (768), exact power-of-two split (4096),
    # and an odd multiple of 128 where only partial bisection divides (1664)
    for n in (768, 1664, 4096):
        L = _spd_chol(n)
        V = np.asarray(tri_inverse(jnp.asarray(L)))
        Vref = np.asarray(
            solve_triangular(jnp.asarray(L), jnp.eye(n), lower=True))
        np.testing.assert_allclose(V, Vref, rtol=0, atol=1e-9)
        # strict lower-triangularity of the result
        assert np.allclose(np.triu(V, 1), 0.0)


def test_inv_from_cholesky_is_matrix_inverse():
    n = 2048
    L = _spd_chol(n, seed=1)
    A = L @ L.T
    Ainv = np.asarray(inv_from_cholesky(jnp.asarray(L)))
    resid = np.abs(Ainv @ A - np.eye(n)).max()
    assert resid < 1e-6, resid


def test_tri_inverse_under_vmap():
    Ls = np.stack([_spd_chol(2048, seed=s) for s in range(3)])
    Vs = np.asarray(jax.vmap(tri_inverse)(jnp.asarray(Ls)))
    for L, V in zip(Ls, Vs):
        ref = np.asarray(
            solve_triangular(jnp.asarray(L), jnp.eye(2048), lower=True))
        np.testing.assert_allclose(V, ref, rtol=0, atol=1e-9)


def test_tri_inverse_differentiable():
    # the op feeds a custom VJP today, but it must stay differentiable so it
    # can sit inside autodiff losses (e.g. the VFE path if wired later)
    n = 2048
    L = jnp.asarray(_spd_chol(n, seed=2))

    def f(L):
        return jnp.sum(tri_inverse(jnp.tril(L)) ** 2)

    def f_ref(L):
        V = solve_triangular(jnp.tril(L), jnp.eye(n, dtype=L.dtype),
                             lower=True)
        return jnp.sum(V ** 2)

    g = jax.grad(f)(L)
    g_ref = jax.grad(f_ref)(L)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-8)
