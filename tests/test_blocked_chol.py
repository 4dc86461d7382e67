"""
Blocked/bisection linear-algebra building blocks (ops/blocked_chol.py):
must match numpy to f64 machine precision, including the custom VJP.
"""

import numpy as np
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from gpim_tpu.ops.blocked_chol import (
    cholesky_blocked, tri_inverse, inv_from_cholesky)


def _spd(n, seed=0):
    rng = np.random.RandomState(seed)
    A = rng.rand(n, n)
    return A @ A.T + n * np.eye(n)


def test_cholesky_blocked_matches_numpy():
    for n in (300, 1024, 1300):
        A = _spd(n)
        L = np.asarray(cholesky_blocked(jnp.asarray(A), 256))
        assert_allclose(L, np.linalg.cholesky(A), rtol=1e-9, atol=1e-9)


def test_cholesky_blocked_vjp_matches_native():
    A = _spd(260)

    def f_blocked(A):
        return jnp.sum(jnp.log(jnp.diagonal(cholesky_blocked(A, 128))))

    def f_native(A):
        return jnp.sum(jnp.log(jnp.diagonal(jnp.linalg.cholesky(A))))

    g1 = jax.grad(f_blocked)(jnp.asarray(A))
    g2 = jax.grad(f_native)(jnp.asarray(A))
    assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-8, atol=1e-10)


def test_tri_inverse_and_potri():
    for n in (300, 1300):
        A = _spd(n, seed=n)
        L = np.linalg.cholesky(A)
        W = np.asarray(tri_inverse(jnp.asarray(L), 256))
        assert_allclose(W, np.linalg.inv(L), rtol=1e-9, atol=1e-11)
        Ai = np.asarray(inv_from_cholesky(jnp.asarray(L), 256))
        assert_allclose(Ai, np.linalg.inv(A), rtol=1e-7, atol=1e-10)
