"""
Fused Pallas pairwise-distance kernel: value and gradient parity with the
XLA norm-trick path (runs in interpret mode on the CPU test backend; the
same code compiles natively on TPU).
"""

import numpy as np
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from gpim_tpu.ops import pallas_gram


def _ref_sqdist(A, B):
    return ((A[:, None, :] - B[None, :, :]) ** 2).sum(-1)


def test_values_match_reference():
    rng = np.random.RandomState(0)
    A = rng.rand(256, 3).astype(np.float32) * 50
    B = rng.rand(512, 3).astype(np.float32) * 50
    out = pallas_gram.pairwise_sq_dist_pallas(
        jnp.asarray(A), jnp.asarray(B))
    assert_allclose(np.asarray(out), _ref_sqdist(A, B), rtol=1e-5, atol=1e-2)


def test_exact_zero_at_coincident_points():
    rng = np.random.RandomState(1)
    A = (rng.rand(256, 2).astype(np.float32) * 1e4)
    out = pallas_gram.pairwise_sq_dist_pallas(
        jnp.asarray(A), jnp.asarray(A))
    diag = np.diagonal(np.asarray(out))
    assert (diag == 0.0).all()


def test_gradients_match_xla():
    rng = np.random.RandomState(2)
    A = rng.rand(256, 2).astype(np.float32) * 10
    B = rng.rand(256, 2).astype(np.float32) * 10
    G = rng.rand(256, 256).astype(np.float32)

    def f_pallas(a, b):
        return jnp.sum(pallas_gram.pairwise_sq_dist_pallas(a, b)
                       * jnp.asarray(G))

    def f_ref(a, b):
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return jnp.sum(d2 * jnp.asarray(G))

    gA_p, gB_p = jax.grad(f_pallas, argnums=(0, 1))(
        jnp.asarray(A), jnp.asarray(B))
    gA_r, gB_r = jax.grad(f_ref, argnums=(0, 1))(
        jnp.asarray(A), jnp.asarray(B))
    assert_allclose(np.asarray(gA_p), np.asarray(gA_r),
                    rtol=1e-4, atol=1e-3)
    assert_allclose(np.asarray(gB_p), np.asarray(gB_r),
                    rtol=1e-4, atol=1e-3)


def test_dispatcher_routes_and_agrees():
    """ops.gram.pairwise_sq_dist must agree between the pallas-eligible
    (padded f32) and plain XLA (f64) paths."""
    from gpim_tpu.ops.gram import pairwise_sq_dist
    rng = np.random.RandomState(3)
    A = rng.rand(256, 2) * 20
    B = rng.rand(256, 2) * 20
    d32 = pairwise_sq_dist(jnp.asarray(A, jnp.float32),
                           jnp.asarray(B, jnp.float32))
    d64 = pairwise_sq_dist(jnp.asarray(A), jnp.asarray(B))
    assert_allclose(np.asarray(d32), np.asarray(d64), rtol=1e-4, atol=1e-3)
