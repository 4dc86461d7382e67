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


def test_fused_masked_system_matches_xla():
    """(Kt, A) from the fused kernel must match the XLA construction for
    every supported kernel family (interpret mode on CPU)."""
    import jax
    from functools import partial
    from gpim_tpu.ops import pallas_gram
    from gpim_tpu.ops.gram import pairwise_sq_dist
    from gpim_tpu.gpreg.engine import _masked_system, _kernel_from_sqdist

    rng = np.random.RandomState(0)
    n, d = 256, 3
    X = jnp.asarray(rng.rand(n, d) * 20, jnp.float32)
    mask = jnp.asarray((rng.rand(n) > 0.15).astype(np.float32))
    for kernel, alpha in [("RBF", None), ("Matern52", None),
                          ("RationalQuadratic", 1.3)]:
        p = {"lengthscale": jnp.asarray([2.0, 3.0, 1.5], jnp.float32),
             "variance": jnp.asarray(0.7, jnp.float32),
             "noise": jnp.asarray(0.05, jnp.float32)}
        if alpha:
            p["alpha"] = jnp.asarray(alpha, jnp.float32)
        Xs = X / p["lengthscale"]
        Kt, A = jax.jit(partial(
            pallas_gram.fused_masked_system_pallas, kernel=kernel))(
            Xs, mask, p["variance"], p["noise"] + 1e-4, p.get("alpha"))
        s = pairwise_sq_dist(Xs, Xs)
        Kt_ref = _kernel_from_sqdist(kernel, p, s)
        A_ref = _masked_system(Kt_ref, p["noise"], mask, 1e-4)
        assert_allclose(np.asarray(Kt), np.asarray(Kt_ref),
                        rtol=2e-4, atol=2e-5, err_msg=kernel)
        assert_allclose(np.asarray(A), np.asarray(A_ref),
                        rtol=2e-4, atol=2e-5, err_msg=kernel)


def test_bwd_reductions_match_dense():
    import jax
    from gpim_tpu.ops.pallas_gram import rbf_bwd_reductions_pallas

    rng = np.random.RandomState(1)
    n, d = 256, 2
    Ainv = rng.rand(n, n).astype(np.float32)
    Ainv = 0.5 * (Ainv + Ainv.T)
    Kt = rng.rand(n, n).astype(np.float32)
    Kt = 0.5 * (Kt + Kt.T)
    alpha = rng.rand(n).astype(np.float32)
    mask = (rng.rand(n) > 0.2).astype(np.float32)
    X = rng.rand(n, d).astype(np.float32)
    s1, rw, wx, dg = jax.jit(rbf_bwd_reductions_pallas)(
        jnp.asarray(Ainv), jnp.asarray(Kt), jnp.asarray(alpha),
        jnp.asarray(mask), jnp.asarray(X))
    W = ((Ainv.astype(np.float64) - np.outer(alpha, alpha))
         * np.outer(mask, mask) * Kt)
    assert_allclose(float(s1), W.sum(), rtol=1e-5)
    assert_allclose(np.asarray(rw), W.sum(1), rtol=1e-4, atol=1e-4)
    assert_allclose(np.asarray(wx), W @ X, rtol=1e-4, atol=1e-4)
    assert_allclose(float(dg), float((np.diag(Ainv) * mask ** 2).sum()),
                    rtol=1e-5)
