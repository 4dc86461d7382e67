"""
VFE sparse-GP bound correctness: with inducing points equal to the training
inputs, the Titsias bound equals the exact marginal likelihood (trace term
vanishes, Q_nn = K_nn), and predictions coincide with the exact GP.
"""

import numpy as np
from numpy.testing import assert_allclose

import jax.numpy as jnp

from gpim_tpu.gpreg import engine
from gpim_tpu.kernels.transforms import positive_inverse, interval_inverse


def _setup(n=30, d=2, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.rand(n, d) * 6
    y = np.sin(X[:, 0]) + 0.1 * rng.rand(n)
    bounds = {
        "ls_lo": jnp.zeros(d), "ls_hi": jnp.full(d, 5.0),
        "var_lo": jnp.asarray(1e-4), "var_hi": jnp.asarray(10.0),
    }
    u = {
        "lengthscale": interval_inverse(jnp.full(d, 1.0),
                                        bounds["ls_lo"], bounds["ls_hi"]),
        "variance": interval_inverse(jnp.asarray(1.0),
                                     bounds["var_lo"], bounds["var_hi"]),
        "noise": positive_inverse(jnp.asarray(0.2)),
    }
    return X, y, bounds, u


def test_vfe_equals_exact_when_xu_is_x():
    X, y, bounds, u = _setup()
    n = len(X)
    mask = jnp.ones(n)
    jitter = 1e-9
    exact = float(engine.exact_loss(
        u, jnp.asarray(X), jnp.asarray(y), mask, bounds, jitter,
        kernel="RBF"))
    u_sp = dict(u, Xu=jnp.asarray(X))
    vfe = float(engine.vfe_loss(
        u_sp, jnp.asarray(X), jnp.asarray(y), mask, bounds, jitter,
        kernel="RBF"))
    assert_allclose(vfe, exact, rtol=1e-6)


def test_vfe_predictions_match_exact_when_xu_is_x():
    X, y, bounds, u = _setup()
    n = len(X)
    mask = jnp.ones(n)
    jitter = 1e-9
    Xt = np.random.RandomState(1).rand(13, 2) * 6
    chunks, nt = engine.chunk_rows(Xt, 13)
    m_e, v_e = engine.predict_exact(
        u, jnp.asarray(X), jnp.asarray(y), mask, bounds, jitter,
        jnp.asarray(chunks), kernel="RBF")
    u_sp = dict(u, Xu=jnp.asarray(X))
    m_s, v_s = engine.predict_vfe(
        u_sp, jnp.asarray(X), jnp.asarray(y), mask, bounds, jitter,
        jnp.asarray(chunks), kernel="RBF")
    assert_allclose(np.asarray(m_s), np.asarray(m_e), rtol=1e-5, atol=1e-7)
    assert_allclose(np.asarray(v_s), np.asarray(v_e), rtol=1e-4, atol=1e-7)


def test_vfe_bound_below_exact_mll():
    """The VFE evidence lower bound implies vfe_nll >= exact_nll for any
    inducing set (here a strict subset)."""
    X, y, bounds, u = _setup(n=40)
    mask = jnp.ones(40)
    jitter = 1e-9
    exact = float(engine.exact_loss(
        u, jnp.asarray(X), jnp.asarray(y), mask, bounds, jitter,
        kernel="RBF"))
    u_sp = dict(u, Xu=jnp.asarray(X[::4]))
    vfe = float(engine.vfe_loss(
        u_sp, jnp.asarray(X), jnp.asarray(y), mask, bounds, jitter,
        kernel="RBF"))
    assert vfe >= exact - 1e-8
