"""
Exact/sparse GP reconstructor tests.

Mirrors the reference's shape/NaN sanity pattern (test/test_gpreg.py:24-36)
and adds what the reference lacks (SURVEY.md section 4): numerical parity
against a direct dense-GP computation, masked-padding invariance, and sparse
(VFE) behavior checks.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from gpim_tpu.gpreg import gpr
from gpim_tpu import utils as gprutils


def get_dummy_data(seed=0, nan_holes=200):
    """20x20 Gaussian bump with random NaN punch-outs
    (reference test_gpreg.py:9-21)."""
    rng = np.random.RandomState(seed)
    h = 5
    xx, yy = np.meshgrid(np.arange(0, 100, h), np.arange(0, 100, h))
    Z = np.exp(-((xx - 25) ** 2 + (yy - 50) ** 2) / 300)
    for _ in range(nan_holes):
        Z[rng.randint(Z.shape[0]), rng.randint(Z.shape[1])] = np.nan
    return Z


@pytest.mark.parametrize('kernel', ['RBF', 'Matern52', 'RationalQuadratic'])
def test_gpr_2d_shapes(kernel):
    R = get_dummy_data()
    X = gprutils.get_sparse_grid(R)
    X_true = gprutils.get_full_grid(R)
    mean, sd, hp = gpr.reconstructor(
        X, R, X_true, kernel=kernel, learning_rate=0.1,
        iterations=2, verbose=0).run()
    assert mean.shape == sd.shape == R.shape
    assert not np.isnan(mean).any()
    assert not np.isnan(sd).any()
    assert len(hp["lengthscale"]) == 2
    assert len(hp["noise"]) == 2


def test_gpr_sparse_shapes():
    R = get_dummy_data()
    X = gprutils.get_sparse_grid(R)
    X_true = gprutils.get_full_grid(R)
    model = gpr.reconstructor(
        X, R, X_true, kernel='RBF', sparse=True, indpoints=24,
        learning_rate=0.1, iterations=3, verbose=0)
    mean, sd, hp = model.run()
    assert mean.shape == sd.shape == R.shape
    assert not np.isnan(mean).any()
    assert not np.isnan(sd).any()
    # trainable inducing-point trajectory is recorded (gpr.py:198-199 parity)
    assert hp["inducing_points"].shape[0] == 3
    assert hp["inducing_points"].shape[-1] == 2


def test_exact_gp_matches_closed_form():
    """Predictive mean/sd must equal the closed-form dense GP with the same
    hyperparameters (validates masking/padding/Cholesky plumbing exactly)."""
    rng = np.random.RandomState(1)
    X = rng.rand(40, 2) * 10
    y = np.sin(X[:, 0]) + np.cos(X[:, 1])
    Xt = rng.rand(17, 2) * 10

    # Build arrays in the reconstructor's grid format: (c, n) and (n,)
    Xg = X.T.reshape(2, 40)
    model = gpr.reconstructor(
        Xg, y.copy(), None, kernel='RBF',
        lengthscale=[[0.1, 0.1], [5.0, 5.0]],
        iterations=5, learning_rate=0.05, verbose=0, precision="double")
    model.train()
    mean, sd = model.predict(Xt.T.reshape(2, 17))

    # closed form with the learned hyperparameters
    ls = model.hyperparams["lengthscale"][-1]
    var = model.hyperparams["variance"][-1]
    noise = model.hyperparams["noise"][-1]

    def k(a, b):
        d2 = ((a[:, None, :] / ls - b[None, :, :] / ls) ** 2).sum(-1)
        return var * np.exp(-0.5 * d2)

    K = k(X, X) + (noise + model.jitter) * np.eye(40)
    Ks = k(Xt, X)
    mean_ref = Ks @ np.linalg.solve(K, y)
    var_ref = var - np.einsum(
        "ij,ji->i", Ks, np.linalg.solve(K, Ks.T)) + noise
    assert_allclose(mean, mean_ref.reshape(mean.shape), rtol=1e-6, atol=1e-8)
    assert_allclose(sd, np.sqrt(var_ref).reshape(sd.shape),
                    rtol=1e-6, atol=1e-8)


def test_padding_invariance():
    """Loss and predictions must be identical whatever the padding bucket
    (the masked-MLL construction makes padding exactly inert)."""
    import jax.numpy as jnp
    from gpim_tpu.gpreg import engine

    rng = np.random.RandomState(2)
    n, d = 37, 2
    X = rng.rand(n, d)
    y = rng.rand(n)
    u = {
        "lengthscale": jnp.zeros(d, jnp.float64),
        "variance": jnp.asarray(0.3, jnp.float64),
        "noise": jnp.asarray(-1.0, jnp.float64),
    }
    bounds = {
        "ls_lo": jnp.zeros(d, jnp.float64),
        "ls_hi": jnp.full(d, 10.0),
        "var_lo": jnp.asarray(1e-4, jnp.float64),
        "var_hi": jnp.asarray(10.0, jnp.float64),
    }
    losses = []
    for bucket in (37, 64, 128):
        Xp, _ = engine.pad_rows(X, bucket)
        yp, _ = engine.pad_rows(y, bucket)
        mask = np.zeros(len(Xp))
        mask[:n] = 1.0
        losses.append(float(engine.exact_loss(
            u, jnp.asarray(Xp), jnp.asarray(yp), jnp.asarray(mask),
            bounds, 1e-6, kernel="RBF")))
    assert_allclose(losses[0], losses[1], rtol=1e-10)
    assert_allclose(losses[0], losses[2], rtol=1e-10)


def test_update_data_and_retrain():
    """BO-style posterior update: growing data within a bucket re-uses the
    compiled program and hyperparams accumulate across train() calls."""
    R = get_dummy_data()
    X = gprutils.get_sparse_grid(R)
    X_true = gprutils.get_full_grid(R)
    model = gpr.reconstructor(X, R, X_true, iterations=2, verbose=0)
    model.train()
    # reveal a few more pixels
    R2 = R.copy()
    nans = np.argwhere(np.isnan(R2))[:5]
    for i, j in nans:
        R2[i, j] = 0.5
    model.update_data(gprutils.get_sparse_grid(R2), R2)
    model.train()
    assert len(model.hyperparams["lengthscale"]) == 4
    mean, sd = model.predict()
    assert mean.shape == R.shape


def test_single_vs_double_precision_tolerance():
    """SURVEY section 4 implication: f32 (the TPU default) must track the
    f64 reference within loose-but-meaningful tolerances on the same data,
    training run and prediction."""
    rng = np.random.RandomState(5)
    R = np.exp(-((np.indices((16, 16))[0] - 8.0) ** 2 +
                 (np.indices((16, 16))[1] - 6.0) ** 2) / 20.0)
    R = R + 0.01 * rng.randn(16, 16)
    R[rng.rand(16, 16) < 0.4] = np.nan
    from gpim_tpu import utils
    X = utils.get_sparse_grid(R)
    Xf = utils.get_full_grid(R)

    out = {}
    for prec in ("single", "double"):
        m = gpr.reconstructor(X, R.copy(), Xf, kernel="RBF",
                              iterations=60, learning_rate=0.05,
                              verbose=0, precision=prec)
        mean, sd, hp = m.run()
        out[prec] = (mean, sd, hp)

    m32, s32, h32 = out["single"]
    m64, s64, h64 = out["double"]
    assert_allclose(m32, m64, rtol=0, atol=5e-3)
    assert_allclose(s32, s64, rtol=0, atol=5e-3)
    assert_allclose(h32["lengthscale"][-1], h64["lengthscale"][-1],
                    rtol=1e-2)
    assert_allclose(h32["noise"][-1], h64["noise"][-1], rtol=0, atol=1e-3)
