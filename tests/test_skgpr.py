"""
skreconstructor tests: shape/NaN sanity per kernel (reference
test_gpreg.py:39-50 pattern) plus spectral-mixture behavior and the fixed
no-Xtest path.
"""

import numpy as np
import pytest

from gpim_tpu.gpreg import skgpr
from gpim_tpu import utils as gprutils

from tests.test_gpr import get_dummy_data


@pytest.mark.parametrize('kernel', ['RBF', 'Matern52'])
def test_skgpr_2d(kernel):
    R = get_dummy_data()
    X = gprutils.get_sparse_grid(R)
    X_true = gprutils.get_full_grid(R)
    mean, sd, hp = skgpr.skreconstructor(
        X, R, X_true, kernel=kernel, learning_rate=0.1,
        iterations=2, verbose=0).run()
    assert mean.shape == sd.shape == R.shape
    assert not np.isnan(mean).any()
    assert not np.isnan(sd).any()
    assert hp["lengthscale"].shape == (2, 2)
    assert hp["noise"].shape == (2,)


def test_skgpr_spectral_2d():
    R = get_dummy_data()
    X = gprutils.get_sparse_grid(R)
    X_true = gprutils.get_full_grid(R)
    mean, sd, hp = skgpr.skreconstructor(
        X, R, X_true, kernel='Spectral', n_mixtures=3,
        learning_rate=0.1, iterations=3, verbose=0).run()
    assert mean.shape == sd.shape == R.shape
    assert not np.isnan(mean).any()
    # spectral hyperparams contract (reference skgpr.py:159-166)
    assert hp["weights"].shape == (3, 3)
    assert hp["means"].shape == (3, 3, 1, 2)
    assert hp["scales"].shape == (3, 3, 1, 2)
    assert hp["maxdim"] == 20


def test_skgpr_no_xtest():
    """predict() without Xtest must warn and fall back to training data
    (crashes in the reference, skgpr.py:118-120/290)."""
    R = get_dummy_data()
    X = gprutils.get_sparse_grid(R)
    m = skgpr.skreconstructor(X, R, None, iterations=1, verbose=0)
    m.train()
    with pytest.warns(UserWarning):
        mean, sd = m.predict()
    assert mean.shape == (m.X.shape[0],)


def test_skgpr_fit_quality():
    """A longer dense fit must actually reconstruct the Gaussian bump."""
    R = get_dummy_data()
    X = gprutils.get_sparse_grid(R)
    X_true = gprutils.get_full_grid(R)
    mean, sd, _ = skgpr.skreconstructor(
        X, R, X_true, kernel='RBF', learning_rate=0.1,
        iterations=150, verbose=0).run()
    truth = np.exp(-((np.meshgrid(np.arange(0, 100, 5),
                                  np.arange(0, 100, 5))[0] - 25) ** 2 +
                     (np.meshgrid(np.arange(0, 100, 5),
                                  np.arange(0, 100, 5))[1] - 50) ** 2) / 300)
    err = np.abs(mean - truth).mean()
    assert err < 0.05, err


def test_spectral_learns_periodic_structure():
    """Regression for the spectral-mixture init: a large noise init trapped
    training in the explain-everything-as-noise optimum (held-out rmse ~ data
    sd); the data-scaled init must recover the periodic signal."""
    import numpy as np
    from gpim_tpu import skreconstructor, utils
    rng = np.random.RandomState(0)
    t = np.linspace(0, 6 * np.pi, 24)
    R = np.sin(t)[:, None] * np.cos(t)[None, :] + 0.05 * rng.randn(24, 24)
    R = (R - R.min()) / np.ptp(R)
    R_obs = R.copy()
    R_obs[rng.rand(24, 24) < 0.25] = np.nan
    X = utils.get_sparse_grid(R_obs)
    m, s, hp = skreconstructor(X, R_obs, utils.get_full_grid(R_obs),
                               kernel="Spectral", n_mixtures=3,
                               iterations=300, verbose=0,
                               precision="single").run()
    held = np.isnan(R_obs)
    rmse = float(np.sqrt(np.mean((m[held] - R[held]) ** 2)))
    assert rmse < 0.15, rmse
