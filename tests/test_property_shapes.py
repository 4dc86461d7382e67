"""
Property-style robustness sweep: randomized grid shapes, dimensionalities,
NaN fractions and kernels through every model family's full run() path.

The reference's tests cover two fixed shapes (SURVEY.md section 4); padding
buckets, mask plumbing, and grid generation here are shape-generic code
whose failure modes are exactly "some shape nobody tried" - this sweep
pins the contract: output shapes mirror the input grid, observed-pixel
outputs are finite, sd is non-negative, and NaN test rows produce NaN
outputs (the acquisition-function contract).
"""

import numpy as np
import pytest

from gpim_tpu import (boptimizer, reconstructor, skreconstructor, utils,
                      vreconstructor)


def _make_grid(rng, shape, nan_frac):
    base = rng.standard_normal(shape)
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(base, sigma=2.0)
    base = (base - base.min()) / max(np.ptp(base), 1e-9)
    R = base + 0.05 * rng.standard_normal(shape)
    mask = rng.random(shape) < nan_frac
    # never mask everything
    mask.ravel()[rng.integers(0, R.size, 5)] = False
    R[mask] = np.nan
    return R


CASES = [
    # (shape, nan_frac, kernel, seed)
    ((9, 13), 0.35, "RBF", 0),
    ((16, 7), 0.6, "Matern52", 1),
    ((21, 21), 0.5, "RationalQuadratic", 2),
    ((6, 7, 8), 0.45, "RBF", 3),
    ((5, 5, 30), 0.7, "Matern52", 4),
]


@pytest.mark.parametrize("shape,nan_frac,kernel,seed", CASES)
def test_reconstructor_any_shape(shape, nan_frac, kernel, seed):
    rng = np.random.default_rng(seed)
    R = _make_grid(rng, shape, nan_frac)
    X = utils.get_sparse_grid(R)
    Xf = utils.get_full_grid(R)
    mean, sd, hp = reconstructor(
        X, R, Xf, kernel=kernel, iterations=3, verbose=0).run()
    assert mean.shape == sd.shape == shape
    assert np.isfinite(mean).all() and np.isfinite(sd).all()
    assert (sd >= 0).all()
    assert len(hp["lengthscale"]) == 3


@pytest.mark.parametrize("shape,nan_frac,kernel,seed", CASES[:3])
def test_reconstructor_sparse_any_shape(shape, nan_frac, kernel, seed):
    rng = np.random.default_rng(seed + 10)
    R = _make_grid(rng, shape, nan_frac)
    X = utils.get_sparse_grid(R)
    Xf = utils.get_full_grid(R)
    n_obs = int((~np.isnan(R)).sum())
    mean, sd, _ = reconstructor(
        X, R, Xf, kernel=kernel, sparse=True,
        indpoints=min(16, n_obs), iterations=3, verbose=0).run()
    assert mean.shape == shape
    assert np.isfinite(mean).all() and (sd >= 0).all()


@pytest.mark.parametrize("shape,nan_frac,kernel,seed",
                         [CASES[0], CASES[3], ((4, 5, 4, 6), 0.4, "RBF", 7)])
def test_skreconstructor_any_shape(shape, nan_frac, kernel, seed):
    if kernel == "RationalQuadratic":
        kernel = "RBF"  # skgpr surface is RBF/Matern52/Spectral
    rng = np.random.default_rng(seed + 20)
    R = _make_grid(rng, shape, nan_frac)
    X = utils.get_sparse_grid(R)
    Xf = utils.get_full_grid(R)
    mean, sd, _ = skreconstructor(
        X, R, Xf, kernel=kernel, iterations=3, verbose=0).run()
    assert mean.shape == shape
    assert np.isfinite(mean).all() and (sd >= 0).all()


@pytest.mark.parametrize("shape,T,independent,seed", [
    ((8, 11), 2, True, 0),
    ((10, 9), 4, True, 1),
    ((7, 7), 3, False, 2),
    ((12, 6), 2, False, 3),
])
def test_vreconstructor_any_shape(shape, T, independent, seed):
    rng = np.random.default_rng(seed + 30)
    base = _make_grid(rng, shape, 0.0)
    Y = np.stack([base * (t + 1) * 0.4 + 0.05 * rng.standard_normal(shape)
                  for t in range(T)], axis=-1)
    drop = rng.random(shape) < 0.4
    Y[drop] = np.nan
    X = utils.get_full_grid(Y[..., 0]).copy()
    X[:, drop] = np.nan
    Xf = utils.get_full_grid(Y[..., 0])
    mean, sd, _ = vreconstructor(
        X, Y, Xf, independent=independent, iterations=3, verbose=0).run()
    assert mean.shape == sd.shape == shape + (T,)
    assert np.isfinite(mean).all() and (sd >= 0).all()


def test_predict_nan_rows_stay_nan_any_shape():
    """The EI/POI acquisition path predicts on a NaN-holed sparse grid and
    relies on NaN rows propagating to NaN outputs."""
    rng = np.random.default_rng(5)
    R = _make_grid(rng, (11, 14), 0.5)
    X = utils.get_sparse_grid(R)
    m = reconstructor(X, R, utils.get_full_grid(R), kernel="RBF",
                      iterations=2, verbose=0)
    m.train()
    mean, sd = m.predict(X)
    holes = np.isnan(R)
    assert np.isnan(mean[holes]).all()
    assert np.isfinite(mean[~holes]).all()


def test_bo_any_grid_shape():
    rng = np.random.default_rng(6)
    size = (13, 17)

    def target(idx):
        i, j = idx
        return float(np.exp(-((i - 4.0) ** 2 + (j - 11.0) ** 2) / 12.0))

    Y = np.full(size, np.nan)
    for i, j in zip(rng.integers(0, size[0], 5),
                    rng.integers(0, size[1], 5)):
        Y[i, j] = target((i, j))
    X = utils.get_sparse_grid(Y)
    Xf = utils.get_full_grid(Y)
    bo = boptimizer(X, Y, Xf, target_function=target,
                    acquisition_function="cb", exploration_steps=3,
                    gp_iterations=5, verbose=0)
    bo.run()
    vals = np.asarray(bo.target_func_vals, dtype=float).ravel()
    assert np.isfinite(np.nanmax(vals))
    assert all(0 <= i < size[0] and 0 <= j < size[1]
               for i, j in np.asarray(bo.indices_all).reshape(-1, 2))
