"""
Grid-utility semantics tests (reference gprutils.py:23-382 contracts).
"""

import numpy as np
import pytest
from numpy.testing import assert_array_equal, assert_allclose

from gpim_tpu.utils import gridutils as g


def test_prepare_training_data_drops_nans():
    R = np.arange(12, dtype=float).reshape(3, 4)
    R[1, 2] = np.nan
    X = g.get_full_grid(R).copy()
    X[:, 1, 2] = np.nan
    Xp, yp = g.prepare_training_data(X, R)
    assert Xp.shape == (11, 2)
    assert yp.shape == (11,)
    assert not np.isnan(Xp).any() and not np.isnan(yp).any()
    # row order is flatten-order of the grid
    assert_array_equal(Xp[0], [0, 0])
    assert yp[0] == 0.0


def test_prepare_training_data_vector_valued():
    Y = np.random.RandomState(0).rand(4, 4, 3)
    Y[2, 2, 1] = np.nan  # one bad channel kills the whole row
    X = g.get_full_grid(Y[..., 0]).copy()
    X[:, 2, 2] = np.nan  # X carries its own NaN marks (reference semantics)
    Xp, Yp = g.prepare_training_data(X, Y, vector_valued=True)
    assert Xp.shape == (15, 2)
    assert Yp.shape == (15, 3)


def test_full_grid_matches_mgrid():
    R = np.zeros((5, 7))
    X = g.get_full_grid(R)
    c1, c2 = np.mgrid[0:5:1.0, 0:7:1.0]
    assert_array_equal(X, np.array([c1, c2]))


def test_full_grid_dense_x_super_resolution():
    R = np.zeros((4, 4))
    X = g.get_full_grid(R, dense_x=0.5)
    assert X.shape == (2, 8, 8)
    assert X[0, 1, 0] == 0.5


def test_full_grid_extent_2d():
    R = np.zeros((10, 10))
    X = g.get_full_grid(R, extent=[[0, 5], [0, 5]])
    assert X.shape[0] == 2
    assert X[0].min() == 0
    assert X[0].max() < 5


def test_full_grid_extent_3d():
    """Broken in the reference (gprutils.py:147-149 mgrid unpack bug)."""
    R = np.zeros((8, 8, 4))
    X = g.get_full_grid(R, extent=[[0, 4], [0, 4], [0, 2]])
    assert X.shape[0] == 3
    assert X.shape[1:] == (8, 8, 4)


def test_sparse_grid_2d():
    R = np.random.RandomState(0).rand(6, 6)
    R[R < 0.4] = np.nan
    X = g.get_sparse_grid(R)
    nan_cols = np.isnan(R)
    assert np.isnan(X[0][nan_cols]).all()
    assert not np.isnan(X[0][~nan_cols]).any()


def test_sparse_grid_3d_xy_sparsity():
    """Whole spectra NaN per pixel: xy-sparsity branch
    (gprutils.py:195-200)."""
    R = np.random.RandomState(1).rand(5, 5, 8)
    drop = np.random.RandomState(2).rand(5, 5) < 0.5
    R[drop] = np.nan
    X = g.get_sparse_grid(R)
    assert X.shape == (3, 5, 5, 8)
    assert np.isnan(X[0][drop]).all()
    assert not np.isnan(X[0][~drop]).any()


def test_sparse_grid_requires_nans():
    with pytest.raises(NotImplementedError):
        g.get_sparse_grid(np.ones((4, 4)))


def test_get_grid_indices():
    """Crashes in the reference for any dense_x (gprutils.py:103 passes
    dense_x into the extent slot)."""
    R = np.ones((5, 5))
    R[2, 2] = np.nan
    X_full, X_sparse = g.get_grid_indices(R)
    assert X_full.shape == (2, 5, 5)
    assert np.isnan(X_sparse[0, 2, 2])


def test_corrupt_image2d_roundtrip():
    R_true = np.random.RandomState(0).rand(10, 10)
    X_true = g.get_full_grid(R_true)
    X, R = g.corrupt_image2d(X_true, R_true, prob=0.5, replace_w_zeros=False)
    nan_frac = np.isnan(R).mean()
    assert 0.2 < nan_frac < 0.8
    assert_array_equal(np.isnan(X[0]), np.isnan(R))
    # deterministic (seeded)
    X2, R2 = g.corrupt_image2d(X_true, R_true, 0.5, False)
    assert_array_equal(np.isnan(R), np.isnan(R2))


def test_corrupt_image3d_removes_whole_spectra():
    R_true = np.random.RandomState(0).rand(8, 8, 5)
    X_true = g.get_full_grid(R_true)
    X, R = g.corrupt_image3d(X_true, R_true, 0.5, False)
    per_pixel = np.isnan(R).reshape(64, 5)
    # each pixel is either fully NaN or fully observed
    assert np.all(per_pixel.all(1) | (~per_pixel).all(1))


def test_open_edge_points():
    R = np.full((12, 12), np.nan)
    R_true = np.ones((12, 12))
    out = g.open_edge_points(R.copy(), R_true, s=4)
    assert np.isfinite(out[0, ::4]).all()
    assert np.isfinite(out[::4, 0]).all()


def test_to_constrained_interval():
    state = {"lengthscale_map_unconstrained": np.zeros(2),
             "variance_map_unconstrained": np.array(0.0)}
    l, a = g.to_constrained_interval(state, [[0., 0.], [10., 10.]],
                                     [1e-4, 10.])
    assert_allclose(l, [5.0, 5.0])
    assert_allclose(a, (1e-4 + 10.) / 2)
    # the reference's misspelled key is accepted too
    state2 = {"lenghtscale_map_unconstrained": np.zeros(2),
              "variance_map_unconstrained": np.array(0.0)}
    l2, _ = g.to_constrained_interval(state2, [[0., 0.], [10., 10.]],
                                      [1e-4, 10.])
    assert_allclose(l2, l)
