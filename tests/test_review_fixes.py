"""
Regression tests for self-review findings: extent grid generation with
non-divisible spans, BO resume with batch_update, kernel-surface validation,
and multichip prediction on non-power-of-two meshes.
"""

import numpy as np
import pytest

from gpim_tpu import boptimizer, utils


def test_full_grid_extent_non_divisible_span():
    """extent spans that do not divide the shape used to crash
    (ZeroDivisionError) or yield wrong-size axes."""
    R = np.zeros((50, 50))
    # span > shape: reference formula divides by zero
    X = utils.get_full_grid(R, extent=[[0, 100], [0, 100]])
    assert X.shape == (2, 50, 50)
    assert np.isclose(X[0].min(), 0) and X[0].max() < 100
    # span < shape and non-divisible
    X2 = utils.get_full_grid(R, extent=[[0, 30], [0, 30]])
    assert X2.shape == (2, 50, 50)
    # sparse grid must stay consistent with the full grid
    Rn = R.copy()
    Rn[10:20, 10:20] = np.nan
    Xs = utils.get_sparse_grid(Rn, extent=[[0, 30], [0, 30]])
    assert Xs.shape == (2, 50, 50)
    assert np.isnan(Xs[0][10, 10]) and not np.isnan(Xs[0][0, 0])


def test_bo_extent_runs():
    """BO with a physical-units extent re-derives the sparse grid each step
    (crashed after the first measurement before the extent fix)."""
    def trial(idx):
        return float(np.exp(-((idx[0] - 1.0) ** 2 + (idx[1] - 2.0) ** 2)))

    grid = np.full((10, 10), np.nan)
    np.random.seed(0)
    for i, j in np.random.randint(0, 10, (4, 2)):
        grid[i, j] = trial((i * 0.3, j * 0.3))
    extent = [[0, 3], [0, 3]]
    X = utils.get_sparse_grid(grid, extent)
    Xf = utils.get_full_grid(grid, extent)
    bo = boptimizer(X, grid, Xf, trial, acquisition_function="cb",
                    exploration_steps=2, gp_iterations=10, verbose=0,
                    extent=extent)
    bo.run()
    assert bo.steps_done == 2


def test_bo_resume_with_batch_update(tmp_path):
    """Resumed batch-update runs used to KeyError on the (empty) hyperparams
    trajectory; the surrogate's current parameters must be used instead."""
    def trial(idx):
        return float(np.exp(-((idx[0] - 5.) ** 2 + (idx[1] - 5.) ** 2) / 8))

    grid = np.full((12, 12), np.nan)
    np.random.seed(1)
    for i, j in np.random.randint(0, 12, (4, 2)):
        grid[i, j] = trial((i, j))
    X = utils.get_sparse_grid(grid)
    Xf = utils.get_full_grid(grid)
    kw = dict(acquisition_function="ei", exploration_steps=2,
              gp_iterations=10, verbose=0, batch_update=True,
              batch_out_max=3)
    bo = boptimizer(X, grid, Xf, trial, **kw)
    bo.run()
    f = str(tmp_path / "ck")
    bo.save_checkpoint(f)

    bo2 = boptimizer(X, grid, Xf, trial, **dict(kw, exploration_steps=3))
    bo2.load_checkpoint(f)
    bo2.run()          # continues from step 2 without touching .train() first
    assert bo2.steps_done == 3


def test_vgpr_rejects_unsupported_kernels():
    from gpim_tpu import vreconstructor
    Y = np.random.rand(6, 6, 2)
    X = utils.get_full_grid(Y[..., 0])
    with pytest.raises(NotImplementedError):
        vreconstructor(X, Y, X, kernel="RationalQuadratic", iterations=1)


def test_skgpr_rejects_unsupported_kernels():
    from gpim_tpu import skreconstructor
    R = np.random.rand(6, 6)
    X = utils.get_full_grid(R)
    with pytest.raises(NotImplementedError):
        skreconstructor(X, R, X, kernel="RationalQuadratic", iterations=1)


@pytest.mark.parametrize("n_dev", [3, 6])
def test_multichip_dryrun_non_power_of_two(n_dev):
    from gpim_tpu.parallel import multichip
    loss, mean = multichip.dryrun(n_dev)
    assert np.isfinite(loss).all() and np.isfinite(mean).all()
