"""
Cross-implementation behavioral parity against the REFERENCE's stored golden
Bayesian-optimization outputs (/root/reference/test/test_data/test_{ei,poi,
cb}.npy, produced by Pyro/torch with fixed seeds).

Bit-for-bit parity with a different optimizer stack is impossible (SURVEY.md
section 7 "hard parts"); what must hold is *behavioral* parity: on the same
25x25 Gaussian-peak target with the same 5-point seed, this framework's BO
must discover the same optimum the reference discovered, and its measured
set must concentrate in the same high-value region.

Skipped automatically when the reference checkout is not present.
"""

import os

import numpy as np
import pytest

from gpim_tpu import boptimizer, utils

_REF = "/root/reference/test/test_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_REF), reason="reference golden files not available")


def trial_func(idx, **kwargs):
    x0 = kwargs.get("x0", 5)
    y0 = kwargs.get("y0", 10)
    fwhm = kwargs.get("fwhm", 4.5)
    return np.exp(-4 * np.log(2) *
                  ((idx[0] - x0) ** 2 + (idx[1] - y0) ** 2) / fwhm ** 2)


def initial_seed():
    np.random.seed(0)
    x = np.arange(0, 25, 1.)
    y = x[:, np.newaxis]
    Z = trial_func([y, x])
    idx = np.random.randint(0, Z.shape[0], size=(2, 5))
    Z_sparse = np.ones_like(Z) * np.nan
    Z_sparse[idx[0], idx[1]] = Z[idx[0], idx[1]]
    return Z_sparse


@pytest.mark.parametrize("acqf", ["ei", "poi", "cb"])
def test_bo_finds_the_reference_optimum(acqf):
    ref_grid = np.load(os.path.join(_REF, "test_%s.npy" % acqf))
    ref_best = np.nanmax(ref_grid)
    ref_loc = np.unravel_index(np.nanargmax(ref_grid), ref_grid.shape)

    Z_sparse = initial_seed()
    X_full = utils.get_full_grid(Z_sparse)
    X_sparse = utils.get_sparse_grid(Z_sparse)
    bo = boptimizer(
        X_sparse, Z_sparse, X_full, trial_func,
        acquisition_function=acqf, exploration_steps=20,
        gp_iterations=200, verbose=0)
    bo.run()
    ours = np.asarray(bo.target_func_vals[-1], dtype=float)

    best = np.nanmax(ours)
    loc = np.unravel_index(np.nanargmax(ours), ours.shape)
    # at least the reference's best measured value (the true peak is 1.0
    # at (5, 10))
    assert best >= ref_best - 1e-3, (best, ref_best)
    if acqf in ("ei", "poi"):
        # exploitation-driven runs must land on the same optimum location
        assert abs(loc[0] - ref_loc[0]) <= 1 and \
            abs(loc[1] - ref_loc[1]) <= 1, (loc, ref_loc)
    # default cb is alpha=0, beta=1 - PURE uncertainty sampling; the
    # reference's own golden run never visits the peak (best 0.028), so
    # location parity is meaningless there. The matched behavior is
    # exploration coverage: same number of measurements, comparable-or-
    # better measured values.
    assert np.isfinite(ours).sum() == np.isfinite(ref_grid).sum()
    ref_mean = float(np.nanmean(ref_grid))
    our_mean = float(np.nanmean(ours))
    assert our_mean >= 0.5 * ref_mean, (our_mean, ref_mean)
