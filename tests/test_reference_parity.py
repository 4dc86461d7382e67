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


def two_peak_func(idx, **kwargs):
    """Global peak 1.0 at (18, 6), local peak 0.6 at (6, 18)."""
    g = np.exp(-((idx[0] - 18.) ** 2 + (idx[1] - 6.) ** 2) / 10.0)
    l = 0.6 * np.exp(-((idx[0] - 6.) ** 2 + (idx[1] - 18.) ** 2) / 10.0)
    return g + l


@pytest.mark.parametrize("acqf", ["ei", "poi"])
def test_bo_two_peak_landscape(acqf):
    """Second cross-implementation landscape (VERDICT r1 item 10): a
    two-peak target where greedy exploitation of the first-found (local)
    peak fails. The reference algorithm escapes via its gamma-decayed
    distance memory (boptim.py:398-429); ours must too (improvement-based
    acquisitions only - pure confidence-bound sampling has no
    improvement signal and may legitimately settle on either peak)."""
    np.random.seed(3)
    x = np.arange(0, 25, 1.)
    Z = two_peak_func([x[:, None], x])
    idx = np.random.randint(0, 25, size=(2, 6))
    Z_sparse = np.full_like(Z, np.nan)
    Z_sparse[idx[0], idx[1]] = Z[idx[0], idx[1]]
    X_full = utils.get_full_grid(Z_sparse)
    X_sparse = utils.get_sparse_grid(Z_sparse)
    bo = boptimizer(
        X_sparse, Z_sparse, X_full, two_peak_func,
        acquisition_function=acqf, exploration_steps=25,
        gp_iterations=200, dscale=3.0, verbose=0)
    bo.run()
    ours = np.asarray(bo.target_func_vals[-1], dtype=float)
    best = float(np.nanmax(ours))
    loc = np.unravel_index(np.nanargmax(ours), ours.shape)
    assert best > 0.9, (best, loc)                      # found the GLOBAL peak
    assert abs(loc[0] - 18) <= 2 and abs(loc[1] - 6) <= 2, loc


def _reference_ckdtree_batch(indices, values, dscale, batch_out_max):
    """Direct transcription of the reference's cKDTree suppression loop
    (boptim.py:356-366) used as the behavioral oracle."""
    from scipy import spatial as sp
    values = np.asarray(values, float).copy()
    indices = np.vstack(indices)
    minval = values.min()
    new_max = values.max()
    new_max_id = int(np.argmax(values))
    out_ids = []
    ck = indices[new_max_id]
    tree = sp.cKDTree(indices)
    while new_max > minval - 1:
        out_ids.append(new_max_id)
        nn = tree.query_ball_point(ck, dscale)
        values[nn] = minval - 1
        new_max = values.max()
        new_max_id = int(np.argmax(values))
        ck = indices[new_max_id]
    return out_ids[:batch_out_max]


@pytest.mark.parametrize("seed,d", [(0, 2), (1, 2), (2, 3)])
def test_spaced_batch_matches_reference_ckdtree(seed, d):
    """native.spatial.spaced_batch (C++ or numpy fallback) must select the
    same points, in the same order, as the reference's cKDTree ball-query
    loop on identical descending-ordered candidates."""
    from gpim_tpu.native import spatial
    rng = np.random.RandomState(seed)
    n = 200
    pts = rng.randint(0, 30, size=(n, d)).astype(float)
    vals = np.sort(rng.rand(n))[::-1]          # strictly descending order
    for dscale in (1.5, 3.0, 6.0):
        ours = spatial.spaced_batch(pts, dscale, 10)
        ref = _reference_ckdtree_batch(pts, vals, dscale, 10)
        assert ours == ref, (dscale, ours, ref)


def test_bo_batch_update_spacing():
    """batch_update=True end to end: every returned batch must be
    dscale-spaced (the lengthscale-spaced measurement batches of reference
    boptim.py:326-376)."""
    np.random.seed(0)
    x = np.arange(0, 25, 1.)
    Z = trial_func([x[:, None], x])
    idx = np.random.randint(0, 25, size=(2, 5))
    Z_sparse = np.full_like(Z, np.nan)
    Z_sparse[idx[0], idx[1]] = Z[idx[0], idx[1]]
    X_full = utils.get_full_grid(Z_sparse)
    X_sparse = utils.get_sparse_grid(Z_sparse)
    dscale = 4.0
    bo = boptimizer(
        X_sparse, Z_sparse, X_full, trial_func,
        acquisition_function="ei", exploration_steps=3,
        batch_update=True, batch_size=50, batch_dscale=dscale,
        gp_iterations=100, verbose=0)
    bo.run()
    # measured points are stored flat: 3 steps x batch_out_max (default 10)
    pts = np.asarray(bo.indices_all, float)
    bmax = bo.batch_out_max
    assert pts.shape[0] == 3 * bmax
    for s in range(3):
        batch = pts[s * bmax:(s + 1) * bmax]
        # the greedy-suppressed prefix (before any random fill-up) must be
        # pairwise dscale-separated; the first two are always greedy picks
        dist = np.linalg.norm(batch[0] - batch[1])
        assert dist > dscale, (s, dist, batch[:2])
