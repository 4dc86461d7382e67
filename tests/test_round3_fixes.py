"""
Regression tests for round-3 advisor findings: SKI predict-only (0-iteration)
runs, max_root capping the Nystrom rank on the preconditioned path, and an
f32 predictive-sd accuracy contract in the small-noise / long-lengthscale
regime (where explicit-inverse application and reduced-precision gemms are
at their worst relative to backward-stable solves).
"""

import numpy as np

import jax.numpy as jnp

from gpim_tpu import skreconstructor, utils


def _toy_2d(n=20, missing=80, seed=0):
    rng = np.random.RandomState(seed)
    xx, yy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    R = np.exp(-((xx - n / 2) ** 2 + (yy - n / 2) ** 2) / (n / 2.0) ** 2)
    Rn = R.astype(np.float64).copy()
    flat = rng.choice(n * n, missing, replace=False)
    Rn.ravel()[flat] = np.nan
    return utils.get_sparse_grid(Rn), Rn, utils.get_full_grid(Rn)


import pytest


@pytest.mark.parametrize("lattice", [True, False])
def test_ski_zero_iterations_predict_only(lattice):
    """A 0-iteration train() (predict-only flow) must return empty
    trajectories, not crash on trajs[0] - on both structured engines."""
    X, Rn, Xf = _toy_2d()
    m = skreconstructor(X, Rn, Xf, iterations=0, verbose=0,
                        ski=True, ski_min_points=1, lattice=lattice)
    eng = m._mgrid_engine if lattice else m._ski_engine
    assert eng is not None, "structured path not selected"
    mean, sd, hp = m.run()
    assert hp["lengthscale"].shape[0] == 0
    assert hp["noise"].shape[0] == 0
    assert np.isfinite(mean).all() and np.isfinite(sd).all()


@pytest.mark.parametrize("lattice", [True, False])
def test_max_root_caps_nystrom_rank(lattice):
    """With preconditioning on (the default), an explicit max_root must cap
    the Nystrom/preconditioner rank - not silently no-op (round-2 advisor)."""
    X, Rn, Xf = _toy_2d()
    m = skreconstructor(X, Rn, Xf, iterations=2, verbose=0,
                        ski=True, ski_min_points=1, lattice=lattice)
    eng = m._mgrid_engine if lattice else m._ski_engine
    assert eng is not None
    assert eng.precond_rank > 16
    m.train()
    mean, sd = m.predict(max_root=16, verbose=0)
    assert eng.precond_rank == 16
    assert np.isfinite(mean).all() and np.isfinite(sd).all()


def test_predictive_sd_f32_small_noise_long_lengthscale():
    """Pin the f32 predictive-sd accuracy of the explicit-inverse prediction
    path (engine.predict_exact) against a backward-stable f64 numpy twin in
    the cancellation-prone regime: tiny noise, lengthscale spanning half the
    domain (posterior sd collapses toward sqrt(noise) near data)."""
    from gpim_tpu.gpreg import engine
    from gpim_tpu.kernels.transforms import interval_inverse, positive_inverse

    rng = np.random.RandomState(3)
    n, m = 256, 128
    X64 = rng.uniform(0.0, 20.0, size=(n, 2))
    y64 = np.sin(0.3 * X64[:, 0]) * np.cos(0.2 * X64[:, 1])
    Xt64 = rng.uniform(0.0, 20.0, size=(m, 2))

    ls, var, noise, jitter = 10.0, 1.0, 1e-4, 1e-6

    # f64 numpy twin (Cholesky solves, no explicit inverse)
    def k64(A, B):
        d2 = ((A[:, None, :] - B[None, :, :]) ** 2).sum(-1)
        return var * np.exp(-0.5 * d2 / ls ** 2)

    A = k64(X64, X64) + (noise + jitter) * np.eye(n)
    L = np.linalg.cholesky(A)
    alpha = np.linalg.solve(A, y64)
    Ks = k64(Xt64, X64)
    mean64 = Ks @ alpha
    V = np.linalg.solve(L, Ks.T)
    var64 = var - np.sum(V * V, axis=0) + noise

    # f32 package path (tri_inverse + reduced-precision variance gemm)
    dt = np.float32
    bounds = {"ls_lo": jnp.asarray([0.1, 0.1], dt),
              "ls_hi": jnp.asarray([20.0, 20.0], dt),
              "var_lo": jnp.asarray(1e-4, dt),
              "var_hi": jnp.asarray(10.0, dt)}
    u = {"lengthscale": interval_inverse(
            jnp.asarray([ls, ls], dt), bounds["ls_lo"], bounds["ls_hi"]),
         "variance": interval_inverse(
            jnp.asarray(var, dt), bounds["var_lo"], bounds["var_hi"]),
         "noise": positive_inverse(jnp.asarray(noise, dt))}
    chunks = jnp.asarray(Xt64.astype(dt)).reshape(1, m, 2)
    mean32, var32 = engine.predict_exact(
        u, jnp.asarray(X64.astype(dt)), jnp.asarray(y64.astype(dt)),
        jnp.ones((n,), dt), bounds, jnp.asarray(jitter, dt), chunks,
        kernel="RBF", noiseless=False)
    mean32 = np.asarray(mean32)
    sd32 = np.sqrt(np.asarray(var32))
    sd64 = np.sqrt(var64)

    # mean: tight relative-to-scale agreement
    scale = np.max(np.abs(mean64))
    assert np.max(np.abs(mean32 - mean64)) < 1e-3 * scale
    # sd contract: absolute error well under the prior sd, and no negative
    # or wildly inflated posterior sd even where cancellation is near-total
    assert np.max(np.abs(sd32 - sd64)) < 5e-3 * np.sqrt(var)
    assert (sd32 >= 0).all()


@pytest.mark.parametrize("lattice", [True, False])
def test_skreconstructor_update_data_retrains_warm(lattice):
    """update_data must rebuild the structured engines for the new mask
    and keep trained parameters, so retraining continues warm (the
    reference raises on any structured retrain-on-new-data workflow)."""
    X, Rn, Xf = _toy_2d(n=20, missing=80)
    m = skreconstructor(X, Rn, Xf, iterations=3, verbose=0, ski=True,
                        ski_min_points=1, lattice=lattice)
    eng0 = m._mgrid_engine if lattice else m._ski_engine
    assert eng0 is not None
    m.train()
    u_before = {k: np.asarray(v) for k, v in m.u.items()}

    # reveal 20 more pixels and update
    rng = np.random.RandomState(7)
    R2 = Rn.copy()
    nan_idx = np.flatnonzero(np.isnan(R2))
    fill = rng.choice(nan_idx, 20, replace=False)
    R2.ravel()[fill] = 0.5
    from gpim_tpu import utils
    m.update_data(utils.get_sparse_grid(R2), R2)
    eng1 = m._mgrid_engine if lattice else m._ski_engine
    assert eng1 is not None and eng1 is not eng0   # rebuilt for new mask
    for k in u_before:                              # params kept (warm)
        np.testing.assert_array_equal(np.asarray(m.u[k]), u_before[k])
    m.train()
    mean, sd = m.predict(verbose=0)
    assert np.isfinite(mean).all() and np.isfinite(sd).all()
    # more data observed -> the new engine must see the larger mask
    n_obs0 = int((~np.isnan(Rn)).sum())
    n_obs1 = int((~np.isnan(R2)).sum())
    assert n_obs1 == n_obs0 + 20
