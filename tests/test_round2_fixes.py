"""
Regression tests for round-2 advisor/review findings: lscale=0.0 handling in
rank_acquisition, checkpoint dtype coercion, atomic result saves, the
num_batches prediction kwarg, max_root propagation into the SKI engine, and
the lazy (backend-aware) compilation-cache decision.
"""

import numpy as np
import pytest

import jax

from gpim_tpu import reconstructor, skreconstructor, utils


def _toy_2d(n=16, missing=60, seed=0):
    rng = np.random.RandomState(seed)
    xx, yy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    R = np.exp(-((xx - n / 2) ** 2 + (yy - n / 2) ** 2) / (n / 2.0) ** 2)
    R = R.astype(np.float64)
    Rn = R.copy()
    flat = rng.choice(n * n, missing, replace=False)
    Rn.ravel()[flat] = np.nan
    X = utils.get_sparse_grid(Rn)
    Xf = utils.get_full_grid(Rn)
    return X, Rn, Xf


def test_rank_acquisition_lscale_zero_keeps_all():
    """lscale=0.0 is a legitimate 'no exclusion radius' and must not be
    silently promoted to 1.0 (the falsy-zero bug)."""
    from gpim_tpu.gpbayes.acqfunc import rank_acquisition
    sd = np.zeros((5, 5))
    # a row of adjacent maxima: distance 1 apart
    sd[2, :] = np.arange(5, 0, -1)
    mean = np.zeros_like(sd)
    vals0, inds0 = rank_acquisition(
        mean, sd, batch_size=5, batch_update=True, lscale=0.0)
    assert len(inds0) == 5          # radius 0 suppresses nothing
    vals1, inds1 = rank_acquisition(
        mean, sd, batch_size=5, batch_update=True, lscale=1.0)
    assert len(inds1) < 5           # radius 1 suppresses the neighbors


def test_load_model_casts_to_model_dtype(tmp_path):
    X, Rn, Xf = _toy_2d()
    m64 = reconstructor(X, Rn, Xf, iterations=2, verbose=0,
                        precision="double")
    m64.train()
    f = str(tmp_path / "ck.npz")
    m64.save_model(f)
    m32 = reconstructor(X, Rn, Xf, iterations=2, verbose=0,
                        precision="single")
    m32.load_model(f)
    for k, v in m32.u.items():
        assert v.dtype == np.float32, (k, v.dtype)
    for k, v in m32._bounds_np.items():
        assert v.dtype == np.float32, (k, v.dtype)
    mean, sd = m32.predict(verbose=0)
    assert np.isfinite(mean[~np.isnan(mean)]).all()


def test_atomic_save_results(tmp_path):
    from gpim_tpu.gpbayes.boptim import _atomic_save
    target = tmp_path / "res.npy"
    _atomic_save(str(target), {"a": np.arange(3)}, allow_pickle=True)
    assert target.exists()
    assert not (tmp_path / "res.npy.tmp").exists()
    loaded = np.load(str(target), allow_pickle=True).item()
    assert np.array_equal(loaded["a"], np.arange(3))


def test_num_batches_prediction_equivalence():
    """num_batches only re-tiles the lax.map chunking; results must match."""
    X, Rn, Xf = _toy_2d()
    m = skreconstructor(X, Rn, Xf, iterations=3, verbose=0, ski=False)
    m.train()
    mean1, sd1 = m.predict(verbose=0)
    mean4, sd4 = m.predict(num_batches=4, verbose=0)
    assert m.num_batches == 4
    np.testing.assert_allclose(mean1, mean4, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(sd1, sd4, rtol=1e-5, atol=1e-6)


def test_max_root_propagates_to_ski_engine():
    X, Rn, Xf = _toy_2d(n=20, missing=80)
    m = skreconstructor(X, Rn, Xf, iterations=2, verbose=0,
                        ski=True, ski_min_points=1, maxroot=32,
                        lattice=False)
    assert m._ski_engine is not None, "SKI path not selected"
    assert m._ski_engine.rank == 32
    m.train()
    m.predict(max_root=16, verbose=0)
    assert m._ski_engine.rank == 16


def test_compile_cache_disabled_on_cpu():
    """On the forced-CPU test backend the persistent cache must stay off
    (XLA:CPU AOT artifacts are not portable across hosts)."""
    from gpim_tpu import dtypes
    dtypes.resolve_dtype(None)   # triggers the one-time decision
    assert jax.default_backend() == "cpu"
    cache_dir = getattr(jax.config, "jax_compilation_cache_dir", None)
    assert not cache_dir
