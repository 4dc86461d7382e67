"""
Regression tests for the round-5 review fixes (ADVICE.md round 4):

1. boptim._device_explore_ok must gate on the MASKED candidate pool, not
   the raw test-grid size - with an acquisition mask, once every valid
   candidate is selected the device loop would argmax an all -inf vector
   and silently re-select flat index 0 (possibly a masked-out cell),
   diverging from the host path's exit_strategy fallback.
2. boptim._fused_ok must reject f32 models with >= 2**24 flat grid cells:
   candidate indices ride the one-buffer fetch as floats, which is exact
   only below 2**24 under f32.
3. MaskedGridEngine's retired-pad-dodge regression net must also catch a
   NaN on the FINAL Adam step: the recorded loss is pre-update, so the
   loss series can stay finite while the returned parameters are NaN.
"""

import numpy as np
import pytest

from gpim_tpu.gpbayes.boptim import boptimizer
from gpim_tpu import utils as gprutils


def _trial_func(idx, x0=5, y0=10, fwhm=4.5):
    return np.exp(-4 * np.log(2) *
                  ((idx[0] - x0) ** 2 + (idx[1] - y0) ** 2) / fwhm ** 2)


def _sim_bo(**kw):
    np.random.seed(0)
    x = np.arange(0, 25, 1.)
    y = x[:, np.newaxis]
    Z = _trial_func([y, x])
    idx = np.random.randint(0, Z.shape[0], size=(2, 5))
    Z_sparse = np.ones_like(Z) * np.nan
    Z_sparse[idx[0], idx[1]] = Z[idx[0], idx[1]]
    y_true = _trial_func([x[:, None], x])
    X_full = gprutils.get_full_grid(Z_sparse)
    X_sparse = gprutils.get_sparse_grid(Z_sparse)
    base = dict(acquisition_function="ei", exploration_steps=6,
                gp_iterations=60, verbose=0, simulate_measurement=True,
                y_true=y_true, filename="/tmp/test_boptim_r5")
    base.update(kw)
    return boptimizer(X_sparse, Z_sparse, X_full, None, **base)


# --------------------------------------------------------------------------
# 1. masked candidate pool gates the zero-fetch device exploration loop
# --------------------------------------------------------------------------

def test_device_explore_gates_on_masked_pool():
    """A mask with fewer valid candidates than exploration_steps forces the
    host path (which has the exit_strategy fallback); a mask with enough
    candidates keeps the device loop eligible."""
    # only 4 valid cells < 6 steps -> host path
    tight = np.full((25, 25), np.nan)
    tight[0, :4] = 1.0
    bo = _sim_bo(mask=tight)
    assert bo._n_candidates == 4
    assert not bo._device_explore_ok()
    # 100 valid cells >= 6 steps -> device loop still fine
    loose = np.full((25, 25), np.nan)
    loose[:, 20:24] = 1.0          # away from the optimum column
    bo2 = _sim_bo(mask=loose)
    assert bo2._n_candidates == 100
    assert bo2._device_explore_ok()
    # unmasked: pool is the whole grid, same gate as before
    bo3 = _sim_bo()
    assert bo3._n_candidates == 625
    assert bo3._device_explore_ok()


def test_device_explore_masked_pool_exhaustion_parity():
    """Running steps == n_candidates through the device loop selects every
    valid candidate exactly once and never leaves the mask; the same run
    with one more step must drop to the host path (which survives pool
    exhaustion via its exit strategy)."""
    mask = np.full((25, 25), np.nan)
    mask[3, 10:15] = 1.0                       # 5 valid cells
    bo = _sim_bo(mask=mask, exploration_steps=5, gp_iterations=40)
    assert bo._device_explore_ok()
    bo.run()
    picked = {tuple(i) for i in bo.indices_all}
    assert picked == {(3, c) for c in range(10, 15)}
    bo2 = _sim_bo(mask=mask, exploration_steps=6, gp_iterations=40)
    assert not bo2._device_explore_ok()
    bo2.run()                                  # host path: must not crash
    assert len(bo2.indices_all) == 6


# --------------------------------------------------------------------------
# 2. f32 one-buffer index fetch is exact only below 2**24 flat cells
# --------------------------------------------------------------------------

def test_fused_f32_index_bound():
    bo = _sim_bo(precision="single")
    assert np.dtype(bo.surrogate_model.dtype) == np.float32
    assert bo._fused_ok()
    bo._n_flat = 2 ** 24                       # at the bound: inexact
    assert not bo._fused_ok()
    bo._n_flat = 2 ** 24 - 1
    assert bo._fused_ok()
    bo64 = _sim_bo()                            # double: exact to 2**53
    bo64._n_flat = 2 ** 24
    assert bo64._fused_ok()


# --------------------------------------------------------------------------
# 3. trajectory-finiteness guard catches a NaN final update
# --------------------------------------------------------------------------

def _tiny_128_engine(**kw):
    from gpim_tpu.gpreg.mgrid_model import MaskedGridEngine
    rng = np.random.RandomState(0)
    axes = [np.arange(128, dtype=np.float64), np.arange(4, dtype=np.float64)]
    Y = np.sin(axes[0][:, None] / 9.0) + 0.03 * rng.randn(128, 4)
    Y[rng.rand(128, 4) < 0.5] = np.nan
    return MaskedGridEngine("RBF", axes, ~np.isnan(Y), Y, np.float64,
                            cg_iters=64, precond_rank=128, seed=0, **kw)


def test_traj_guard_catches_nan_final_params(monkeypatch):
    """Finite loss series + NaN last recorded lengthscale/noise (the
    post-update entries) must still raise the miscompile-signature error."""
    monkeypatch.delenv("GPIM_TPU_PAD_DODGE", raising=False)
    eng = _tiny_128_engine()
    assert eng._raw_mult128
    ok = {"loss": np.zeros(4),
          "lengthscale": np.ones((4, 2)),
          "noise": np.ones(4)}
    eng._check_traj_finite(ok)                 # finite: no raise
    bad_ls = {"loss": np.zeros(4),
              "lengthscale": np.concatenate(
                  [np.ones((3, 2)), np.full((1, 2), np.nan)]),
              "noise": np.ones(4)}
    with pytest.raises(RuntimeError, match="128-multiple"):
        eng._check_traj_finite(bad_ls)
    bad_noise = {"loss": np.zeros(4),
                 "lengthscale": np.ones((4, 2)),
                 "noise": np.array([1.0, 1.0, 1.0, np.nan])}
    with pytest.raises(RuntimeError, match="128-multiple"):
        eng._check_traj_finite(bad_noise)
    # padded engines never ran the raw-shape program: guard is a no-op
    eng_pad = _tiny_128_engine(pad_dodge=True)
    eng_pad._check_traj_finite(bad_ls)


def test_fused_auto_rule_caps_grid_size(monkeypatch):
    """The fused-train auto rule must route very large grids to the host
    segment loop: one fused multi-minute device program at >3M cells
    reproducibly crashed the TPU worker (BASELINE_MEASURED.md round-5
    frontier). Pinned by intercepting which program train() dispatches."""
    import jax
    import jax.numpy as jnp
    from gpim_tpu.gpreg import mgrid_model as mm
    from gpim_tpu.kernels.transforms import interval_inverse, \
        positive_inverse

    rng = np.random.RandomState(0)
    axes = [np.arange(8, dtype=np.float64), np.arange(8, dtype=np.float64)]
    Y = rng.randn(8, 8)
    Y[rng.rand(8, 8) < 0.4] = np.nan
    eng = mm.MaskedGridEngine("RBF", axes, ~np.isnan(Y), np.nan_to_num(Y),
                              np.float64, cg_iters=16, precond_rank=16,
                              seed=0)
    bounds = {"ls_lo": jnp.zeros(2), "ls_hi": jnp.full(2, 10.0)}
    u0 = {"lengthscale": interval_inverse(jnp.full(2, 2.0),
                                          bounds["ls_lo"],
                                          bounds["ls_hi"]),
          "outputscale": positive_inverse(jnp.asarray(1.0)),
          "noise": positive_inverse(jnp.asarray(0.1)),
          "mean": jnp.zeros(())}
    calls = []
    real_fused = mm._train_fused
    real_seg = mm._train_seg

    def spy_fused(*a, **k):
        calls.append("fused")
        return real_fused(*a, **k)

    def spy_seg(*a, **k):
        calls.append("seg")
        return real_seg(*a, **k)

    monkeypatch.setattr(mm, "_train_fused", spy_fused)
    monkeypatch.setattr(mm, "_train_seg", spy_seg)
    # pretend we are on an accelerator so the auto rule's backend gate
    # passes; the grid-size gate must then decide
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    eng.train(u0, bounds, 0.1, 1e-6, iterations=4)
    assert calls and all(c == "fused" for c in calls), calls
    calls.clear()
    monkeypatch.setattr(mm, "_FUSED_MAX_G", 16)   # force "huge grid"
    eng.train(u0, bounds, 0.1, 1e-6, iterations=4)
    assert calls and all(c == "seg" for c in calls), calls
