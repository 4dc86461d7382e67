"""
Checkpoint/resume subsystem tests (new capability over the reference, which
only saves result artifacts - SURVEY.md section 5).
"""

import numpy as np
from numpy.testing import assert_allclose

from gpim_tpu.gpreg import gpr
from gpim_tpu.gpbayes.boptim import boptimizer
from gpim_tpu import utils as gprutils

from tests.test_gpr import get_dummy_data
from tests.test_boptim import trial_func, initial_seed


def test_model_save_load(tmp_path):
    R = get_dummy_data()
    X = gprutils.get_sparse_grid(R)
    X_true = gprutils.get_full_grid(R)
    m1 = gpr.reconstructor(X, R, X_true, iterations=3, verbose=0)
    m1.train()
    mean1, sd1 = m1.predict(verbose=0)
    f = str(tmp_path / "model")
    m1.save_model(f)

    m2 = gpr.reconstructor(X, R, X_true, iterations=3, verbose=0)
    m2.load_model(f)
    mean2, sd2 = m2.predict(verbose=0)
    assert_allclose(mean1, mean2)
    assert_allclose(sd1, sd2)


def test_boptim_resume_matches_straight_run(tmp_path):
    """10 straight BO steps == 5 steps + checkpoint + resume + 5 steps."""
    def make(steps):
        Z = initial_seed()
        return boptimizer(
            gprutils.get_sparse_grid(Z), Z, gprutils.get_full_grid(Z),
            trial_func, acquisition_function="cb", exploration_steps=steps,
            gp_iterations=50, verbose=0,
            filename=str(tmp_path / "bo"))

    straight = make(10)
    straight.run()

    first = make(5)
    first.run()
    first.save_checkpoint(str(tmp_path / "ckpt"))

    resumed = make(10)
    resumed.load_checkpoint(str(tmp_path / "ckpt"))
    assert resumed.steps_done == 5
    resumed.run()

    assert resumed.indices_all == straight.indices_all
    assert_allclose(resumed.target_func_vals[-1],
                    straight.target_func_vals[-1])


def test_timer_summary():
    R = get_dummy_data()
    X = gprutils.get_sparse_grid(R)
    m = gpr.reconstructor(X, R, gprutils.get_full_grid(R),
                          iterations=2, verbose=0)
    m.train()
    m.train()
    m.predict(verbose=0)
    s = m.timer.summary()
    assert s["train"]["calls"] == 2
    assert s["train"]["first_s"] >= 0
    assert s["train"]["warm_mean_s"] is not None
    assert s["predict"]["calls"] == 1


def test_sk_and_v_model_save_load(tmp_path):
    """save_model/load_model round-trips on skreconstructor and
    vreconstructor (same contract as reconstructor.save_model), and a
    wrong-configuration checkpoint is rejected."""
    import pytest
    from gpim_tpu.gpreg.skgpr import skreconstructor
    from gpim_tpu.gpreg.vgpr import vreconstructor

    R = get_dummy_data()
    X = gprutils.get_sparse_grid(R)
    Xf = gprutils.get_full_grid(R)
    s1 = skreconstructor(X, R, Xf, kernel="RBF", iterations=3, verbose=0,
                         ski=True, ski_min_points=1)
    s1.train()
    m1, sd1 = s1.predict()
    fs = str(tmp_path / "sk_model")
    s1.save_model(fs)
    s2 = skreconstructor(X, R, Xf, kernel="RBF", iterations=3, verbose=0,
                         ski=True, ski_min_points=1)
    s2.load_model(fs)
    m2, sd2 = s2.predict()
    assert_allclose(m1, m2)
    assert_allclose(sd1, sd2)
    with pytest.raises(ValueError):
        skreconstructor(X, R, Xf, kernel="Matern52", iterations=1,
                        verbose=0).load_model(fs)

    rng = np.random.RandomState(0)
    Y = np.stack([R * (1 + 0.2 * t) for t in range(3)], -1)
    Y = Y + 0.01 * rng.randn(*Y.shape)
    Xv = gprutils.get_full_grid(Y[..., 0]).copy()
    Xv[:, np.isnan(Y[..., 0])] = np.nan
    v1 = vreconstructor(Xv, Y, gprutils.get_full_grid(Y[..., 0]),
                        independent=True, iterations=3, verbose=0)
    v1.train()
    vm1, vs1 = v1.predict()
    fv = str(tmp_path / "v_model")
    v1.save_model(fv)
    v2 = vreconstructor(Xv, Y, gprutils.get_full_grid(Y[..., 0]),
                        independent=True, iterations=3, verbose=0)
    v2.load_model(fv)
    vm2, vs2 = v2.predict()
    assert_allclose(vm1, vm2)
    assert_allclose(vs1, vs2)
    with pytest.raises(ValueError):
        vreconstructor(Xv, Y, gprutils.get_full_grid(Y[..., 0]),
                       independent=False, iterations=1, task_rank=2,
                       verbose=0).load_model(fv)
