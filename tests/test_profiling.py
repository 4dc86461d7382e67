"""Smoke tests for the profiling subsystem (SURVEY section 5)."""

import numpy as np

from gpim_tpu.utils.profiling import Timer


def test_timer_separates_first_from_warm():
    t = Timer()
    for _ in range(3):
        with t.phase("train"):
            pass
    s = t.summary()["train"]
    assert s["calls"] == 3
    assert s["first_s"] is not None
    assert s["warm_mean_s"] is not None


def test_reconstructor_exposes_timer():
    from gpim_tpu import reconstructor, utils
    R = np.random.RandomState(0).rand(8, 8)
    R[2, 2] = np.nan
    X = utils.get_sparse_grid(R)
    m = reconstructor(X, R, utils.get_full_grid(R), kernel="RBF",
                      iterations=2, verbose=0)
    m.train()
    m.predict()
    s = m.timer.summary()
    assert "train" in s and s["train"]["calls"] == 1
