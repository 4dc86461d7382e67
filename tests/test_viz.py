"""
Smoke tests for the plotting helpers (untested in the reference; every
public plot_* function must at least render on a headless Agg backend
without raising).
"""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gpim_tpu.utils import viz  # noqa: E402


@pytest.fixture(autouse=True)
def _close_figs():
    yield
    plt.close("all")


def _hyperparams(iters=6, d=2):
    return {
        "lengthscale": np.abs(np.random.rand(iters, d)) + 1.0,
        "noise": np.abs(np.random.rand(iters)) * 0.1,
        "variance": np.abs(np.random.rand(iters)) + 0.5,
    }


def test_plot_kernel_hyperparams():
    viz.plot_kernel_hyperparams(_hyperparams())


def test_plot_kernel_hyperparams_no_variance():
    hp = _hyperparams()
    del hp["variance"]
    viz.plot_kernel_hyperparams(hp)


def test_plot_mixture_hyperparams():
    q, iters = 3, 5
    hp = {
        "means": np.abs(np.random.rand(iters, q, 1, 2)) + 0.2,
        "scales": np.abs(np.random.rand(iters, q, 1, 2)) + 0.2,
        "weights": np.abs(np.random.rand(iters, q)),
        "noise": np.abs(np.random.rand(iters)) * 0.1,
        "maxdim": 20,
    }
    viz.plot_kernel_hyperparams(hp)   # dispatches to the mixture plot


def test_plot_raw_data():
    R = np.random.rand(8, 9, 12)
    viz.plot_raw_data(R, slice_number=3, pos=np.array([[2, 2], [4, 5]]))


def test_plot_reconstructed_data2d():
    R = np.random.rand(16, 16)
    R[np.random.rand(16, 16) > 0.7] = np.nan
    viz.plot_reconstructed_data2d(R, np.random.rand(16, 16))


def test_plot_reconstructed_data3d():
    R = np.random.rand(8, 9, 12)
    R[np.random.rand(8, 9, 12) > 0.7] = np.nan
    mean = np.random.rand(8 * 9 * 12)
    sd = np.abs(np.random.rand(8 * 9 * 12)) * 0.1
    viz.plot_reconstructed_data3d(
        R, mean, sd, slice_number=3, pos=np.array([[2, 2], [4, 5]]))


def test_plot_exploration_results():
    e1, e2, e3 = 8, 8, 10
    steps = 4
    R_true = np.random.rand(e1, e2, e3)
    R_all = [R_true * (np.random.rand(e1, e2, e3) > 0.3)
             for _ in range(steps)]
    R_all = [np.where(r == 0, np.nan, r) for r in R_all]
    mean_all = [np.random.rand(e1 * e2 * e3) for _ in range(steps)]
    sd_all = [np.abs(np.random.rand(e1 * e2 * e3)) * .1 for _ in range(steps)]
    viz.plot_exploration_results(
        R_all, mean_all, sd_all, R_true,
        episodes=[0, 1, 3], slice_number=4,
        pos=np.array([[2, 2], [4, 4]]), dist_edge=[1, 1])


def test_plot_inducing_points_2d_and_3d():
    for d in (2, 3):
        hp = {"inducing_points": np.random.rand(5, 20, d) * 10}
        viz.plot_inducing_points(hp)


def test_plot_query_points():
    inds = np.random.randint(0, 20, (12, 2))
    viz.plot_query_points(inds)
    viz.plot_query_points(inds, plot_lines=True)
