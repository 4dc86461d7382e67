"""
Smoke-run every example script end-to-end with a tiny iteration budget
(GPIM_TPU_EXAMPLE_ITERS hook). Examples are user-facing entry points and
the only code exercising some workflow combinations (super-resolution
grids, the bundled cKPFM npz, the BO query-path plot); a broken example is
a broken front door. Skips data-dependent examples when the reference
mirror's expdata is absent.
"""

import importlib.util
import os
import sys

import matplotlib
import pytest

matplotlib.use("Agg")

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")
EXPDATA = os.environ.get("GPIM_TPU_EXPDATA", "/root/reference/expdata")

CASES = [
    ("sparse_image_2d", None),
    ("hyperspectral_3d_sparse", "bepfm_test_data_sparse.npy"),
    ("eels_parallel_gp", "bepfm_test_data.npy"),
    ("ckpfm_4d_ski", "cKPFM loop_0001 10 x 10-proc.npz"),
    ("large_masked_ski", None),
    ("bayesian_optimization", None),
]


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(EXAMPLES, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("name,data", CASES)
def test_example_runs(name, data, monkeypatch, tmp_path):
    if data is not None and not os.path.exists(os.path.join(EXPDATA, data)):
        pytest.skip("bundled dataset %s not present" % data)
    monkeypatch.setenv("GPIM_TPU_EXAMPLE_ITERS", "2")
    monkeypatch.chdir(tmp_path)  # examples may write checkpoints to cwd
    monkeypatch.setattr(sys, "argv", [name + ".py"])
    import matplotlib.pyplot as plt
    monkeypatch.setattr(plt, "show", lambda *a, **k: None)
    mod = _load(name)
    if name == "large_masked_ski":
        # shrink the cube so the CPU-mesh CI run stays quick (the dense
        # engine takes over below ski_min_points - routing still exercised)
        monkeypatch.setattr(mod, "make_cube", _small_cube)
    mod.main()
    plt.close("all")


def _small_cube(shape=(16, 16, 8), missing=0.6, seed=2):
    import numpy as np
    from scipy.ndimage import gaussian_filter
    rng = np.random.RandomState(seed)
    f = gaussian_filter(rng.randn(*shape), sigma=(2, 2, 1))
    f = (f - f.min()) / (f.max() - f.min())
    R = f + 0.02 * rng.randn(*shape)
    sites = rng.choice(shape[0] * shape[1],
                       int(missing * shape[0] * shape[1]), replace=False)
    R.reshape(-1, shape[2])[sites] = np.nan
    return f, R
