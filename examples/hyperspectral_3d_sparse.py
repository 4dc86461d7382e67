"""
3D hyperspectral reconstruction with an inducing-point sparse GP
(reference recipe: GP_BEPFM.ipynb with the bundled 32x32x102 BEPFM cube,
70.6% of spectra removed).

Usage: python examples/hyperspectral_3d_sparse.py
"""

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# smoke-test hook: tests/test_examples.py runs every example with a
# tiny iteration budget through this env override
_ITERS = int(os.environ.get("GPIM_TPU_EXAMPLE_ITERS", 400))


import gpim_tpu
from gpim_tpu import utils, reconstructor
import _data


def main():
    # NaN-sparse (32, 32, 102): bundled BEPFM cube when available,
    # synthetic stand-in otherwise (examples/_data.py)
    R = _data.bepfm_cube(sparse=True)
    X = utils.get_sparse_grid(R)
    X_full = utils.get_full_grid(R)

    model = reconstructor(
        X, R, X_full, kernel="Matern52",
        sparse=True, indpoints=1000,        # VFE with trainable Xu
        learning_rate=0.05, iterations=_ITERS, verbose=2)
    mean, sd, hyperparams = model.run()

    truth = _data.bepfm_cube(sparse=False)
    print("mean abs error vs ground truth:",
          float(np.abs(mean - truth).mean()))
    utils.plot_reconstructed_data3d(np.nan_to_num(R), mean, sd,
                                    slice_number=50, pos=[[5, 10], [20, 25]])


if __name__ == "__main__":
    main()
