"""
2D sparse image reconstruction with an exact GP (the flagship workflow;
reference recipe: README.md:42-66 and GP_sparse2Dimages.ipynb).

Usage: python examples/sparse_image_2d.py [path/to/image.npy]
Missing pixels must be NaN (or pass a dense image and corrupt it below).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# smoke-test hook: tests/test_examples.py runs every example with a
# tiny iteration budget through this env override
_ITERS = int(os.environ.get("GPIM_TPU_EXAMPLE_ITERS", 250))


import gpim_tpu
from gpim_tpu import utils, reconstructor
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _data


def main():
    if len(sys.argv) > 1:
        R = np.load(sys.argv[1])
        if not np.isnan(R).any():
            # treat the most frequent value as "unmeasured" (spiral scans)
            vals, counts = np.unique(R, return_counts=True)
            R[R == vals[np.argmax(counts)]] = np.nan
    else:
        # the 128x128 spiral scan (real when bundled, synthetic spiral
        # acquisition otherwise; see examples/_data.py)
        R = _data.spiral_scan()

    R = (R - np.nanmin(R)) / (np.nanmax(R) - np.nanmin(R))
    X = utils.get_sparse_grid(R)       # NaN-marked grid indices
    X_full = utils.get_full_grid(R)    # dense prediction grid

    model = reconstructor(X, R, X_full, kernel="RBF",
                          lengthscale=None, iterations=_ITERS, verbose=2)
    mean, sd, hyperparams = model.run()

    utils.plot_kernel_hyperparams(hyperparams)
    utils.plot_reconstructed_data2d(R, mean)


if __name__ == "__main__":
    main()
