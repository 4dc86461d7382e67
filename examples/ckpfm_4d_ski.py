"""
4D cKPFM reconstruction with the structured (SKI) GP
(reference recipe: GP_TD_cKPFM.ipynb - full 10x10x64x5 grid, Matern52,
prediction on a 2x denser grid).

Usage: python examples/ckpfm_4d_ski.py
"""

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# smoke-test hook: tests/test_examples.py runs every example with a
# tiny iteration budget through this env override
_ITERS = int(os.environ.get("GPIM_TPU_EXAMPLE_ITERS", 50))


import gpim_tpu
from gpim_tpu import utils, skreconstructor
import _data


def main():
    # 10x10x64x5 cKPFM response grid (bundled when available, synthetic
    # stand-in otherwise; see examples/_data.py)
    R = _data.ckpfm_slab()
    X = utils.get_full_grid(R)

    model = skreconstructor(
        X, R, X, kernel="Matern52", ski=True,
        grid_points_ratio=1.0, lengthscale=[1.0, 3.0],
        iterations=_ITERS, verbose=2)
    mean, sd, hyperparams = model.run()

    # super-resolution pass
    X2 = utils.get_full_grid(R, dense_x=0.5)
    mean2x, sd2x = model.predict(X2)
    print("2x-dense reconstruction:", mean2x.shape)


if __name__ == "__main__":
    main()
