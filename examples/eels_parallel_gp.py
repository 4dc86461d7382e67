"""
Multi-output ("parallel") GP over spectral components, the EELS workflow
(reference recipe: GP_EELS.ipynb - NMF components as output channels,
independent per-channel GPs, prediction on a 2x denser grid).

Usage: python examples/eels_parallel_gp.py
"""

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# smoke-test hook: tests/test_examples.py runs every example with a
# tiny iteration budget through this env override
_ITERS = int(os.environ.get("GPIM_TPU_EXAMPLE_ITERS", 100))


import gpim_tpu
from gpim_tpu import utils, vreconstructor
import _data


def main():
    # stand-in for the (missing) eels.npy source: band-averaged components
    # of the BEPFM cube (bundled when available, synthetic otherwise)
    cube = _data.bepfm_cube()
    bands = np.stack([cube[:, :, i * 15:(i + 1) * 15].mean(-1)
                      for i in range(6)], axis=-1)
    bands = (bands - bands.min()) / np.ptp(bands)

    rng = np.random.default_rng(0)
    drop = rng.random(bands.shape[:2]) < 0.5
    Y = bands.copy()
    Y[drop] = np.nan
    X = utils.get_full_grid(Y[..., 0]).copy()
    X[:, drop] = np.nan

    # 2x denser prediction grid (dense_x < 1 = super-resolution)
    X_dense = utils.get_full_grid(Y[..., 0], dense_x=0.5)

    model = vreconstructor(
        X, Y, X_dense, kernel="RBF",
        independent=True,          # one vmapped GP per channel
        iterations=_ITERS, verbose=2)
    mean, sd, hyperparams = model.run()
    print("prediction:", mean.shape)   # (64, 64, 6)


if __name__ == "__main__":
    main()
