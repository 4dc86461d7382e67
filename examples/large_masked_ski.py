"""
Large NaN-masked hyperspectral reconstruction through the SKI engine.

The regime of the reference's GridInterpolationKernel path
(gpim/gpreg/skgpr.py:436-440): a grid too large for dense exact inference,
with most (x, y) spectra never measured. Here a 64x64x32 BEPFM-style cube
(131,072 voxels) with 70% of the spatial sites removed trains end-to-end
through ``skreconstructor(ski=True)``, which routes to the structured
operator (gpim_tpu/ops/ski.py): kernel interpolation onto a Cartesian
grid, Kronecker mode-product MVMs, batched conjugate gradients with a
Kronecker-eigen preconditioner, and stochastic-Lanczos-quadrature logdet
gradients.

Run:  python examples/large_masked_ski.py
      python examples/large_masked_ski.py --xl   # reference scale:
          a 1,048,576-voxel 128x128x64 cube (the regime of the
          reference's headline 128x128 BEPFM map), ~15 s warm on one
          TPU v5e core
(first TPU compile is slow; re-runs are warm)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# smoke-test hook: tests/test_examples.py runs every example with a
# tiny iteration budget through this env override
_ITERS = int(os.environ.get("GPIM_TPU_EXAMPLE_ITERS", 30))


from gpim_tpu import skreconstructor, utils  # noqa: E402


def make_cube(shape=(64, 64, 32), missing=0.7, seed=2):
    """Synthetic smooth BEPFM-style cube + noise, with whole spectra
    removed at random (x, y) sites - the acquisition pattern of a sparse
    hyperspectral scan (reference gprutils.corrupt_image3d semantics)."""
    from scipy.ndimage import gaussian_filter
    rng = np.random.RandomState(seed)
    f = gaussian_filter(rng.randn(*shape), sigma=(4, 4, 2))
    f = (f - f.min()) / (f.max() - f.min())
    R = f + 0.02 * rng.randn(*shape)
    sites = rng.choice(shape[0] * shape[1],
                       int(missing * shape[0] * shape[1]), replace=False)
    R.reshape(-1, shape[2])[sites] = np.nan
    return f, R


def main():
    shape = (128, 128, 64) if "--xl" in sys.argv else (64, 64, 32)
    truth, R = make_cube(shape=shape)
    X = utils.get_sparse_grid(R)
    Xfull = utils.get_full_grid(R)

    mean, sd, hyperparams = skreconstructor(
        X, R, Xfull, kernel="RBF", ski=True,
        learning_rate=0.1, iterations=_ITERS, verbose=1).run()

    mean = mean.reshape(truth.shape)
    rmse = float(np.sqrt(np.mean((mean - truth) ** 2)))
    print("final lengthscale:", np.around(hyperparams["lengthscale"][-1], 3))
    print("rmse vs noiseless truth: %.4f (data noise sd 0.02)" % rmse)
    print("observed voxels:", int((~np.isnan(R)).sum()), "of", R.size)


if __name__ == "__main__":
    main()
