"""
Generate the executable example notebooks (reference parity:
/root/reference/examples/notebooks/*.ipynb - the reference ships its L5
workflows as notebooks; these six mirror docs/source/workflows/ and the
examples/*.py scripts).

Each notebook reads GPIM_TPU_NB_ITERS to shrink iteration budgets, which
is how tests/test_notebooks.py smoke-executes them (nbclient, tiny
budgets, Agg matplotlib).

Run: python examples/notebooks/_generate.py
"""

import os

import nbformat as nbf

HERE = os.path.dirname(os.path.abspath(__file__))

SETUP = """\
import os
import sys

import numpy as np
import matplotlib
if not os.environ.get("DISPLAY"):
    matplotlib.use("Agg")

# make the repo + the examples/ data helpers importable when running
# from a checkout (GPIM_TPU_REPO overrides for out-of-tree execution,
# e.g. the smoke tests running in a temp directory)
_here = os.getcwd()
_cands = [os.path.join(_here, "..", ".."), os.path.join(_here, ".."), _here]
if os.environ.get("GPIM_TPU_REPO"):
    _cands += [os.environ["GPIM_TPU_REPO"],
               os.path.join(os.environ["GPIM_TPU_REPO"], "examples")]
for p in _cands:
    sys.path.insert(0, os.path.abspath(p))

# smoke-test hooks: tests/test_notebooks.py executes every notebook with a
# tiny iteration budget (and pinned to the CPU backend) through these env
# overrides
ITERS = int(os.environ.get("GPIM_TPU_NB_ITERS", {iters}))
if os.environ.get("GPIM_TPU_NB_PLATFORM"):
    import jax
    jax.config.update("jax_platforms",
                      os.environ["GPIM_TPU_NB_PLATFORM"])

import gpim_tpu
from gpim_tpu import utils
print(gpim_tpu.__version__)"""


def nb(cells):
    notebook = nbf.v4.new_notebook()
    notebook["metadata"] = {
        "kernelspec": {"display_name": "Python 3", "language": "python",
                       "name": "python3"},
        "language_info": {"name": "python"},
    }
    notebook["cells"] = [
        nbf.v4.new_markdown_cell(src) if kind == "md"
        else nbf.v4.new_code_cell(src)
        for kind, src in cells]
    return notebook


NOTEBOOKS = {}

NOTEBOOKS["sparse_image_2d.ipynb"] = nb([
    ("md", "# 2D sparse image reconstruction (exact GP)\n\n"
     "The flagship workflow (reference: `GP_sparse2Dimages.ipynb` / "
     "`Quickstart_GPim.ipynb`): a sparsely sampled 128×128 PFM scan is\n"
     "reconstructed by an exact Gaussian process with an ARD RBF kernel. "
     "Missing pixels are encoded as NaN; the library masks them out,\n"
     "trains hyperparameters by Adam on the exact marginal likelihood "
     "(one fused XLA program), and returns a dense mean + sd."),
    ("code", SETUP.format(iters=250)),
    ("md", "Load the spiral scan (bundled when available, a synthetic "
     "spiral acquisition otherwise) and normalize to [0, 1]."),
    ("code", """\
import _data

R = _data.spiral_scan()
R = (R - np.nanmin(R)) / (np.nanmax(R) - np.nanmin(R))
print("grid:", R.shape, " observed:", int((~np.isnan(R)).sum()))"""),
    ("md", "Build the NaN-marked sparse grid (training coordinates) and "
     "the dense prediction grid."),
    ("code", """\
X = utils.get_sparse_grid(R)
X_full = utils.get_full_grid(R)"""),
    ("md", "Train + predict. `verbose=2` prints the loss/hyperparameter "
     "trajectory (recorded per iteration, as in the reference)."),
    ("code", """\
from gpim_tpu import reconstructor

model = reconstructor(X, R, X_full, kernel="RBF",
                      iterations=ITERS, verbose=2)
mean, sd, hyperparams = model.run()"""),
    ("md", "Inspect the hyperparameter trajectories and the "
     "reconstruction."),
    ("code", """\
utils.plot_kernel_hyperparams(hyperparams)
utils.plot_reconstructed_data2d(R, mean)"""),
])

NOTEBOOKS["hyperspectral_3d_sparse.ipynb"] = nb([
    ("md", "# 3D hyperspectral reconstruction (inducing-point sparse GP)\n\n"
     "Reference recipe: `GP_BEPFM.ipynb` - a 32×32×102 BEPFM cube with "
     "70.6% of the spectra removed, reconstructed by a sparse\n"
     "variational-free-energy (VFE) GP with trainable inducing points "
     "(the TPU-native equivalent of Pyro's `SparseGPRegression`)."),
    ("code", SETUP.format(iters=400)),
    ("code", """\
import _data

R = _data.bepfm_cube(sparse=True)       # (32, 32, 102), NaN-sparse
X = utils.get_sparse_grid(R)
X_full = utils.get_full_grid(R)
print("observed voxels:", int((~np.isnan(R)).sum()), "of", R.size)"""),
    ("md", "Train the VFE model. `indpoints` sets the inducing-point "
     "count; the inducing locations start as a strided subsample and are "
     "trained jointly with the kernel hyperparameters."),
    ("code", """\
from gpim_tpu import reconstructor

model = reconstructor(X, R, X_full, kernel="Matern52",
                      sparse=True, indpoints=1000,
                      learning_rate=0.05, iterations=ITERS, verbose=2)
mean, sd, hyperparams = model.run()"""),
    ("code", """\
truth = _data.bepfm_cube(sparse=False)
print("mean abs error vs ground truth:",
      float(np.abs(mean - truth).mean()))
utils.plot_reconstructed_data3d(np.nan_to_num(R), mean, sd,
                                slice_number=50, pos=[[5, 10], [20, 25]])"""),
])

NOTEBOOKS["eels_parallel_gp.ipynb"] = nb([
    ("md", "# Multi-output (\"parallel\") GP over spectral components\n\n"
     "Reference recipe: `GP_EELS.ipynb` - spectral components (NMF in "
     "the reference; band averages here) become output channels of a\n"
     "vector-valued GP. `independent=True` trains one GP per channel, "
     "vmapped into a single batched XLA program (and shardable over a\n"
     "TPU mesh with `mesh=`); prediction runs on a 2× denser grid "
     "(super-resolution)."),
    ("code", SETUP.format(iters=100)),
    ("code", """\
import _data

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
X_dense = utils.get_full_grid(Y[..., 0], dense_x=0.5)   # 2x denser"""),
    ("code", """\
from gpim_tpu import vreconstructor

model = vreconstructor(X, Y, X_dense, kernel="RBF",
                       independent=True, iterations=ITERS, verbose=2)
mean, sd, hyperparams = model.run()
print("prediction:", mean.shape)    # (64, 64, 6)"""),
    ("md", "Correlated channels (Kronecker multitask covariance) are one "
     "kwarg away: `independent=False` uses the decoupled-eigenbasis "
     "trainer, exact in the task covariance."),
])

NOTEBOOKS["ckpfm_4d_ski.ipynb"] = nb([
    ("md", "# 4D cKPFM reconstruction (structured-kernel GP)\n\n"
     "Reference recipe: `GP_TD_cKPFM.ipynb` - a full 10×10×64×5 cKPFM "
     "response grid fit with the structured-kernel (SKI) engine and\n"
     "predicted on a 2× denser grid. On lattice data the engine uses "
     "exact Kronecker algebra instead of interpolation - same API,\n"
     "exact math."),
    ("code", SETUP.format(iters=50)),
    ("code", """\
import _data

R = _data.ckpfm_slab()                 # (10, 10, 64, 5)
X = utils.get_full_grid(R)"""),
    ("code", """\
from gpim_tpu import skreconstructor

model = skreconstructor(X, R, X, kernel="Matern52", ski=True,
                        grid_points_ratio=1.0, lengthscale=[1.0, 3.0],
                        iterations=ITERS, verbose=2)
mean, sd, hyperparams = model.run()"""),
    ("md", "Super-resolution pass: predict on a 2× denser grid "
     "(`dense_x=0.5`)."),
    ("code", """\
X2 = utils.get_full_grid(R, dense_x=0.5)
mean2x, sd2x = model.predict(X2)
print("2x-dense reconstruction:", mean2x.shape)"""),
])

NOTEBOOKS["bayesian_optimization.ipynb"] = nb([
    ("md", "# GP-based exploration of a measurement target\n\n"
     "Reference recipe: `GP_based_exploration_exploitation.ipynb` - seed "
     "a few measurements, then let the Bayesian-optimization loop pick\n"
     "where to measure next (expected improvement), retraining the GP "
     "surrogate after every measurement. The `measure` callback stands\n"
     "in for the physical instrument."),
    ("code", SETUP.format(iters=200)),
    ("code", """\
def measure(idx):
    \"\"\"Stand-in for the physical instrument callback.\"\"\"
    return float(np.exp(-4 * np.log(2) *
                        ((idx[0] - 5) ** 2 + (idx[1] - 10) ** 2)
                        / 4.5 ** 2))


np.random.seed(0)
size = 25
seeds = np.random.randint(0, size, size=(2, 5))
Z_sparse = np.full((size, size), np.nan)
for i, j in zip(*seeds):
    Z_sparse[i, j] = measure((i, j))

X_full = utils.get_full_grid(Z_sparse)
X_sparse = utils.get_sparse_grid(Z_sparse)"""),
    ("code", """\
from gpim_tpu import boptimizer

boptim = boptimizer(
    X_sparse, Z_sparse, X_full, measure,
    acquisition_function="ei",
    exploration_steps=min(ITERS, 20),
    gp_iterations=ITERS,
    save_checkpoints=True, filename="boptim_results",
    verbose=1)
boptim.run()
print("best value found:", np.nanmax(boptim.target_func_vals[-1]))"""),
    ("code", """\
utils.plot_query_points(boptim.indices_all, plot_lines=True)"""),
    ("md", "The checkpoint file (`boptim_results.npy`) stores the same "
     "artifact dict as the reference (`gp_pred`, `func_val`, `inds_all`, "
     "`vals_all`) after every step; a full resumable state (including "
     "RNG) is saved alongside it, restored with "
     "`boptim.load_checkpoint(...)`."),
])

NOTEBOOKS["quickstart.ipynb"] = nb([
    ("md", "# Quickstart: gpim_tpu in 60 seconds\n\n"
     "Reference parity: `Quickstart_GPim.ipynb` (an index of the example "
     "notebooks). This one is also runnable: the cell below trains an\n"
     "exact GP end-to-end on a tiny sparse image, which is the whole "
     "library in four lines.\n\n"
     "The full workflow notebooks (each mirrors a reference notebook):\n\n"
     "1. [2D sparse image reconstruction](sparse_image_2d.ipynb) - exact "
     "GP, the flagship workflow (`GP_sparse2Dimages.ipynb`).\n"
     "2. [3D hyperspectral reconstruction](hyperspectral_3d_sparse.ipynb) "
     "- inducing-point sparse GP (`GP_BEPFM.ipynb`, "
     "`GP_2D3D_images.ipynb`).\n"
     "3. [Multi-output GP over spectral components](eels_parallel_gp.ipynb)"
     " - vmapped parallel GPs (`GP_EELS.ipynb`).\n"
     "4. [4D cKPFM structured-kernel GP](ckpfm_4d_ski.ipynb) - exact "
     "Kronecker on lattices (`GP_TD_cKPFM.ipynb`).\n"
     "5. [GP-based exploration](bayesian_optimization.ipynb) - Bayesian "
     "optimization loop (`GP_based_exploration_exploitation.ipynb`).\n"
     "6. [Large NaN-masked grids](large_masked_ski.ipynb) - the "
     "masked-Kronecker CG engine at 10^5-10^7 cells (no reference "
     "equivalent; replaces its `GridInterpolationKernel` path).\n\n"
     "Everything runs on CPU for exploration and on TPU unchanged; "
     "multi-chip sharding is one `mesh=` kwarg."),
    ("code", SETUP.format(iters=100)),
    ("md", "A 48×48 test image with 65% of the pixels unmeasured (NaN), "
     "reconstructed by an exact GP:"),
    ("code", """\
rng = np.random.default_rng(0)
xx, yy = np.meshgrid(np.arange(48), np.arange(48), indexing="ij")
truth = np.sin(xx / 7.0) * np.cos(yy / 9.0)
R = truth + 0.05 * rng.standard_normal(truth.shape)
R[rng.random(R.shape) < 0.65] = np.nan

from gpim_tpu import reconstructor

mean, sd, hyperparams = reconstructor(
    utils.get_sparse_grid(R), R, utils.get_full_grid(R),
    kernel="RBF", iterations=ITERS, verbose=1).run()
print("rmse vs truth: %.4f" % float(
    np.sqrt(np.mean((mean - truth) ** 2))))"""),
    ("code", """\
utils.plot_reconstructed_data2d(R, mean)"""),
])

NOTEBOOKS["large_masked_ski.ipynb"] = nb([
    ("md", "# Large NaN-masked grids (masked-Kronecker CG engine)\n\n"
     "The regime of the reference's `GridInterpolationKernel` path "
     "(skgpr.py:436-440), far past dense-GP reach: a 64×64×32 cube\n"
     "(131,072 voxels; switch to 128×128×64 = 1M+, or 256×256×64 = 4.2M, "
     "on a TPU) with 70% of the spatial sites never measured, trained\n"
     "end-to-end through batched preconditioned conjugate gradients with "
     "stochastic-Lanczos-quadrature log-det gradients - one fused XLA\n"
     "program per training run."),
    ("code", SETUP.format(iters=30)),
    ("code", """\
from scipy.ndimage import gaussian_filter


def make_cube(shape=(64, 64, 32), missing=0.7, seed=2):
    rng = np.random.RandomState(seed)
    f = gaussian_filter(rng.randn(*shape), sigma=(4, 4, 2))
    f = (f - f.min()) / (f.max() - f.min())
    R = f + 0.02 * rng.randn(*shape)
    sites = rng.choice(shape[0] * shape[1],
                       int(missing * shape[0] * shape[1]), replace=False)
    R.reshape(-1, shape[2])[sites] = np.nan
    return f, R


truth, R = make_cube()
X = utils.get_sparse_grid(R)
X_full = utils.get_full_grid(R)
print("observed voxels:", int((~np.isnan(R)).sum()), "of", R.size)"""),
    ("code", """\
from gpim_tpu import skreconstructor

mean, sd, hyperparams = skreconstructor(
    X, R, X_full, kernel="RBF", ski=True,
    learning_rate=0.1, iterations=ITERS, verbose=1).run()

mean = mean.reshape(truth.shape)
rmse = float(np.sqrt(np.mean((mean - truth) ** 2)))
print("final lengthscale:",
      np.around(hyperparams["lengthscale"][-1], 3))
print("rmse vs noiseless truth: %.4f (data noise sd 0.02)" % rmse)"""),
])


def main():
    for name, notebook in NOTEBOOKS.items():
        path = os.path.join(HERE, name)
        nbf.write(notebook, path)
        print("wrote", path)


if __name__ == "__main__":
    main()
