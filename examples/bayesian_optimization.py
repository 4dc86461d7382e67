"""
GP-based Bayesian optimization of a measurement target
(reference recipe: README.md:71-109 / GP_based_exploration_exploitation
notebook - seed a few points, explore with EI, plot the query path).

Usage: python examples/bayesian_optimization.py
"""

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# smoke-test hook: tests/test_examples.py runs every example with a
# tiny iteration budget through this env override
_ITERS = int(os.environ.get("GPIM_TPU_EXAMPLE_ITERS", 200))


import gpim_tpu
from gpim_tpu import utils, boptimizer


def measure(idx):
    """Stand-in for the physical instrument callback: an analytic target."""
    return float(np.exp(-4 * np.log(2) *
                        ((idx[0] - 5) ** 2 + (idx[1] - 10) ** 2) / 4.5 ** 2))


def main():
    np.random.seed(0)
    size = 25
    seeds = np.random.randint(0, size, size=(2, 5))
    Z_sparse = np.full((size, size), np.nan)
    for i, j in zip(*seeds):
        Z_sparse[i, j] = measure((i, j))

    X_full = utils.get_full_grid(Z_sparse)
    X_sparse = utils.get_sparse_grid(Z_sparse)

    boptim = boptimizer(
        X_sparse, Z_sparse, X_full, measure,
        acquisition_function="ei",
        exploration_steps=min(_ITERS, 20),
        gp_iterations=_ITERS,
        save_checkpoints=True,
        filename="boptim_results",
        verbose=1)
    boptim.run()

    print("best value found:", np.nanmax(boptim.target_func_vals[-1]))
    utils.plot_query_points(boptim.indices_all, plot_lines=True)


if __name__ == "__main__":
    main()
