"""
Flagship benchmark: 128x128 sparse-spiral PFM exact-GP reconstruction
(BASELINE.md config #1 - RBF kernel, 250 Adam iterations on the exact MLL,
dense mean+sd prediction over the full 16384-point grid).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value = wall-clock seconds for train(250)+predict, measured WARM (the
program is run twice and the second run is timed; the persistent XLA
compilation cache makes subsequent cold processes warm too).

vs_baseline = baseline_seconds / value (higher is better). The reference
publishes no numbers and its Pyro/GPyTorch engines are not installed here
(BASELINE.md), so the baseline is a reference-equivalent torch float64 exact
GP (same data, objective, optimizer, iteration count; dense Cholesky MLL +
chunked prediction) measured on this machine's CPU - see
benchmarks/torch_baseline.py and benchmarks/BASELINE_MEASURED.md.

Measured baseline: 3547.0 s (train 3528 s + predict 19 s) on the
container's single CPU core; it converged to the same hyperparameters as
this framework (lengthscale [3.45, 2.22] vs [3.46, 2.22], noise 0.0028 vs
0.0027) and the same reconstruction quality (rmse 0.044), so the speedup is
measured at matched statistical output.
"""

import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, "examples"))

# reference-equivalent torch CPU float64 measurement (benchmarks/torch_baseline.py)
BASELINE_SECONDS = 3547.0


def load_spiral():
    # bundled spiral scan when present, synthetic stand-in otherwise
    # (examples/_data.py resolution: $GPIM_TPU_EXPDATA > reference mirror)
    import _data
    return _data.spiral_scan()


def run_once(R, X, X_true, iterations=250):
    from gpim_tpu import reconstructor
    model = reconstructor(X, R, X_true, kernel="RBF",
                          iterations=iterations, verbose=0,
                          precision="single")
    t0 = time.time()
    mean, sd, _ = model.run()
    elapsed = time.time() - t0
    return elapsed, mean, sd


def main():
    import gpim_tpu  # noqa: F401  (configures precision/cache)
    from gpim_tpu import utils

    R = load_spiral()
    X = utils.get_sparse_grid(R)
    X_true = utils.get_full_grid(R)

    _cold, mean, sd = run_once(R, X, X_true)
    warm, mean, sd = run_once(R, X, X_true)

    obs = ~np.isnan(R)
    rmse = float(np.sqrt(np.mean((mean[obs] - R[obs]) ** 2)))
    assert not np.isnan(mean).any() and not np.isnan(sd).any()
    assert rmse < 0.1, "reconstruction quality regressed: rmse=%f" % rmse

    print(json.dumps({
        "metric": "spiral128_exactgp_recon_wall",
        "value": round(warm, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / warm, 2),
    }))


if __name__ == "__main__":
    main()
