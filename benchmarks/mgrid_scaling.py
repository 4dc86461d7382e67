"""
Masked-grid engine scaling sweep: G vs s/iter and the single-chip HBM
frontier (VERDICT r4 next #2).

For each cube size, builds the suite's synthetic masked field (70% of
(x, y) spectra removed), trains 30 iterations through the public
skreconstructor (cold + warm), records warm s/iter, train-program
compiled memory_analysis (where the backend reports it) and the analytic
buffer model, and the predict wall. The sweep walks UP in G until the
chip OOMs (caught and recorded) - the frontier entry documents where and
why. Results append to stdout as JSON lines and rewrite
benchmarks/MGRID_SCALING.json.

Usage: python benchmarks/mgrid_scaling.py [--quick]
"""

import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

QUICK = "--quick" in sys.argv

SHAPES = [
    (64, 64, 64),        # 262,144
    (128, 128, 64),      # 1,048,576   (suite headline row)
    (192, 192, 64),      # 2,359,296
    (256, 256, 64),      # 4,194,304   (suite frontier row)
    (256, 256, 128),     # 8,388,608
    (384, 384, 96),      # 14,155,776
    (512, 512, 128),     # 33,554,432
]
if QUICK:
    SHAPES = SHAPES[:2]


def make_data(shape, mask_frac=0.7, seed=0):
    rng = np.random.RandomState(seed)
    ax = [np.arange(s, dtype=np.float64) for s in shape]
    xx, yy, zz = np.meshgrid(*ax, indexing="ij")
    f = (np.sin(xx / 9.0) * np.cos(yy / 11.0)
         + np.exp(-((zz - 30.0) / 15.0) ** 2))
    f = (f - f.min()) / np.ptp(f)
    R = f + 0.02 * rng.randn(*shape)
    sites = rng.choice(shape[0] * shape[1],
                       int(mask_frac * shape[0] * shape[1]), replace=False)
    R.reshape(-1, shape[2])[sites] = np.nan
    return f, R


def run_shape(shape, iters):
    from gpim_tpu import utils, skreconstructor
    f, R = make_data(shape)
    X = utils.get_sparse_grid(R)
    Xf = utils.get_full_grid(R)
    rec = {"shape": list(shape), "G": int(np.prod(shape)),
           "n_obs": int((~np.isnan(R)).sum()), "iterations": iters}

    m = skreconstructor(X, R, Xf, kernel="RBF", learning_rate=0.1,
                        iterations=iters, verbose=0)
    assert m._mgrid_engine is not None
    eng = m._mgrid_engine
    rec["precond_rank"] = eng.precond_rank

    t0 = time.time()
    m.train()
    rec["train_cold_s"] = round(time.time() - t0, 2)
    # warm: fresh model, shared compiled programs
    m2 = skreconstructor(X, R, Xf, kernel="RBF", learning_rate=0.1,
                         iterations=iters, verbose=0)
    t0 = time.time()
    m2.train()
    warm = time.time() - t0
    rec["train_warm_s"] = round(warm, 2)
    rec["s_per_iter"] = round(warm / iters, 4)

    t0 = time.time()
    m2.predict()
    rec["predict_cold_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    mean, sd = m2.predict()
    rec["predict_warm_s"] = round(time.time() - t0, 2)
    rmse = float(np.sqrt(np.mean((mean.reshape(shape) - f) ** 2)))
    rec["rmse_vs_truth"] = round(rmse, 4)
    rec["data_sd"] = round(float(np.nanstd(R)), 4)
    if not np.isfinite(mean).all():
        raise RuntimeError("non-finite prediction at shape %s" % (shape,))

    u_g = {k: v[0] for k, v in m2.u.items()}
    rec["memory"] = eng.train_memory_analysis(
        u_g, m2._bounds(),
        np.asarray(m2.learning_rate, m2.dtype),
        np.asarray(m2.jitter, m2.dtype), iterations=iters)
    return rec


def one_shape_main(shape_arg):
    """Subprocess entry: run one shape, print its JSON record."""
    import jax
    shape = tuple(int(s) for s in shape_arg.split(","))
    # 10 iterations (not 30) at >= 4M cells keeps the sweep affordable;
    # grids past mgrid_model._FUSED_MAX_G auto-route to the per-segment
    # host loop (one fused 30-iteration device program at 4.2M cells
    # reproducibly crashed the TPU worker) - see BASELINE_MEASURED.md
    iters = 5 if QUICK else (10 if np.prod(shape) >= 4e6 else 30)
    rec = run_shape(shape, iters)
    rec["backend"] = jax.default_backend()
    print("RESULT " + json.dumps(rec), flush=True)


def main():
    """Orchestrator: one SUBPROCESS per shape. An out-of-memory failure at
    the frontier can kill the whole TPU worker process (observed at the
    4.2M shape after accumulating compiled programs from smaller shapes),
    so each shape gets a fresh process and a fresh device state; a crash
    or OOM is recorded as the frontier and the sweep stops."""
    import subprocess
    rows = []
    for shape in SHAPES:
        arg = ",".join(str(s) for s in shape)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--shape", arg]
            + (["--quick"] if QUICK else []),
            capture_output=True, text=True, timeout=5400)
        rec = None
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                rec = json.loads(line[len("RESULT "):])
        if rec is None:
            tail = (proc.stdout + proc.stderr)[-2000:]
            oom = ("RESOURCE_EXHAUSTED" in tail or "Out of memory" in tail
                   or "out of memory" in tail or "OOM" in tail
                   or "worker process crashed" in tail)
            rec = {"shape": list(shape), "G": int(np.prod(shape)),
                   "oom_or_crash": True, "oom": oom,
                   "rc": proc.returncode, "error": tail[-400:]}
            print(json.dumps(rec), flush=True)
            rows.append(rec)
            break              # the frontier: everything larger also fails
        print(json.dumps(rec), flush=True)
        rows.append(rec)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "MGRID_SCALING.json")
    with open(out, "w") as fh:
        json.dump(rows, fh, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    if "--shape" in sys.argv:
        one_shape_main(sys.argv[sys.argv.index("--shape") + 1])
    else:
        main()
