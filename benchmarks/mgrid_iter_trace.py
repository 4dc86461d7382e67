"""
Per-iteration wall + CG-convergence time series for the 1M masked-grid run
(VERDICT r3 weak #2: the 30-iter average, 433 ms/iter, was ~6x the
trained-state component sum and the roofline table could not say where the
rest went).

Two phases on the bench_mgrid_1m config (128x128x64, 70% of spectra
masked):

A. production schedule: MaskedGridEngine.train with the ramped segment
   schedule (2, 4, 8, 10, ...), each `_build_precond` / `_train_seg`
   launch timed host-side (block_until_ready), realized CG iterations
   recorded per Adam step via the `record_cg_iters` scan output
   (ops/ski.py return_iters plumbing);
B. per-iteration launches: `_train_seg(iterations=1)` in a host loop with
   a production-cadence preconditioner rebuild, giving a TRUE
   iteration-indexed wall series (upper-bounded by one extra dispatch
   per iteration).

Prints one JSON line per row and a closing component-accounting line:
    sum_i wall_i  vs  sum_i (cg_iters_i * mvm_block_unit) + rebuilds
so the floor-or-gap statement finally sums. Run on the real TPU chip:
    python benchmarks/mgrid_iter_trace.py [--iters 30]
"""

import json
import sys
import time

import numpy as np

import os
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def _block(x):
    import jax
    jax.block_until_ready(x)
    return x


def build_problem():
    from gpim_tpu import utils, skreconstructor
    rng = np.random.RandomState(0)
    shape = (128, 128, 64)
    ax = [np.arange(s, dtype=np.float64) for s in shape]
    xx, yy, zz = np.meshgrid(*ax, indexing="ij")
    f = (np.sin(xx / 9.0) * np.cos(yy / 11.0)
         + np.exp(-((zz - 30.0) / 15.0) ** 2))
    f = (f - f.min()) / np.ptp(f)
    R = f + 0.02 * rng.randn(*shape)
    sites = rng.choice(shape[0] * shape[1],
                       int(0.7 * shape[0] * shape[1]), replace=False)
    R.reshape(-1, shape[2])[sites] = np.nan
    X = utils.get_sparse_grid(R)
    Xf = utils.get_full_grid(R)
    m = skreconstructor(X, R, Xf, kernel="RBF", learning_rate=0.1,
                        iterations=0, verbose=0)
    assert m._mgrid_engine is not None
    return m


def production_trace(iters=30, warm=True):
    """Phase A: the engine's PRODUCTION schedule (adaptive rebuild
    cadence as of round 4) - total warm wall + the realized-CG-iteration
    series, whose segment boundaries are visible as drops after each
    rebuild."""
    m = build_problem()
    eng = m._mgrid_engine
    bounds = m._bounds()
    lr, jitter = m.learning_rate, m.jitter
    u0 = {k: v[0] for k, v in m.u.items()}

    def one_pass():
        return eng.train(u0, bounds, lr, jitter, iterations=iters,
                         record_cg_iters=True)

    if warm:
        one_pass()                    # compile pass (cached thereafter)
    t0 = time.time()
    _, traj = one_pass()
    total = time.time() - t0
    cg = np.asarray(traj["cg_iters"]).astype(int).tolist()
    rows = [{"metric": "mgrid1m_production_adaptive",
             "iters": iters, "wall_s": round(total, 3),
             "s_per_iter": round(total / iters, 4),
             "cg_iters": cg, "total_cg": int(np.sum(cg)),
             "loss_first_last": [round(float(traj["loss"][0]), 2),
                                 round(float(traj["loss"][-1]), 2)]}]
    return rows, rows


def per_iteration_trace(iters=30):
    """Phase B: one _train_seg(iterations=1) launch per Adam step, with the
    production rebuild cadence; true iteration-indexed wall."""
    from gpim_tpu.gpreg import mgrid_model as mm
    import optax

    m = build_problem()
    eng = m._mgrid_engine
    bounds = m._bounds()
    lr, jitter = m.learning_rate, m.jitter

    def rebuild(u):
        t0 = time.time()
        out = mm._build_precond(
            u, eng._axes, eng._mask, bounds, kernel=eng.kernel,
            grid_shape=eng.grid_shape, rank=eng.precond_rank)
        _block(out)
        return out, time.time() - t0

    # production cadence: rebuild before iterations 0, 2, 6, 14, 24, ...
    rebuild_at = set()
    i, ramp = 0, 2
    while i < iters:
        rebuild_at.add(i)
        i += min(eng.segment, ramp)
        ramp = min(eng.segment, ramp * 2)

    def one_pass(record):
        u = {k: v[0] for k, v in m.u.items()}
        opt_state = optax.adam(1.0).init(u)
        (Qp, lam_n), _ = rebuild(u)
        out = []
        for it in range(iters):
            t_pre = 0.0
            if it in rebuild_at and it > 0:
                (Qp, lam_n), t_pre = rebuild(u)
            t0 = time.time()
            u, opt_state, traj = mm._train_seg(
                u, opt_state, Qp, lam_n, eng._axes, eng._mask, eng._g0,
                eng._y, bounds, lr, jitter, kernel=eng.kernel,
                grid_shape=eng.grid_shape, cg_iters=eng.cg_iters,
                iterations=1, mesh=eng.mesh, record_iters=True)
            _block(traj)
            if record:
                out.append({
                    "iter": it, "wall_s": round(time.time() - t0, 4),
                    "precond_s": round(t_pre, 4),
                    "cg_iters": int(np.asarray(traj["cg_iters"])[0]),
                    "loss": round(float(np.asarray(traj["loss"])[0]), 2),
                })
        return out

    one_pass(record=False)
    return one_pass(record=True)


def warmstart_trace(iters=30):
    """Phase C (VERDICT r3 item 2's experiment): production schedule with
    the warm-started CG (previous Adam step's split-space solutions init
    the next step's solves - mgrid_model._train_seg warm_start=True).
    Reports wall, per-step realized CG iters, and the final
    hyperparameters of warm vs cold so quality drift is visible."""
    import jax.numpy as jnp
    from gpim_tpu.gpreg import mgrid_model as mm
    import optax

    out = {}
    for tag, ws in (("cold", False), ("warm", True)):
        m = build_problem()
        eng = m._mgrid_engine
        bounds = m._bounds()
        lr, jitter = m.learning_rate, m.jitter

        def one_pass():
            u = {k: v[0] for k, v in m.u.items()}
            opt_state = optax.adam(1.0).init(u)
            remaining, ramp = int(iters), 2
            cg_hist = []
            while remaining > 0:
                s = min(eng.segment, remaining, ramp)
                ramp = min(eng.segment, ramp * 2)
                Qp, lam_n = mm._build_precond(
                    u, eng._axes, eng._mask, bounds, kernel=eng.kernel,
                    grid_shape=eng.grid_shape, rank=eng.precond_rank)
                u, opt_state, traj = mm._train_seg(
                    u, opt_state, Qp, lam_n, eng._axes, eng._mask,
                    eng._g0, eng._y, bounds, lr, jitter,
                    kernel=eng.kernel, grid_shape=eng.grid_shape,
                    cg_iters=eng.cg_iters, iterations=s, mesh=eng.mesh,
                    record_iters=True, warm_start=ws)
                _block(traj)
                cg_hist += np.asarray(traj["cg_iters"]).astype(
                    int).tolist()
                remaining -= s
            return u, cg_hist, traj

        one_pass()                              # compile
        t0 = time.time()
        u_f, cg_hist, traj = one_pass()
        wall = time.time() - t0
        out[tag] = {
            "wall_s": round(wall, 3),
            "s_per_iter": round(wall / iters, 4),
            "cg_iters": cg_hist,
            "total_cg": int(np.sum(cg_hist)),
            "final_ls": [round(float(x), 3)
                         for x in np.asarray(traj["lengthscale"])[-1]],
            "final_noise": round(float(np.asarray(traj["noise"])[-1]), 5),
        }
    return out


def main():
    iters = 30
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    if "--warmstart" in sys.argv:
        ws = warmstart_trace(iters)
        for tag, r in ws.items():
            print(json.dumps({"metric": "mgrid1m_warmstart_" + tag, **r}),
                  flush=True)
        return
    rows, segs = production_trace(iters)
    for r in rows:
        print(json.dumps(r), flush=True)
    per_it = per_iteration_trace(iters)
    for r in per_it:
        print(json.dumps({"metric": "mgrid1m_iter", **r}), flush=True)
    # component accounting: cg share of per-iteration wall
    total_wall = sum(r["wall_s"] for r in per_it)
    total_cg = sum(r["cg_iters"] for r in per_it)
    print(json.dumps({
        "metric": "mgrid1m_accounting",
        "per_iter_launch_wall_s": round(total_wall, 3),
        "total_realized_cg_iters": int(total_cg),
        "mean_wall_per_cg_iter_ms": round(1e3 * total_wall / total_cg, 2),
        "rebuild_s": round(sum(r["precond_s"] for r in per_it), 3),
    }), flush=True)


if __name__ == "__main__":
    main()
