"""
Structured-engine training-iteration roofline: per-component cost split for
the one training path that is not closed-form (the CG+SLQ estimator family
of reference skgpr.py:124-131, here ops/ski.py).

The headline 70%-masked 64x64x32 cube (suite row ski_masked64x64x32) is
lattice-aligned, so it runs the masked-grid Kronecker engine
(gpreg/mgrid_model.py); passing ``lattice=False`` forces the generic
off-lattice interpolation engine (gpreg/ski_model.py). Both share the
ski.ski_mll_from_mvm estimator core, so both get the same breakdown:

  - preconditioner rebuild (kron eigen-root + orthonormal split basis,
    once per ``segment`` steps; noise-independent, nothing runs per-loss)
  - forward MLL core (split-preconditioned CG solve of [yc~ | probes]
    + SLQ logdet)
  - full value_and_grad step (forward + the two-surrogate-mvm backward)
  - the REALIZED CG iteration count (while_loop trip count) at init and
    at trained hyperparameters, with the solve residual
  - a single operator mvm at the CG block width and one P^-1/2 apply -
    the units of the CG floor:
        floor = (realized_iters + 1) x (mvm + 2 x pisqrt apply)
    (each split-CG iteration applies At = P^-1/2 A P^-1/2)

and the derived floor-or-gap statement recorded in
benchmarks/BASELINE_MEASURED.md, which ties the cg_iters / n_probes /
segment budgets to measured convergence instead of hand-picked constants.

All timings are warm loop-averages with a final fetch (same methodology as
benchmarks/suite.py bench_component_tflops; single timings through the axon
tunnel are unreliable). Every jitted helper takes the large arrays as
ARGUMENTS - closure-captured device arrays become HLO constants, and at
G = 131k the serialized program blows past the tunnel's upload limit.

Usage: python benchmarks/ski_roofline.py [--probes-sweep] [--offlattice-only]
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp

from gpim_tpu import utils, skreconstructor
from gpim_tpu.gpreg import mgrid_model, ski_model
from gpim_tpu.gpreg.multi import _constrain_task
from gpim_tpu.ops import ski


def _t(fn, *a, iters=20):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


def build_problem(lattice, shape=(64, 64, 32)):
    from scipy.ndimage import gaussian_filter
    rng = np.random.RandomState(2)
    f = gaussian_filter(rng.randn(*shape), sigma=(4, 4, 2))
    f = (f - f.min()) / (f.max() - f.min())
    R = f + 0.02 * rng.randn(*shape)
    sites = rng.choice(shape[0] * shape[1],
                       int(0.7 * shape[0] * shape[1]), replace=False)
    R.reshape(-1, shape[2])[sites] = np.nan
    X = utils.get_sparse_grid(R)
    Xf = utils.get_full_grid(R)
    m = skreconstructor(X, R, Xf, kernel="RBF", ski=True, lattice=lattice,
                        learning_rate=0.1, iterations=0, verbose=0)
    m.run()   # 0-iteration train/predict just materializes the engine
    return m


# --- jitted probes (large arrays as args; static: kernel/shape/iters) -----

@partial(jax.jit, static_argnames=("kernel", "grid_shape", "cg_iters",
                                   "mgrid"))
def _solve_probe(u, Qp, lam_n, arrs, y, mask_, g0, bounds, jitter, *,
                 kernel, grid_shape, cg_iters, mgrid):
    """One split-CG solve of [yc~ | probes]; returns (trip count, max rel
    residual of the split system, rel residual of the mapped-back yc
    solve in the ORIGINAL system, the split RHS block B, noise_pj)."""
    pc = _constrain_task(u, bounds)
    kp = {"lengthscale": pc["lengthscale"], "variance": pc["variance"]}
    noise_pj = pc["noise"] + jitter
    yc = (y - pc["mean"]) * mask_
    ax = 1 if mgrid else 0                # mgrid runs batch-first
    if mgrid:
        raw = ski.make_masked_grid_mvm(kernel, list(arrs), grid_shape,
                                       mask_, batch_first=True)
    else:
        grids, idx, wgt = arrs
        raw = ski._make_mvm(kernel, list(grids), grid_shape, idx, wgt,
                            sorted_corners=True)
    mvm = lambda v: raw(kp, noise_pj, v)
    pisqrt, _ = ski.split_apply(Qp, lam_n, noise_pj, vec_axis=ax)
    At = lambda v: pisqrt(mvm(pisqrt(v)))
    if mgrid:
        B = jnp.concatenate([pisqrt(yc[None, :]), g0], axis=0)
    else:
        B = jnp.concatenate([pisqrt(yc[:, None]), g0], axis=1)
    X, _, _, k = ski.batched_pcg(At, lambda r: r, B, cg_iters,
                                 return_iters=True, vec_axis=ax)
    R = B - At(X)
    rel = jnp.sqrt(jnp.sum(R * R, ax) / jnp.maximum(jnp.sum(B * B, ax),
                                                    1e-30))
    alpha = pisqrt(X[0] if mgrid else X[:, 0])
    r0 = yc - mvm(alpha)
    rel0 = jnp.sqrt(jnp.sum(r0 * r0)
                    / jnp.maximum(jnp.sum(yc * yc), 1e-30))
    return k, jnp.max(rel), rel0, B, noise_pj


@partial(jax.jit, static_argnames=("kernel", "grid_shape", "mgrid"))
def _mvm_probe(u, arrs, mask_, B, bounds, jitter, *,
               kernel, grid_shape, mgrid):
    pc = _constrain_task(u, bounds)
    kp = {"lengthscale": pc["lengthscale"], "variance": pc["variance"]}
    noise_pj = pc["noise"] + jitter
    if mgrid:
        raw = ski.make_masked_grid_mvm(kernel, list(arrs), grid_shape,
                                       mask_, batch_first=True)
    else:
        grids, idx, wgt = arrs
        raw = ski._make_mvm(kernel, list(grids), grid_shape, idx, wgt,
                            sorted_corners=True)
    return raw(kp, noise_pj, B)


@partial(jax.jit, static_argnames=("ax",))
def _pisqrt_apply_probe(Qp, lam_n, noise_pj, B, *, ax):
    """Per-CG-iteration P^-1/2 apply; each split-CG iteration pays TWO of
    these plus one operator mvm."""
    pisqrt, _ = ski.split_apply(Qp, lam_n, noise_pj, vec_axis=ax)
    return pisqrt(B)


def _instrument(tag, eng, lossf, loss_args_of, solve_args_of, root_of,
                train, u):
    is_mgrid = isinstance(eng, mgrid_model.MaskedGridEngine)
    stat = dict(kernel=eng.kernel, grid_shape=eng.grid_shape,
                mgrid=is_mgrid)
    out = {"metric": tag,
           "n_probes": int(eng._g0.shape[0 if is_mgrid else 1]),
           "cg_cap": eng.cg_iters, "precond_rank": eng.precond_rank,
           "segment": eng.segment}

    t_pre, (Qp, lam_n) = _t(root_of, u)
    out["precond_rebuild_ms"] = round(t_pre * 1e3, 2)

    jl = jax.jit(lossf)
    vgf = jax.jit(jax.value_and_grad(lossf))

    t_fwd, _ = _t(jl, *loss_args_of(u, Qp, lam_n))
    out["forward_init_ms"] = round(t_fwd * 1e3, 2)
    t_vg, _ = _t(vgf, *loss_args_of(u, Qp, lam_n))
    out["value_and_grad_init_ms"] = round(t_vg * 1e3, 2)

    k, rel, rel0, _, _ = jax.block_until_ready(_solve_probe(
        *solve_args_of(u, Qp, lam_n), cg_iters=eng.cg_iters, **stat))
    out["realized_cg_iters_init"] = int(k)
    out["cg_max_rel_residual_init"] = float(f"{float(rel):.2e}")
    out["orig_rel_residual_init"] = float(f"{float(rel0):.2e}")

    u_tr = train(u, 30)
    Qp_tr, lam_tr = root_of(u_tr)
    k, rel, rel0, B, noise_pj = jax.block_until_ready(_solve_probe(
        *solve_args_of(u_tr, Qp_tr, lam_tr), cg_iters=eng.cg_iters,
        **stat))
    out["realized_cg_iters_trained"] = int(k)
    out["cg_max_rel_residual_trained"] = float(f"{float(rel):.2e}")
    out["orig_rel_residual_trained"] = float(f"{float(rel0):.2e}")

    t_fwd, _ = _t(jl, *loss_args_of(u_tr, Qp_tr, lam_tr))
    out["forward_trained_ms"] = round(t_fwd * 1e3, 2)
    t_vg, _ = _t(vgf, *loss_args_of(u_tr, Qp_tr, lam_tr))
    out["value_and_grad_trained_ms"] = round(t_vg * 1e3, 2)
    out["backward_ms"] = round(
        (t_vg - t_fwd) * 1e3, 2)

    sa = solve_args_of(u_tr, Qp_tr, lam_tr)
    t_mvm, _ = _t(lambda: _mvm_probe(
        sa[0], sa[3], sa[5], B, sa[7], sa[8], **stat), iters=50)
    out["mvm_block_ms"] = round(t_mvm * 1e3, 3)
    t_pa, _ = _t(lambda: _pisqrt_apply_probe(
        Qp_tr, lam_tr, noise_pj, B, ax=1 if is_mgrid else 0), iters=50)
    out["pisqrt_apply_ms"] = round(t_pa * 1e3, 3)

    t0 = time.time()
    train(u, 30)
    out["train_ms_per_iter"] = round((time.time() - t0) / 30 * 1e3, 1)

    # floor = per-iter CG work x realized iters (split CG: one mvm + two
    # half-applies per iteration; no per-solve factorization remains)
    for phase in ("init", "trained"):
        ki = out[f"realized_cg_iters_{phase}"]
        out[f"cg_floor_{phase}_ms"] = round(
            (ki + 1) * (out["mvm_block_ms"]
                        + 2.0 * out["pisqrt_apply_ms"]), 2)
    out["precond_amortized_ms"] = round(
        out["precond_rebuild_ms"] / eng.segment, 2)
    print(json.dumps(out))
    return u_tr, Qp_tr, lam_tr


def run_mgrid(shape=(64, 64, 32)):
    m = build_problem(lattice=True, shape=shape)
    eng = m._mgrid_engine
    assert eng is not None
    u = {k: v[0] for k, v in m.u.items()}
    bounds = m._bounds()
    jit_ = jnp.asarray(m.jitter, m.dtype)
    lr = jnp.asarray(0.1, m.dtype)

    lossf = partial(mgrid_model._loss, kernel=eng.kernel,
                    grid_shape=eng.grid_shape, cg_iters=eng.cg_iters)

    def loss_args_of(u_, Qp, lam_n):
        return (u_, eng._axes, eng._mask, eng._g0, Qp, lam_n,
                eng._y, bounds, jit_)

    def solve_args_of(u_, Qp, lam_n):
        return (u_, Qp, lam_n, tuple(eng._axes), eng._y, eng._mask,
                eng._g0, bounds, jit_)

    def root_of(u_):
        return mgrid_model._build_precond(
            u_, eng._axes, eng._mask, bounds, kernel=eng.kernel,
            grid_shape=eng.grid_shape, rank=eng.precond_rank)

    def train(u_, iters):
        u2, _ = eng.train(u_, bounds, lr, jit_, iterations=iters)
        return u2

    _instrument("mgrid_roofline_%dx%dx%d" % shape, eng, lossf,
                loss_args_of, solve_args_of, root_of, train, u)


def run_offlattice():
    m = build_problem(lattice=False)
    eng = m._ski_engine
    assert eng is not None
    u = {k: v[0] for k, v in m.u.items()}
    bounds = m._bounds()
    jit_ = jnp.asarray(m.jitter, m.dtype)
    lr = jnp.asarray(0.1, m.dtype)
    # engine-internal order: points sorted by lower corner. The direct
    # _loss/_solve probes below must mirror it; eng.train/predict permute
    # the caller-order arrays themselves, so THEY get the originals.
    y0, mask0 = m._yd, m._maskd
    y, mask_ = y0[eng._permj], mask0[eng._permj]

    lossf = partial(ski_model._loss, kernel=eng.kernel,
                    grid_shape=eng.grid_shape, cg_iters=eng.cg_iters,
                    sorted_corners=True)

    def loss_args_of(u_, Qp, lam_n):
        return (u_, eng._grids, eng._idx, eng._wgt, Qp, lam_n, eng._g0,
                y, mask_, bounds, jit_)

    def solve_args_of(u_, Qp, lam_n):
        return (u_, Qp, lam_n, (tuple(eng._grids), eng._idx, eng._wgt),
                y, mask_, eng._g0, bounds, jit_)

    def root_of(u_):
        return ski_model._build_precond(
            u_, eng._grids, eng._i0, eng._w0, eng._mask, bounds,
            kernel=eng.kernel, grid_shape=eng.grid_shape,
            rank=eng.precond_rank)

    def train(u_, iters):
        u2, _ = eng.train(u_, y0, mask0, bounds, lr, jit_,
                          iterations=iters)
        return u2

    u_tr, Qp_tr, lam_tr = _instrument(
        "ski_offlattice_roofline_64x64x32", eng, lossf, loss_args_of,
        solve_args_of, root_of, train, u)

    if "--probes-sweep" in sys.argv:
        # gradient-noise budget: spread of d(loss)/d(u_ls0) across
        # independent probe bases vs probe count - ties n_probes to a
        # measured estimator error (VERDICT r2 items 2/7).
        n_pad = int(y.shape[0])
        base = jax.jit(jax.value_and_grad(lossf))
        rng = np.random.default_rng(0)
        pm1 = np.asarray([-1.0, 1.0], np.float32)
        for np_ in (2, 4, 8, 16):
            gs = []
            for rep in range(6):
                g0 = jnp.asarray(rng.choice(pm1, size=(n_pad, np_)))
                _, g = base(u_tr, eng._grids, eng._idx, eng._wgt, Qp_tr,
                            lam_tr, g0, y, mask_, bounds, jit_)
                gs.append(float(g["lengthscale"][0]))
            print(json.dumps(
                {"metric": "ski_grad_probe_sweep", "n_probes": np_,
                 "grad_uls0_mean": round(float(np.mean(gs)), 5),
                 "grad_uls0_std": round(float(np.std(gs)), 5)}))


def main():
    if "--large" in sys.argv:
        # the reference-scale regime (suite row mgrid_masked128x128x64)
        run_mgrid(shape=(128, 128, 64))
        return
    if "--offlattice-only" not in sys.argv:
        run_mgrid()
    run_offlattice()


if __name__ == "__main__":
    main()
