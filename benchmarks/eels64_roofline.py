"""
Roofline accounting for the eels64 suite row (VERDICT r4 weak #2): is the
T=64-channel, n~2k closed-form training step at its batched-linear-algebra
floor, or hiding a layout problem?

Reproduces the exact bench_eels64_parallel workload, splits the wall into
train / predict, and times the batched components of one training
iteration (vmapped over T=64 at the true padded n):

    fused gram+mask      ~ T n^2 d      (pallas on TPU f32)
    cholesky             T n^3 / 3
    tri_inverse          T n^3 / 3      (ops/tri.py bisection inverse)
    syrk V^T V           T n^3          (bf16x3 HIGH)
    bwd fused reductions ~ 2 T n^2 reads (pallas)

Accounted fraction = iters * sum(component walls) / measured train wall.
Writes benchmarks/EELS64_ROOFLINE.json; the narrative lives in
BASELINE_MEASURED.md.

Usage: python benchmarks/eels64_roofline.py
"""

import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

ITERS = 100


def _dev_time(fn, *args, reps=30):
    """Suite-style device timing: queue ``reps`` sequential applications,
    sync once (ops execute in order on the device, so wall/reps is the
    per-op time; the final float() forces completion)."""
    import jax.numpy as jnp
    r = fn(*args)
    _sync = float(jnp.sum(r[0] if isinstance(r, tuple) else r))
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    _sync = float(jnp.sum(r[0] if isinstance(r, tuple) else r))
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from scipy.ndimage import gaussian_filter
    from gpim_tpu import utils, vreconstructor
    from gpim_tpu.gpreg import multi
    from gpim_tpu.ops.linalg import safe_cholesky
    from gpim_tpu.ops.tri import tri_inverse

    # --- the exact suite workload --------------------------------------
    rng = np.random.RandomState(3)
    g, T = 64, 64
    fields = gaussian_filter(rng.randn(g, g, T), sigma=(5, 5, 0))
    fields = (fields - fields.min()) / np.ptp(fields)
    Y = fields + 0.02 * rng.randn(g, g, T)
    Y[rng.random((g, g)) < 0.5] = np.nan
    X = utils.get_full_grid(Y[..., 0]).copy()
    X[:, np.isnan(Y[..., 0])] = np.nan
    Xf = utils.get_full_grid(Y[..., 0])

    def make():
        return vreconstructor(X, Y, Xf, kernel="RBF", independent=True,
                              iterations=ITERS, verbose=0)

    m = make()
    m.run()                       # cold: compile everything
    m2 = make()
    t0 = time.time()
    m2.train()
    train_wall = time.time() - t0
    t0 = time.time()
    m2.predict()
    predict_wall = time.time() - t0

    n = int(m2._Xd.shape[0])
    d = int(m2._Xd.shape[1])
    out = {"metric": "eels64_roofline", "T": T, "n_padded": n, "d": d,
           "iterations": ITERS,
           "train_wall_s": round(train_wall, 3),
           "predict_wall_s": round(predict_wall, 3),
           "backend": jax.default_backend()}

    # --- batched component rates at the true (T, n) ---------------------
    dtype = m2.dtype
    key = jax.random.PRNGKey(0)
    Xr = jax.random.normal(key, (T, n, 64), jnp.float32).astype(dtype)
    A = (jnp.einsum("tik,tjk->tij", Xr, Xr)
         + n * jnp.eye(n, dtype=dtype)[None])
    L = jnp.linalg.cholesky(A)
    f3 = float(T) * float(n) ** 3

    comp = {}
    tt = _dev_time(jax.jit(jax.vmap(safe_cholesky)), A)
    comp["cholesky"] = {"s": round(tt, 5),
                        "tflops": round(f3 / 3 / tt / 1e12, 2)}
    tt = _dev_time(jax.jit(jax.vmap(tri_inverse)), L)
    comp["tri_inverse"] = {"s": round(tt, 5),
                           "tflops": round(f3 / 3 / tt / 1e12, 2)}
    syrk = jax.jit(lambda V: jnp.einsum(
        "tki,tkj->tij", V, V, precision=jax.lax.Precision.HIGH))
    tt = _dev_time(syrk, L)
    comp["syrk_bf16x3"] = {"s": round(tt, 5),
                           "tflops": round(f3 / tt / 1e12, 2)}
    # the two pallas passes + small reductions: measure as the residual of
    # a full vmapped loss+grad step minus the three dense components
    u, bounds = m2.u, m2._bounds()
    Xd, Yd, maskd = m2._Xd, m2._Yd, m2._maskd
    loss_grad = jax.jit(jax.value_and_grad(
        lambda uu: multi._iv_loss(uu, Xd, Yd, maskd, bounds,
                                  jnp.asarray(m2.jitter, dtype),
                                  kernel="RBF")))
    tt = _dev_time(lambda uu: loss_grad(uu)[0], u)
    comp["full_step_value_and_grad"] = {"s": round(tt, 5)}
    out["components"] = comp

    dense = (comp["cholesky"]["s"] + comp["tri_inverse"]["s"]
             + comp["syrk_bf16x3"]["s"])
    step = comp["full_step_value_and_grad"]["s"]
    out["dense_components_s_per_iter"] = round(dense, 5)
    out["gram_and_reductions_s_per_iter"] = round(step - dense, 5)
    out["accounted_step_fraction"] = round(dense / step, 3)
    out["accounted_train_fraction"] = round(ITERS * step / train_wall, 3)
    # model flops per iteration: chol + tri_inverse + syrk (fwd+bwd dense)
    out["train_eff_tflops"] = round(
        ITERS * f3 * (1 / 3 + 1 / 3 + 1) / train_wall / 1e12, 2)

    print(json.dumps(out, indent=1))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "EELS64_ROOFLINE.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
