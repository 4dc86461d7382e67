"""
SKI (structured-kernel-interpolation) GP model layer: ties the ops in
gpim_tpu/ops/ski.py into train/predict programs with the same parameter
semantics as the dense skreconstructor path (constant mean + outputscale +
interval lengthscales + positive noise; GPyTorch skgprmodel parity,
reference skgpr.py:399-448).

The jitted programs are module-level (static over kernel / grid shape /
iteration counts, with interpolation tensors passed as array arguments), so
fresh model instances on the same problem shape reuse compiled executables
instead of re-tracing.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gpim_tpu.kernels.transforms import interval_log_jacobian
from gpim_tpu.ops import ski

__all__ = ["SKIEngine"]

_LOG_2PI = float(np.log(2.0 * np.pi))


# GPyTorch-parity parameter mapping, shared with the dense and Kronecker
# paths (multi._constrain_task) so checkpoints/trajectories stay compatible
from gpim_tpu.gpreg.multi import _constrain_task as _constrain  # noqa: E402


def _loss(u, grids, idx, wgt, probes, y, mask_, bounds, jitter, *,
          kernel, grid_shape, cg_iters):
    core = ski.ski_mll(kernel, list(grids), grid_shape, idx, wgt,
                       cg_iters, probes)
    p = _constrain(u, bounds)
    yc = (y - p["mean"]) * mask_
    noise_pj = p["noise"] + jitter
    n_eff = jnp.sum(mask_)
    n_pad_ = y.shape[0]
    kp = {"lengthscale": p["lengthscale"], "variance": p["variance"]}
    # the interval-transform log-Jacobian MAP term keeps the objective
    # identical to the dense path's (multi._iv_loss)
    return (core(kp, noise_pj, yc)
            + 0.5 * n_eff * _LOG_2PI
            - 0.5 * (n_pad_ - n_eff) * jnp.log(noise_pj)
            - interval_log_jacobian(
                u["lengthscale"], bounds["ls_lo"], bounds["ls_hi"]))


@partial(jax.jit, static_argnames=(
    "kernel", "grid_shape", "cg_iters", "iterations"))
def _train(u0, grids, idx, wgt, probes, y, mask_, bounds, lr, jitter, *,
           kernel, grid_shape, cg_iters, iterations):
    opt = optax.adam(learning_rate=lr)
    opt_state = opt.init(u0)
    lf = partial(_loss, kernel=kernel, grid_shape=grid_shape,
                 cg_iters=cg_iters)

    def step(carry, _):
        u, opt_state = carry
        loss, g = jax.value_and_grad(lf)(
            u, grids, idx, wgt, probes, y, mask_, bounds, jitter)
        updates, opt_state = opt.update(g, opt_state, u)
        u = optax.apply_updates(u, updates)
        p = _constrain(u, bounds)
        rec = {"lengthscale": p["lengthscale"],
               "noise": p["noise"], "loss": loss}
        return (u, opt_state), rec

    (u_final, _), traj = jax.lax.scan(
        step, (u0, opt_state), None, length=iterations)
    return u_final, traj


@partial(jax.jit, static_argnames=("kernel", "grid_shape", "cg_iters",
                                   "rank"))
def _predict(u, grids, idx, wgt, y, mask_, bounds, jitter,
             test_idx, test_wgt, key, *, kernel, grid_shape, cg_iters,
             rank):
    predictor = ski.make_ski_predictor(
        kernel, list(grids), grid_shape, idx, wgt, cg_iters, rank)
    p = _constrain(u, bounds)
    yc = (y - p["mean"]) * mask_
    noise_pj = p["noise"] + jitter
    m = test_idx.shape[0]
    kss = jnp.full((m,), p["variance"], y.dtype)
    mean, var = predictor(
        {"lengthscale": p["lengthscale"], "variance": p["variance"]},
        noise_pj, yc, test_idx, test_wgt, kss, key)
    mean = mean + p["mean"]
    var = var + p["noise"]  # noiseless=False semantics
    return mean, var


class SKIEngine:
    """Holds the grid and interpolation tensors for one dataset (shapes are
    static per engine instance); the compiled programs are shared."""

    def __init__(self, kernel, X_pad, mask, grids, *,
                 cg_iters=64, n_probes=8, rank=100, seed=0):
        self.kernel = kernel
        self.grids_np = grids
        self.grid_shape = tuple(len(g) for g in grids)
        self.dtype = X_pad.dtype
        idx, wgt = ski.build_interp(X_pad, grids, mask)
        self._idx = jnp.asarray(idx)
        self._wgt = jnp.asarray(wgt)
        self._grids = tuple(jnp.asarray(g) for g in grids)
        self.cg_iters = int(min(cg_iters, X_pad.shape[0]))
        self.rank = int(min(rank, X_pad.shape[0]))
        n_pad = X_pad.shape[0]
        rng = np.random.default_rng(seed)
        probes = rng.choice(np.asarray([-1.0, 1.0], X_pad.dtype),
                            size=(n_pad, n_probes))
        self._probes = jnp.asarray(probes)
        self._key = jax.random.PRNGKey(seed)

    def train(self, u0, y, mask_, bounds, lr, jitter, *, iterations):
        return _train(u0, self._grids, self._idx, self._wgt, self._probes,
                      y, mask_, bounds, lr, jitter,
                      kernel=self.kernel, grid_shape=self.grid_shape,
                      cg_iters=self.cg_iters, iterations=int(iterations))

    def predict(self, u, y, mask, bounds, jitter, Xtest_clean):
        """Host wrapper: builds test interpolation tensors then runs the
        jitted predictor over ALL test points at once (per-point cost is a
        2^d gather + rank-r dot, no chunking needed)."""
        t_idx, t_wgt = ski.build_interp(
            np.asarray(Xtest_clean, self.dtype), self.grids_np)
        return _predict(
            u, self._grids, self._idx, self._wgt, y, mask, bounds, jitter,
            jnp.asarray(t_idx), jnp.asarray(t_wgt), self._key,
            kernel=self.kernel, grid_shape=self.grid_shape,
            cg_iters=self.cg_iters, rank=self.rank)
