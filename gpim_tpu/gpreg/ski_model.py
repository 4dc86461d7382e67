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

Training runs in SEGMENTS of a few Adam steps each: the Kronecker-eigen
preconditioner (ops.ski.kron_eig_root) is rebuilt once per segment and the
segment is one lax.scan program. A slightly stale preconditioner keeps every
estimator unbiased (see ops.ski.ski_mll), costs only a little CG speed, and
bounds single device-program run time - long monolithic programs both waste
preconditioner rebuilds and can exceed executor limits.
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


def _loss(u, grids, idx, wgt, Qp, lam_n, g0, y, mask_, bounds, jitter, *,
          kernel, grid_shape, cg_iters, sorted_corners=False,
          record_iters=False):
    core = ski.ski_mll(kernel, list(grids), grid_shape, idx, wgt,
                       cg_iters, g0, sorted_corners=sorted_corners,
                       return_iters=record_iters)
    p = _constrain(u, bounds)
    yc = (y - p["mean"]) * mask_
    noise_pj = p["noise"] + jitter
    n_eff = jnp.sum(mask_)
    n_pad_ = y.shape[0]
    kp = {"lengthscale": p["lengthscale"], "variance": p["variance"]}
    base = core(kp, noise_pj, yc, Qp, lam_n)
    it = None
    if record_iters:
        base, it = base
    # the interval-transform log-Jacobian MAP term keeps the objective
    # identical to the dense path's (multi._iv_loss)
    loss = (base
            + 0.5 * n_eff * _LOG_2PI
            - 0.5 * (n_pad_ - n_eff) * jnp.log(noise_pj)
            - interval_log_jacobian(
                u["lengthscale"], bounds["ls_lo"], bounds["ls_hi"]))
    return (loss, it) if record_iters else loss


@partial(jax.jit, static_argnames=("kernel", "grid_shape", "rank"))
def _build_precond(u, grids, i0, w0, mask_, bounds, *,
                   kernel, grid_shape, rank):
    """Preconditioner at the current hyperparameters (value-only). Returns
    the orthonormal Nystrom form (Q, lam_n) - noise-independent and fixed
    for a whole training segment, so no factorization of any kind runs
    inside the loss (see ski.split_root)."""
    if rank == 0:
        Lp = jnp.zeros((i0.shape[0], 0), w0.dtype)
        return Lp, jnp.zeros((0,), w0.dtype)
    p = _constrain(u, bounds)
    kp = {"lengthscale": p["lengthscale"], "variance": p["variance"]}
    Lp = ski.kron_eig_root(kernel, kp, list(grids), grid_shape,
                           i0, w0, rank, mask=mask_)
    Qp, lam_n, _ = ski.split_root(Lp)
    return Qp, lam_n


@partial(jax.jit, static_argnames=(
    "kernel", "grid_shape", "cg_iters", "iterations", "sorted_corners",
    "record_iters"))
def _train_seg(u0, opt_state, Qp, lam_n, grids, idx, wgt, g0, y, mask_,
               bounds, lr, jitter, *, kernel, grid_shape, cg_iters,
               iterations, sorted_corners=False, record_iters=False):
    opt = optax.adam(learning_rate=lr)
    lf = partial(_loss, kernel=kernel, grid_shape=grid_shape,
                 cg_iters=cg_iters, sorted_corners=sorted_corners,
                 record_iters=record_iters)

    def step(carry, _):
        u, opt_state = carry
        if record_iters:
            (loss, cg_it), g = jax.value_and_grad(lf, has_aux=True)(
                u, grids, idx, wgt, Qp, lam_n, g0, y, mask_, bounds,
                jitter)
        else:
            loss, g = jax.value_and_grad(lf)(
                u, grids, idx, wgt, Qp, lam_n, g0, y, mask_, bounds,
                jitter)
        updates, opt_state = opt.update(g, opt_state, u)
        u = optax.apply_updates(u, updates)
        p = _constrain(u, bounds)
        rec = {"lengthscale": p["lengthscale"],
               "noise": p["noise"], "loss": loss}
        if record_iters:
            rec["cg_iters"] = cg_it
        return (u, opt_state), rec

    (u_final, opt_state), traj = jax.lax.scan(
        step, (u0, opt_state), None, length=iterations)
    return u_final, opt_state, traj


@partial(jax.jit, static_argnames=("kernel", "grid_shape", "cg_iters",
                                   "rank", "precond_rank", "mesh",
                                   "sorted_corners"))
def _predict(u, grids, idx, wgt, i0, w0, y, mask_, bounds, jitter,
             test_idx, test_wgt, t_i0, t_w0, key, *, kernel, grid_shape,
             cg_iters, rank, precond_rank, mesh=None, sorted_corners=False):
    predictor = ski.make_ski_predictor(
        kernel, list(grids), grid_shape, idx, wgt, i0, w0, mask_,
        cg_iters, rank, precond_rank=precond_rank, mesh=mesh,
        sorted_corners=sorted_corners)
    p = _constrain(u, bounds)
    yc = (y - p["mean"]) * mask_
    noise_pj = p["noise"] + jitter
    m = test_idx.shape[0]
    kss = jnp.full((m,), p["variance"], y.dtype)
    mean, var = predictor(
        {"lengthscale": p["lengthscale"], "variance": p["variance"]},
        noise_pj, yc, test_idx, test_wgt, t_i0, t_w0, kss, key)
    mean = mean + p["mean"]
    var = var + p["noise"]  # noiseless=False semantics
    return mean, var


class SKIEngine:
    """Holds the grid and interpolation tensors for one dataset (shapes are
    static per engine instance); the compiled programs are shared."""

    def __init__(self, kernel, X_pad, mask, grids, *,
                 cg_iters=64, n_probes=8, rank=100, precond_rank=None,
                 segment=10, seed=0):
        self.kernel = kernel
        self.grids_np = grids
        self.grid_shape = tuple(len(g) for g in grids)
        self.dtype = X_pad.dtype
        idx, wgt = ski.build_interp(X_pad, grids, mask)
        i0, w0 = ski.build_interp_sep(X_pad, grids)
        # Sort points by lower-corner flat index: every corner column
        # idx[:, s] becomes sorted at once (corner s = lower corner + a
        # constant stride offset), which halves the operator mvm on TPU
        # via sorted-scatter lowerings (see ski.ski_mvm sorted_corners).
        # The permutation is internal: train/predict permute y and mask
        # at entry, and all outputs (loss, trajectories, test-point
        # predictions) are order-invariant.
        perm = np.argsort(idx[:, 0], kind="stable")
        self._perm = perm
        self._permj = jnp.asarray(perm.astype(np.int32))
        self._idx = jnp.asarray(idx[perm])
        self._wgt = jnp.asarray(wgt[perm])
        self._i0 = jnp.asarray(i0[perm])
        self._w0 = jnp.asarray(w0[perm])
        self._mask = jnp.asarray(np.asarray(mask, X_pad.dtype)[perm])
        self._grids = tuple(jnp.asarray(g) for g in grids)
        self.cg_iters = int(min(cg_iters, X_pad.shape[0]))
        self.rank = int(min(rank, X_pad.shape[0]))
        n_pad = X_pad.shape[0]
        G = int(np.prod(self.grid_shape))
        if precond_rank is None:
            # the off-lattice basis is DENSE (n_pad, r) - unlike the
            # masked-grid engine's factored form its apply cost scales
            # with the rank, so the default stays at 512
            precond_rank = 512
        self.precond_rank = int(min(precond_rank, n_pad, G))
        self.segment = int(segment)
        rng = np.random.default_rng(seed)
        pm1 = np.asarray([-1.0, 1.0], X_pad.dtype)
        # probes of the SPLIT operator (z~ with E[z~ z~^T] = I; equivalently
        # z = P^1/2 z~ ~ N(0, P) - see ski.ski_mll). Rademacher probes have
        # lower Hutchinson variance than Gaussians.
        self._g0 = jnp.asarray(rng.choice(pm1, size=(n_pad, n_probes)))
        self._key = jax.random.PRNGKey(seed)

    def train(self, u0, y, mask_, bounds, lr, jitter, *, iterations):
        """Segmented Adam optimization (see module docstring). Returns
        (final params, full concatenated trajectory)."""
        u = u0
        y = jnp.asarray(y)[self._permj]
        mask_ = jnp.asarray(mask_)[self._permj]
        if int(iterations) <= 0:
            # predict-only flows may train for 0 iterations; the trajectory
            # contract is zero-length series, not a crash
            d = u0["lengthscale"].shape[0]
            zero = np.zeros((0,), self.dtype)
            return u, {"lengthscale": np.zeros((0, d), self.dtype),
                       "noise": zero, "loss": zero}
        from gpim_tpu.utils.hostio import fetch_tree
        opt_state = optax.adam(1.0).init(u0)   # adam state is lr-independent
        trajs = []
        remaining = int(iterations)
        # adaptive rebuild cadence driven by realized CG iterations - the
        # same economics as MaskedGridEngine.train (a rebuild pays for
        # itself in ~10 saved CG iterations; the static ramp let counts
        # climb between rebuilds exactly while hyperparameters moved)
        s_next = 2
        while remaining > 0:
            s = min(s_next, remaining)
            Qp, lam_n = _build_precond(
                u, self._grids, self._i0, self._w0, self._mask, bounds,
                kernel=self.kernel, grid_shape=self.grid_shape,
                rank=self.precond_rank)
            u, opt_state, traj = _train_seg(
                u, opt_state, Qp, lam_n, self._grids, self._idx, self._wgt,
                self._g0, y, mask_, bounds, lr, jitter,
                kernel=self.kernel, grid_shape=self.grid_shape,
                cg_iters=self.cg_iters, iterations=s,
                sorted_corners=True, record_iters=True)
            traj = fetch_tree(traj)
            last_it = float(traj["cg_iters"][-1])
            if last_it >= 16.0:
                s_next = max(2, s // 2)
            elif last_it <= 8.0:
                s_next = min(self.segment, s * 2)
            trajs.append(traj)
            remaining -= s
        full = {k: np.concatenate([np.asarray(t[k]) for t in trajs])
                for k in trajs[0]}
        full.pop("cg_iters", None)
        return u, full

    def predict(self, u, y, mask, bounds, jitter, Xtest_clean, mesh=None):
        """Host wrapper: builds test interpolation tensors then runs the
        jitted predictor over ALL test points at once (per-point cost is a
        2^d gather + rank-r dot, no chunking needed). With a mesh, test
        rows shard over its 'grid' axis."""
        Xt = np.asarray(Xtest_clean, self.dtype)
        t_idx, t_wgt = ski.build_interp(Xt, self.grids_np)
        t_i0, t_w0 = ski.build_interp_sep(Xt, self.grids_np)
        y = jnp.asarray(y)[self._permj]
        mask = jnp.asarray(mask)[self._permj]
        return _predict(
            u, self._grids, self._idx, self._wgt, self._i0, self._w0,
            y, mask, bounds, jitter,
            jnp.asarray(t_idx), jnp.asarray(t_wgt),
            jnp.asarray(t_i0), jnp.asarray(t_w0), self._key,
            kernel=self.kernel, grid_shape=self.grid_shape,
            cg_iters=self.cg_iters, rank=self.rank,
            precond_rank=self.precond_rank, mesh=mesh,
            sorted_corners=True)
