"""
Exact Kronecker GP model layer for full-grid training data.

Ties gpim_tpu/ops/kron_exact.py into the same train/predict programs and
parameter semantics as the SKI and dense skreconstructor paths (constant
mean + outputscale + interval lengthscales + positive noise; GPyTorch
skgprmodel parity, reference skgpr.py:399-448). Selected automatically by
``skreconstructor`` when the training observations cover a full Cartesian
grid with no NaNs - the exact regime GPyTorch's GridInterpolationKernel
targets approximately (reference skgpr.py:436-440), solved here in closed
form with per-dim eigendecompositions.

The jitted programs are module-level (static over kernel name / iteration
count, with the per-dim grid axes passed as array arguments), so constructing
a fresh model for the same problem shape reuses the compiled executables
instead of re-tracing per instance.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gpim_tpu.kernels.transforms import interval_log_jacobian
from gpim_tpu.ops import kron_exact
from gpim_tpu.ops.ski import grid_kernel_factors

__all__ = ["KronEngine"]

_PREDICT_CHUNK = 4096


# GPyTorch-parity parameter mapping, shared with the dense and SKI paths
# (multi._constrain_task) so checkpoints/trajectories stay compatible
from gpim_tpu.gpreg.multi import _constrain_task as _constrain  # noqa: E402


def _factors(kernel, p, axes):
    kp = {"lengthscale": p["lengthscale"], "variance": p["variance"]}
    return tuple(grid_kernel_factors(kernel, kp, list(axes)))


def _loss(u, axes, Y, bounds, jitter, *, kernel):
    p = _constrain(u, bounds)
    # interval-transform log-Jacobian MAP term: same objective as the dense
    # path (multi._iv_loss) and the SKI engine
    return (kron_exact.kron_nll(
                _factors(kernel, p, axes), p["noise"] + jitter,
                Y - p["mean"])
            - interval_log_jacobian(
                u["lengthscale"], bounds["ls_lo"], bounds["ls_hi"]))


@partial(jax.jit, static_argnames=("kernel", "iterations"))
def _train(u0, axes, Y, bounds, lr, jitter, *, kernel, iterations):
    opt = optax.adam(learning_rate=lr)
    opt_state = opt.init(u0)

    def step(carry, _):
        u, opt_state = carry
        loss, g = jax.value_and_grad(
            partial(_loss, kernel=kernel))(u, axes, Y, bounds, jitter)
        updates, opt_state = opt.update(g, opt_state, u)
        u = optax.apply_updates(u, updates)
        p = _constrain(u, bounds)
        rec = {"lengthscale": p["lengthscale"],
               "noise": p["noise"], "loss": loss}
        return (u, opt_state), rec

    (u_final, _), traj = jax.lax.scan(
        step, (u0, opt_state), None, length=iterations)
    return u_final, traj


@partial(jax.jit, static_argnames=("kernel",))
def _predict(u, axes, Y, bounds, jitter, Xtest_chunks, *, kernel):
    from gpim_tpu.kernels.functional import get_kernel_fn
    p = _constrain(u, bounds)
    fs = _factors(kernel, p, axes)
    d = len(axes)
    kfn = get_kernel_fn(kernel)
    ls = jnp.broadcast_to(p["lengthscale"], (d,))

    def cross(k):
        def e(xcol):
            pk = {"lengthscale": ls[k][None],
                  "variance": p["variance"] if k == 0 else 1.0}
            return kfn(pk, xcol[:, None], axes[k][:, None])
        return e

    mean, var = kron_exact.kron_predict_chunks(
        fs, [cross(k) for k in range(d)], p["noise"] + jitter,
        Y - p["mean"], p["variance"], Xtest_chunks, noiseless=False)
    return mean + p["mean"], var


class KronEngine:
    """Exact grid GP: one eigh per dim, closed-form MLL/gradients/predict."""

    def __init__(self, kernel, axes, dims, dtype):
        self.kernel = kernel
        self.dims = tuple(int(s) for s in dims)
        self.dtype = dtype
        self._axes = tuple(jnp.asarray(a, dtype) for a in axes)

    def train(self, u0, Y, bounds, lr, jitter, *, iterations):
        return _train(u0, self._axes, Y, bounds, lr, jitter,
                      kernel=self.kernel, iterations=iterations)

    def predict(self, u, Y, bounds, jitter, Xtest_clean, mesh=None):
        from gpim_tpu import dtypes
        from gpim_tpu.gpreg.engine import chunk_rows
        chunk = min(_PREDICT_CHUNK,
                    dtypes.round_up(max(len(Xtest_clean), 1), 128))
        chunks, n_test = chunk_rows(
            np.asarray(Xtest_clean, self.dtype), chunk)
        chunks_d = jnp.asarray(chunks)
        axes, u_, Y_ = self._axes, u, Y
        if mesh is not None:
            # test tiles shard over 'grid'; the (tiny) eigendecomposed
            # training state replicates next to them
            from gpim_tpu.parallel import mesh as meshmod
            chunks_d = meshmod.shard_chunk_rows(chunks_d, mesh)
            axes, u_, Y_ = meshmod.replicate((axes, u, Y), mesh)
        mean, var = _predict(
            u_, axes, Y_, bounds, jitter, chunks_d,
            kernel=self.kernel)
        from gpim_tpu.utils.hostio import fetch_tree
        mean, var = fetch_tree((mean, var))   # one writable fetch, not two
        return mean[:n_test], var[:n_test]
