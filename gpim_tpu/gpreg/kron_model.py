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
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gpim_tpu.kernels.transforms import interval_forward, positive_forward
from gpim_tpu.ops import kron_exact
from gpim_tpu.ops.ski import grid_kernel_factors

__all__ = ["KronEngine"]

_PREDICT_CHUNK = 4096


class KronEngine:
    """Exact grid GP: one eigh per dim, closed-form MLL/gradients/predict."""

    def __init__(self, kernel, axes, dims, dtype):
        self.kernel = kernel
        self.dims = tuple(int(s) for s in dims)
        self.dtype = dtype
        self._axes = [jnp.asarray(a, dtype) for a in axes]

        def factors(p):
            kp = {"lengthscale": p["lengthscale"],
                  "variance": p["variance"]}
            return tuple(grid_kernel_factors(self.kernel, kp, self._axes))

        def loss_fn(u, Y, bounds, jitter):
            from gpim_tpu.kernels.transforms import interval_log_jacobian
            p = self._constrain(u, bounds)
            # interval-transform log-Jacobian MAP term: same objective as
            # the dense path (multi._iv_loss) and the SKI engine
            return (kron_exact.kron_nll(
                        factors(p), p["noise"] + jitter, Y - p["mean"])
                    - interval_log_jacobian(
                        u["lengthscale"], bounds["ls_lo"], bounds["ls_hi"]))

        @partial(jax.jit, static_argnames=("iterations",))
        def train(u0, Y, bounds, lr, jitter, *, iterations):
            opt = optax.adam(learning_rate=lr)
            opt_state = opt.init(u0)

            def step(carry, _):
                u, opt_state = carry
                loss, g = jax.value_and_grad(loss_fn)(u, Y, bounds, jitter)
                updates, opt_state = opt.update(g, opt_state, u)
                u = optax.apply_updates(u, updates)
                p = self._constrain(u, bounds)
                rec = {"lengthscale": p["lengthscale"],
                       "noise": p["noise"], "loss": loss}
                return (u, opt_state), rec

            (u_final, _), traj = jax.lax.scan(
                step, (u0, opt_state), None, length=iterations)
            return u_final, traj

        self.train = train

        @jax.jit
        def predict(u, Y, bounds, jitter, Xtest_chunks):
            p = self._constrain(u, bounds)
            fs = factors(p)
            d = len(self._axes)

            def cross(k):
                def e(xcol):
                    from gpim_tpu.kernels.functional import get_kernel_fn
                    kfn = get_kernel_fn(self.kernel)
                    ls = jnp.broadcast_to(p["lengthscale"], (d,))
                    pk = {"lengthscale": ls[k][None],
                          "variance": p["variance"] if k == 0 else 1.0}
                    return kfn(pk, xcol[:, None], self._axes[k][:, None])
                return e

            mean, var = kron_exact.kron_predict_chunks(
                fs, [cross(k) for k in range(d)], p["noise"] + jitter,
                Y - p["mean"], p["variance"], Xtest_chunks,
                noiseless=False)
            return mean + p["mean"], var

        self._predict_fn = predict

    @staticmethod
    def _constrain(u, bounds):
        return {
            "lengthscale": interval_forward(
                u["lengthscale"], bounds["ls_lo"], bounds["ls_hi"]),
            "variance": positive_forward(u["outputscale"]),
            "noise": positive_forward(u["noise"]),
            "mean": u["mean"],
        }

    def predict(self, u, Y, bounds, jitter, Xtest_clean):
        from gpim_tpu import dtypes
        from gpim_tpu.gpreg.engine import chunk_rows
        chunk = min(_PREDICT_CHUNK,
                    dtypes.round_up(max(len(Xtest_clean), 1), 128))
        chunks, n_test = chunk_rows(
            np.asarray(Xtest_clean, self.dtype), chunk)
        mean, var = self._predict_fn(
            u, Y, bounds, jitter, jnp.asarray(chunks))
        return np.asarray(mean)[:n_test], np.asarray(var)[:n_test]
