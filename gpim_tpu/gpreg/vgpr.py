"""
Multi-output ("vector-valued") GP reconstruction for 2D-4D grids.

API parity with the reference's ``gpim.gpreg.vgpr.vreconstructor``
(/root/reference/gpim/gpreg/vgpr.py:19-283): numpy-in/numpy-out, same
constructor signature, train/predict/run methods, NaN rows dropped when any
output channel is missing (gprutils.py:53-55 semantics).

TPU-native redesign (see gpim_tpu/gpreg/multi.py):
- ``independent=True`` (the EELS "parallel GP") = ONE vmapped program over
  output channels: batched Gram build + batched Cholesky on the MXU, instead
  of GPyTorch's batch_shape lazy tensors (reference vgpr.py:342-354). The
  task axis shards over a TPU mesh via gpim_tpu.parallel for many channels.
- ``independent=False`` = Kronecker multitask covariance K_x (x) B with
  low-rank-plus-diag task covariance B (reference vgpr.py:310-312): the task
  basis is rotated by eigh(B) so the nT x nT system decouples into T
  batched n x n Cholesky solves - O(T n^3), closed form.
- prediction returns the exact closed-form mean/sd; the reference
  Monte-Carlo's them from 100 posterior samples (vgpr.py:218-225). Pass
  ``n_samples`` to predict() to reproduce the sampled estimator.
"""

import time
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from gpim_tpu import dtypes
from gpim_tpu.gpreg import engine, multi
from gpim_tpu.kernels.transforms import interval_inverse, positive_inverse
from gpim_tpu.utils import gridutils

__all__ = ["vreconstructor"]

_PAD_BUCKET = 128
_PREDICT_CHUNK = 2048


class vreconstructor:
    """Multi-output GP regression for vector-valued 2D/3D/4D functions.

    Args mirror reference vgpr.py:72-147: X (c, N, M[, L, K]) grid indices,
    y (N, M[, L, K], d) observations with d output channels, Xtest prediction
    grid, kernel 'RBF'|'Matern52', lengthscale bounds, independent (per-
    channel GPs vs correlated Kronecker multitask), learning_rate,
    iterations, use_gpu (ignored), verbose, seed; kwargs: isotropic,
    precision, jitter, num_batches, task_rank (correlated mode, default 1),
    mesh (multi-chip opt-in for BOTH modes: True / int / Mesh with
    ('task', 'grid') axes - channels or decoupled rotated systems shard
    over 'task', prediction rows over 'grid').
    """

    def __init__(self,
                 X,
                 y,
                 Xtest=None,
                 kernel='RBF',
                 lengthscale=None,
                 independent=False,
                 learning_rate=.1,
                 iterations=50,
                 use_gpu=1,
                 verbose=1,
                 seed=0,
                 **kwargs):
        del use_gpu
        self.precision = kwargs.get("precision")
        self.dtype = dtypes.resolve_dtype(self.precision)
        self._prec_str = "single" if self.dtype == np.float32 else "double"
        self.verbose = verbose
        if kernel not in ("RBF", "Matern52"):
            # GPyTorch-parity surface (reference gpytorch_kernels.py:60-73;
            # vgpr models take RBF/Matern52 - RationalQuadratic is a
            # Pyro-path kernel and Spectral is skreconstructor-only)
            raise NotImplementedError(
                "Select one of the currently available kernels: "
                "RBF, Matern52")
        self.kernel_type = kernel
        self.independent = independent
        input_dim = np.ndim(y) - 1

        X_np, Y_np = gridutils.prepare_training_data(
            X, y, vector_valued=True, precision=self._prec_str)
        num_tasks = Y_np.shape[-1]
        self.num_tasks = num_tasks
        if Xtest is not None:
            self.fulldims = Xtest.shape[1:] + (num_tasks,)
            self.Xtest = gridutils.prepare_test_data(
                Xtest, precision=self._prec_str)
        else:
            self.fulldims = X.shape[1:] + (num_tasks,)
            self.Xtest = None

        isotropic = bool(kwargs.get("isotropic"))
        if lengthscale is None:
            lmean = float(np.mean(y.shape[:-1]) / 2)
            lengthscale = ([0.0, lmean] if isotropic
                           else [[0.0] * input_dim, [lmean] * input_dim])
        lo, hi = multi.broadcast_ls_bounds(
            lengthscale, input_dim, isotropic, self.dtype)
        self._bounds_np = {"ls_lo": lo, "ls_hi": hi}
        self.jitter = float(kwargs.get("jitter",
                                       dtypes.default_jitter(self.dtype)))
        self.learning_rate = learning_rate
        self.iterations = iterations
        self.num_batches = kwargs.get("num_batches", 1)

        ls_init = jnp.asarray(lo + 0.1 * (hi - lo))
        u_ls = interval_inverse(ls_init, jnp.asarray(lo), jnp.asarray(hi))
        one = jnp.asarray(1.0, self.dtype)
        if independent:
            self.u = {
                "lengthscale": jnp.tile(u_ls, (num_tasks, 1)),
                "outputscale": jnp.full((num_tasks,), positive_inverse(one)),
                "noise": jnp.full((num_tasks,), positive_inverse(one)),
                "mean": jnp.zeros((num_tasks,), self.dtype),
            }
        else:
            rank = int(kwargs.get("task_rank", 1))
            key = jax.random.PRNGKey(seed)
            F = 0.1 * jax.random.normal(
                key, (num_tasks, rank), dtype=self.dtype)
            self.u = {
                "lengthscale": u_ls,
                "noise": positive_inverse(one),
                "mean": jnp.zeros((num_tasks,), self.dtype),
                "F": F,
                "task_var": jnp.full((num_tasks,), positive_inverse(one)),
            }

        # opt-in multi-chip mesh (both modes): channels (independent) or
        # the T decoupled rotated systems (correlated) shard over the
        # 'task' axis, prediction rows over 'grid' (gpim_tpu/parallel).
        # mesh=True uses all devices; an int takes the first n; a
        # jax.sharding.Mesh with ('task', 'grid') axes is used as-is.
        self._mesh = None
        mesh_arg = kwargs.get("mesh")
        if mesh_arg is not None and mesh_arg is not False:
            from jax.sharding import Mesh
            from gpim_tpu.parallel import multichip
            if isinstance(mesh_arg, Mesh):
                self._mesh = mesh_arg
            else:
                n_dev = None if mesh_arg is True else int(mesh_arg)
                self._mesh = multichip.make_mesh_2d(n_dev)
            t_ax = self._mesh.shape["task"]
            if num_tasks % t_ax:
                warnings.warn(
                    "num_tasks (%d) not divisible by mesh task axis "
                    "(%d); running unsharded" % (num_tasks, t_ax),
                    UserWarning)
                self._mesh = None

        self._set_data(X_np, Y_np)
        self.hyperparams = {}
        self._traj_list = []

    def _set_data(self, X_np, Y_np):
        self.X, self.y = X_np, Y_np
        if self.independent:
            Xp, n = engine.pad_rows(X_np, _PAD_BUCKET)
            Yp, _ = engine.pad_rows(Y_np, _PAD_BUCKET)
            mask = np.zeros(len(Xp), self.dtype)
            mask[:n] = 1.0
            self._Xd, self._Yd = jnp.asarray(Xp), jnp.asarray(Yp)
            self._maskd = jnp.asarray(mask)
        else:
            # the Kronecker rotation handles no padding; shapes are static
            # per dataset and vgpr is not used inside growing BO loops
            self._Xd, self._Yd = jnp.asarray(X_np), jnp.asarray(Y_np)
            self._maskd = None

    def _bounds(self):
        # memoized on dict identity (rebound by load_state) - see gpr._bounds
        if getattr(self, "_bounds_dev_src", None) is not self._bounds_np:
            self._bounds_dev = {k: jnp.asarray(v)
                                for k, v in self._bounds_np.items()}
            self._bounds_dev_src = self._bounds_np
        return self._bounds_dev

    # ------------------------------------------------------------------

    def train(self, **kwargs):
        if kwargs.get("learning_rate") is not None:
            self.learning_rate = kwargs.get("learning_rate")
        if kwargs.get("iterations") is not None:
            self.iterations = kwargs.get("iterations")
        if kwargs.get("verbose") is not None:
            self.verbose = kwargs.get("verbose")
        start = time.time()
        if self.verbose:
            print('Model training...')
        lr = jnp.asarray(self.learning_rate, self.dtype)
        jit = jnp.asarray(self.jitter, self.dtype)
        if self.independent:
            if self._mesh is not None:
                from gpim_tpu.parallel import multichip
                u_sh, X_sh, Y_sh, m_sh = multichip.shard_multitask(
                    self.u, self._Xd, self._Yd, self._maskd, self._mesh)
                with self._mesh:
                    self.u, traj = multi.train_independent(
                        u_sh, X_sh, Y_sh, m_sh, self._bounds(),
                        lr, jit, kernel=self.kernel_type,
                        iterations=int(self.iterations))
            else:
                self.u, traj = multi.train_independent(
                    self.u, self._Xd, self._Yd, self._maskd, self._bounds(),
                    lr, jit, kernel=self.kernel_type,
                    iterations=int(self.iterations))
        else:
            if self._mesh is not None:
                with self._mesh:
                    self.u, traj = multi.train_correlated(
                        self.u, self._Xd, self._Yd, self._bounds(),
                        lr, jit, kernel=self.kernel_type,
                        iterations=int(self.iterations), mesh=self._mesh)
            else:
                self.u, traj = multi.train_correlated(
                    self.u, self._Xd, self._Yd, self._bounds(),
                    lr, jit, kernel=self.kernel_type,
                    iterations=int(self.iterations))
        from gpim_tpu.utils.hostio import fetch_tree
        traj = fetch_tree(traj)   # ONE host round trip for all keys
        self._traj_list.append(traj)
        keys = [k for k in traj if k != "loss"]
        self.hyperparams = {
            k: np.concatenate([t[k] for t in self._traj_list])
            for k in keys}
        self.losses = np.concatenate(
            [t["loss"] for t in self._traj_list])
        if self.verbose:
            print('training completed in {} s'.format(
                np.round(time.time() - start, 2)))
            print('Final parameter values:\n',
                  'lengthscale: {}'.format(
                      np.around(self.hyperparams["lengthscale"][-1], 4)))
        return

    def predict(self, Xtest=None, **kwargs):
        """Closed-form predictive mean and sd of shape fulldims
        (= grid dims + (num_tasks,)). Pass ``n_samples`` to use the
        reference's Monte-Carlo estimator instead (vgpr.py:218-225)."""
        if Xtest is None and self.Xtest is None:
            warnings.warn(
                "No test data provided. Using training data for prediction",
                UserWarning)
            self.Xtest = self.X
            self.fulldims = (len(self.X), self.num_tasks)
        elif Xtest is not None:
            self.Xtest = gridutils.prepare_test_data(
                Xtest, precision=self._prec_str)
            self.fulldims = Xtest.shape[1:] + (self.num_tasks,)
        if kwargs.get("verbose") is not None:
            self.verbose = kwargs.get("verbose")
        if kwargs.get("num_batches") is not None:
            self.num_batches = kwargs.get("num_batches")
        if self.verbose:
            print('Calculating predictive mean and uncertainty...')
        nan_rows = np.isnan(self.Xtest).any(axis=1)
        Xtest_clean = np.nan_to_num(self.Xtest)
        # num_batches > 1 maps the reference's manual test-grid splitting
        # (vgpr.py:247-264) onto the lax.map tile size
        nb = max(1, int(self.num_batches))
        target = -(-len(self.Xtest) // nb) if nb > 1 else _PREDICT_CHUNK
        chunk = min(dtypes.round_up(max(target, 1), 128),
                    dtypes.round_up(len(self.Xtest), 128))
        chunks, n_test = engine.chunk_rows(Xtest_clean, chunk)
        jit = jnp.asarray(self.jitter, self.dtype)
        if self._mesh is not None:
            # shard (or warn-and-replicate, when the tile rows do not
            # divide the 'grid' axis) via the one canonical implementation
            from gpim_tpu.parallel import mesh as mesh_mod
            chunks_d = mesh_mod.shard_chunk_rows(chunks, self._mesh)
        else:
            chunks_d = jnp.asarray(chunks)
        if self.independent:
            if self._mesh is not None:
                with self._mesh:
                    mean, var = multi.predict_independent(
                        self.u, self._Xd, self._Yd, self._maskd,
                        self._bounds(), jit, chunks_d,
                        kernel=self.kernel_type)
            else:
                mean, var = multi.predict_independent(
                    self.u, self._Xd, self._Yd, self._maskd, self._bounds(),
                    jit, chunks_d, kernel=self.kernel_type)
        else:
            if self._mesh is not None:
                with self._mesh:
                    mean, var = multi.predict_correlated(
                        self.u, self._Xd, self._Yd, self._bounds(),
                        jit, chunks_d, kernel=self.kernel_type,
                        mesh=self._mesh)
            else:
                mean, var = multi.predict_correlated(
                    self.u, self._Xd, self._Yd, self._bounds(),
                    jit, chunks_d, kernel=self.kernel_type)
        from gpim_tpu.utils.hostio import fetch_tree
        mean, var = fetch_tree((mean, var))   # one fetch, not two
        mean = mean[:n_test]
        var = var[:n_test]
        n_samples = kwargs.get("n_samples")
        if n_samples:
            # API-parity MC estimator of the same closed-form posterior
            rng = np.random.default_rng(0)
            samples = rng.normal(
                mean, np.sqrt(var), (int(n_samples),) + mean.shape)
            mean = samples.mean(0)
            var = samples.var(0)
        mean[nan_rows] = np.nan
        var[nan_rows] = np.nan
        sd = np.sqrt(var)
        if self.verbose:
            print("Done")
        return mean.reshape(self.fulldims), sd.reshape(self.fulldims)

    def run(self):
        """Train, then predict. Returns (mean, sd, hyperparams)."""
        self.train()
        mean, sd = self.predict()
        return mean, sd, self.hyperparams

    def save_model(self, filename):
        """Persist trained hyperparameters (unconstrained pytree + bounds)
        to an .npz; restore with load_model on a compatibly-constructed
        vreconstructor (same kernel / independent mode / task count -
        same contract as reconstructor.save_model)."""
        flat = {("u_" + k): np.asarray(v) for k, v in self.u.items()}
        flat.update({("b_" + k): np.asarray(v)
                     for k, v in self._bounds_np.items()})
        flat["kernel"] = np.asarray(self.kernel_type)
        flat["independent"] = np.asarray(bool(self.independent))
        np.savez(filename, **flat)

    def load_model(self, filename):
        """Restore hyperparameters saved by save_model."""
        data = np.load(filename if str(filename).endswith(".npz")
                       else str(filename) + ".npz", allow_pickle=False)
        if (str(data["kernel"]) != self.kernel_type
                or bool(data["independent"]) != bool(self.independent)):
            raise ValueError(
                "checkpoint was written by a different model configuration")
        u = {k[2:]: jnp.asarray(v, self.dtype) for k, v in data.items()
             if k.startswith("u_")}
        if set(u) != set(self.u) or any(
                u[k].shape != jnp.shape(self.u[k]) for k in u):
            raise ValueError(
                "checkpoint was written by a different model configuration")
        self.u = u
        self._bounds_np = {k[2:]: np.asarray(v, self.dtype)
                           for k, v in data.items() if k.startswith("b_")}
