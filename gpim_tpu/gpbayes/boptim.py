"""
GP-based Bayesian optimization loop for automated experiments.

Behavioral parity with reference gpim/gpbayes/boptim.py:22-485: the same
exploration-exploitation driver around a GP surrogate -
train surrogate -> evaluate acquisition over the full grid -> select next
point(s) under revisit-avoidance / gamma-decayed distance-memory constraints
-> evaluate the target (real instrument callback, simulated lookup, or
analytic function) -> update the posterior -> checkpoint.

The surrogate is gpim_tpu's jit-compiled ``reconstructor``; because training
data is padded to static buckets (engine.pad_rows), adding one measurement
per step almost never triggers an XLA recompile. The outer loop, KD-style
distance suppression, and memory filters are host-side control logic, exactly
as in the reference.
"""

import copy
import os
import types
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from gpim_tpu.gpbayes import acqfunc
from gpim_tpu.gpreg import engine, gpr
from gpim_tpu.native import spatial
from gpim_tpu.utils import gridutils
from gpim_tpu.utils.hostio import fetch_tree

__all__ = ["boptimizer"]


@partial(jax.jit, static_argnames=(
    "kernel", "iterations", "sparse", "acq_kind", "k"))
def _device_bo_step(u0, Xd, yd, maskd, bounds, lr, jitter, chunks,
                    obs_mask, sel_mask, alpha, beta, xi, *,
                    kernel, iterations, sparse, acq_kind, k):
    """One fused retrain -> predict -> acquisition -> top-k program.

    The reference's hot loop (boptim.py:459-470) pays a device->host round
    trip per phase (trajectory fetch after retrain, dense mean/sd fetch for
    the acquisition, host argsort); through the axon tunnel each fetch has a
    ~25 ms RPC floor, which caps the loop at ~11 steps/s no matter how fast
    the GP math is. Fusing the whole step into ONE jitted program and
    returning only the top-k candidate (value, flat-index) pairs — plus the
    final lengthscale for batch spacing — leaves exactly one small fetch per
    exploration step. The full-grid mean/sd and the hyperparameter
    trajectory stay device-resident (materialized lazily at save time).

    ``sel_mask`` folds the user's acquisition mask (reference
    boptim.py:303-315 semantics: acq is multiplied by the mask, NaNs are
    dropped from the ranking) together with the test-grid padding validity;
    ``obs_mask`` marks observed grid points for the EI/POI incumbent.
    """
    u, traj = engine.train(u0, Xd, yd, maskd, bounds, lr, jitter,
                           kernel=kernel, iterations=iterations,
                           sparse=sparse)
    predict_fn = engine.predict_vfe if sparse else engine.predict_exact
    mean, var = predict_fn(u, Xd, yd, maskd, bounds, jitter, chunks,
                           kernel=kernel, noiseless=False)
    sd = jnp.sqrt(var)
    if acq_kind == "cb":
        acq = alpha * mean + beta * sd
    else:
        best = jnp.max(jnp.where(obs_mask, mean, -jnp.inf))
        z = (mean - best - xi) / sd
        if acq_kind == "ei":
            acq = ((mean - best - xi) * jax.scipy.stats.norm.cdf(z)
                   + sd * jax.scipy.stats.norm.pdf(z))
        else:
            acq = jax.scipy.stats.norm.cdf(z)
    macq = sel_mask * acq
    neg_inf = jnp.asarray(-jnp.inf, macq.dtype)
    macq = jnp.where(jnp.isnan(macq) | (sel_mask == 0), neg_inf, macq)
    vals, order = jax.lax.top_k(macq, k)
    # indices as floats so the whole candidate fetch packs into one
    # same-dtype buffer (hostio.fetch_tree); exact for any real grid size
    small = (vals, order.astype(vals.dtype),
             traj["lengthscale"][-1].reshape(-1))
    return u, traj, mean, sd, small


def _atomic_save(filename, obj, allow_pickle=False):
    """np.save via temp-file + os.replace: a crash mid-write must never
    truncate the only resume state of a long-running experiment."""
    tmp = str(filename) + ".tmp"
    with open(tmp, "wb") as f:
        np.save(f, obj, allow_pickle=allow_pickle)
    os.replace(tmp, str(filename))


class boptimizer:
    """Bayesian optimizer selecting next measurement point(s) on a grid.

    Constructor signature and kwargs mirror reference boptim.py:167-237:
    X_seed/y_seed (sparse seed with NaNs), X_full (dense grid),
    target_function, acquisition_function ('cb'|'ei'|'poi'|callable),
    exploration_steps, batch_size, batch_update, kernel, lengthscale,
    sparse/indpoints, gp_iterations, seed, and kwargs: alpha, beta, xi,
    use_gpu (ignored), precision, jitter, isotropic, mask, dscale,
    batch_dscale, batch_out_max, gamma, memory, exit_strategy, extent,
    simulate_measurement, y_true, save_checkpoints, filename, verbose,
    learning_rate, mesh (multi-chip opt-in, forwarded to the surrogate
    reconstructor: acquisition evaluates the surrogate over the FULL grid
    every step, and that dense prediction shards over the mesh's 'grid'
    axis), refit_iterations (per-step retrain budget AFTER the first full
    ``gp_iterations`` train; defaults to gp_iterations // 4. Each step's
    retrain continues from the previous step's parameters - one new
    measurement barely moves the optimum, so the reference's
    full-budget-from-scratch retrain (boptim.py:459-470) spends ~4x the
    steps converging to the same hyperparameters; pass
    refit_iterations=gp_iterations to reproduce the reference schedule).
    """

    def __init__(self,
                 X_seed,
                 y_seed,
                 X_full,
                 target_function,
                 acquisition_function='cb',
                 exploration_steps=10,
                 batch_size=100,
                 batch_update=False,
                 kernel='RBF',
                 lengthscale=None,
                 sparse=False,
                 indpoints=None,
                 gp_iterations=1000,
                 seed=0,
                 **kwargs):
        self.verbose = kwargs.get("verbose", 1)
        learning_rate = kwargs.get("learning_rate", 5e-2)
        jitter = kwargs.get("jitter", 1.0e-6)
        isotropic = kwargs.get("isotropic", False)
        self.precision = kwargs.get("precision")

        self.surrogate_model = gpr.reconstructor(
            X_seed, y_seed, X_full, kernel, lengthscale, sparse, indpoints,
            learning_rate, gp_iterations, False, self.verbose, seed,
            isotropic=isotropic, precision=self.precision, jitter=jitter,
            mesh=kwargs.get("mesh"))

        self.X_sparse = X_seed.copy()
        self.y_sparse = y_seed.copy()
        self.X_full = X_full

        self.target_function = target_function
        self.acquisition_function = acquisition_function
        self.exploration_steps = exploration_steps
        self.batch_update = batch_update
        self.batch_size = batch_size
        self.simulate_measurement = kwargs.get("simulate_measurement", False)
        if self.simulate_measurement:
            self.y_true = kwargs.get("y_true")
            if self.y_true is None:
                raise AssertionError(
                    "To simulate measurements, add ground truth ('y_true)")
        self.extent = kwargs.get("extent", None)
        self.alpha = kwargs.get("alpha", 0)
        self.beta = kwargs.get("beta", 1)
        self.xi = kwargs.get("xi", 0.01)
        self.dscale = kwargs.get("dscale", None)
        self.batch_dscale = kwargs.get("batch_dscale", None)
        self.batch_out_max = kwargs.get("batch_out_max", 10)
        self.gamma = kwargs.get("gamma", 0.8)
        self.points_mem = kwargs.get("memory", 10)
        self.exit_strategy = kwargs.get("exit_strategy", 1)
        self.mask = kwargs.get("mask", None)
        refit = kwargs.get("refit_iterations")
        self.refit_iterations = (max(1, int(gp_iterations) // 4)
                                 if refit is None else int(refit))
        self.save_checkpoints = kwargs.get("save_checkpoints", False)
        self.filename = kwargs.get("filename", "./boptim_results")
        self._rng = np.random.RandomState(seed)
        self.indices_all, self.vals_all = [], []
        self.target_func_vals, self.gp_predictions = [y_seed.copy()], []
        self.steps_done = 0

        # one-fetch fast path (see _device_bo_step): precompute the static
        # device-side test-grid chunks and the selection mask once
        self._fulldims = X_full.shape[1:]
        m = self.surrogate_model
        Xt = m.Xtest                       # prepared (n, d), NaN-free grid
        self._n_test = len(Xt)
        from gpim_tpu import dtypes
        chunk = min(4096, dtypes.round_up(self._n_test, 128))
        chunks, _ = engine.chunk_rows(np.nan_to_num(Xt), chunk)
        self._chunks_d = jnp.asarray(chunks)
        n_flat = int(np.prod(chunks.shape[:2]))
        sel = np.zeros(n_flat, m.dtype)
        if self.mask is None:
            sel[:self._n_test] = 1.0
        else:
            sel[:self._n_test] = np.asarray(
                self.mask, m.dtype).ravel()[:self._n_test]
        self._sel_mask_d = jnp.asarray(sel)
        # per-step scalar constants, uploaded once (each jnp.asarray in the
        # hot loop is a fresh tunnel transfer); refreshed if mutated
        self._lr_host = float(m.learning_rate)
        self._lr_d = jnp.asarray(self._lr_host, m.dtype)
        self._jitter_d = jnp.asarray(m.jitter, m.dtype)
        self._n_flat = n_flat

    # ------------------------------------------------------------------

    def update_posterior(self):
        """Swap in the grown training set and retrain the surrogate,
        warm-starting from the current parameters with the (reduced)
        per-step budget (reference boptim.py:239-251; see class docstring
        for the refit_iterations rationale)."""
        self.surrogate_model.update_data(self.X_sparse, self.y_sparse)
        self.surrogate_model.train(verbose=self.verbose,
                                   iterations=self.refit_iterations)

    def evaluate_function(self, indices, y_measured=None):
        """Evaluate the target at the selected grid indices
        (simulated lookup / measured array / instrument callback with
        optional extent offsetting, reference boptim.py:253-276)."""
        indices = [indices] if not self.batch_update else indices
        if self.simulate_measurement:
            for idx in indices:
                self.y_sparse[tuple(idx)] = self.y_true[tuple(idx)]
        elif y_measured is not None:
            for idx in indices:
                self.y_sparse[tuple(idx)] = y_measured[tuple(idx)]
        else:
            for idx in indices:
                if self.extent is not None:
                    _idx = tuple(i + e[0] for i, e in zip(idx, self.extent))
                else:
                    _idx = tuple(idx)
                self.y_sparse[tuple(idx)] = self.target_function(_idx)
        self.X_sparse = gridutils.get_sparse_grid(self.y_sparse, self.extent)
        self.target_func_vals.append(self.y_sparse.copy())

    def next_point(self):
        """Acquisition evaluation over the full grid and candidate ranking
        (reference boptim.py:278-324, incl. NaN-mask support)."""
        if self.verbose:
            print("Computing acquisition function...")
        if self.acquisition_function == 'cb':
            acq, pred = acqfunc.confidence_bound(
                self.surrogate_model, self.X_full,
                alpha=self.alpha, beta=self.beta)
        elif self.acquisition_function == 'ei':
            acq, pred = acqfunc.expected_improvement(
                self.surrogate_model, self.X_full,
                self.X_sparse, xi=self.xi)
        elif self.acquisition_function == 'poi':
            acq, pred = acqfunc.probability_of_improvement(
                self.surrogate_model, self.X_full,
                self.X_sparse, xi=self.xi)
        elif isinstance(self.acquisition_function, types.FunctionType):
            acq, pred = self.acquisition_function(
                self.surrogate_model, self.X_full, self.X_sparse)
        else:
            raise NotImplementedError(
                "Choose between 'cb', 'ei', and 'poi' acquisition functions "
                "or define your own")
        self.gp_predictions.append(pred)
        if self.mask is None:
            order = np.argsort(acq.ravel())[::-1][:self.batch_size]
            vals_list = acq.ravel()[order].tolist()
            indices_list = np.stack(
                np.unravel_index(order, acq.shape), axis=-1).tolist()
        else:
            macq = (self.mask * acq).ravel()
            order = np.argsort(macq)[::-1]
            vals = macq[order]
            valid = ~np.isnan(vals)
            order, vals = order[valid], vals[valid]
            vals_list = vals[:self.batch_size].tolist()
            indices_list = np.stack(
                np.unravel_index(order[:self.batch_size], acq.shape),
                axis=-1).tolist()
        if not self.batch_update:
            return vals_list, indices_list
        if self.batch_dscale is None:
            ls_traj = self.surrogate_model.hyperparams.get("lengthscale")
            if ls_traj is not None and len(ls_traj):
                batch_dscale_ = float(np.mean(ls_traj[-1]))
            else:
                # no trajectory yet (e.g. a run resumed from a checkpoint,
                # which restores parameters but not the training history):
                # read the lengthscale off the current surrogate parameters
                batch_dscale_ = float(np.mean(np.asarray(
                    self.surrogate_model.current_lengthscale())))
        else:
            batch_dscale_ = self.batch_dscale
        return self.update_points(vals_list, indices_list, batch_dscale_)

    def _fused_ok(self):
        """The one-fetch device path covers the three named acquisition
        functions on a standard (non-super-resolved) full grid; custom
        callables and mismatched grids take the legacy host path."""
        return (self.acquisition_function in ("cb", "ei", "poi")
                and self._n_test == int(np.prod(np.shape(self.y_sparse))))

    def _fused_step(self, iterations):
        """Retrain + acquisition + top-k in one device program, one fetch.

        Returns (vals_list, indices_list, mean_lengthscale) with the same
        candidate-ranking semantics as next_point (reference
        boptim.py:278-324); the dense mean/sd prediction is appended to
        gp_predictions as device arrays and materialized at save time.
        """
        m = self.surrogate_model
        obs = np.zeros(self._n_flat, bool)
        obs[:self._n_test] = ~np.isnan(
            np.asarray(self.y_sparse).ravel())
        u, Xd, yd, maskd = m.u, m._Xd, m._yd, m._maskd
        chunks_d = self._chunks_d
        if m._mesh is not None:
            from gpim_tpu.parallel import mesh as meshmod
            chunks_d = meshmod.shard_chunk_rows(chunks_d, m._mesh)
            u, Xd, yd, maskd = meshmod.replicate(
                (u, Xd, yd, maskd), m._mesh)
        if float(m.learning_rate) != self._lr_host:
            self._lr_host = float(m.learning_rate)
            self._lr_d = jnp.asarray(self._lr_host, m.dtype)
        u_new, traj, mean, sd, small = _device_bo_step(
            u, Xd, yd, maskd, m._bounds(),
            self._lr_d, self._jitter_d, chunks_d,
            jnp.asarray(obs), self._sel_mask_d,
            float(self.alpha), float(self.beta), float(self.xi),
            kernel=m.kernel_type, iterations=int(iterations),
            sparse=m.do_sparse, acq_kind=self.acquisition_function,
            k=int(min(self.batch_size, self._n_flat)))
        m.u = u_new
        m._traj_list.append(traj)          # device-resident until assembled
        self.gp_predictions.append((mean, sd))
        vals, order_f, ls_last = fetch_tree(small)   # THE one fetch
        valid = np.isfinite(vals)
        vals, order = vals[valid], order_f[valid].astype(np.int64)
        vals_list = vals.tolist()
        indices_list = np.stack(
            np.unravel_index(order, self._fulldims), axis=-1).tolist()
        return vals_list, indices_list, float(np.mean(ls_last))

    def _materialize(self):
        """Fetch device-resident BO state accumulated by the fused path:
        gp_predictions become host (fulldims) arrays and the surrogate's
        trajectory segments are assembled into its hyperparams dict."""
        dims, n = self._fulldims, self._n_test
        dev_idx = [i for i, p in enumerate(self.gp_predictions)
                   if isinstance(p[0], jax.Array)]
        if dev_idx:
            fetched = fetch_tree([self.gp_predictions[i] for i in dev_idx])
            for i, (mean, sd) in zip(dev_idx, fetched):
                self.gp_predictions[i] = (mean[:n].reshape(dims),
                                          sd[:n].reshape(dims))
        m = self.surrogate_model
        if any(isinstance(next(iter(t.values())), jax.Array)
               for t in m._traj_list):
            m._traj_list = fetch_tree(m._traj_list)
            m._assemble_hyperparams()

    def update_points(self, acqfunc_values, indices, dscale):
        """Lengthscale-spaced batch selection: greedy suppression of
        candidates within ``dscale`` of each accepted point, random fill-up
        to ``batch_out_max`` (reference boptim.py:326-376)."""
        ind, val = self.checkvalues(indices, acqfunc_values)
        start = int(np.where(np.asarray(acqfunc_values) == val)[0][0])
        vals = np.asarray(acqfunc_values)[start:]
        pts = np.vstack(indices)[start:]
        # candidates are already in descending acquisition order
        sel = spatial.spaced_batch(pts, dscale, self.batch_out_max)
        max_val_all = vals[sel].tolist()
        indices_ = pts[sel].tolist()
        if len(indices_) < self.batch_out_max:
            n_fill = self.batch_out_max - len(indices_)
            if self.verbose == 2:
                print("Adding {} random indices".format(n_fill))
            idx_random = self._rng.randint(0, len(vals), n_fill)
            indices_.extend(pts[idx_random].tolist())
            max_val_all.extend(vals[idx_random].tolist())
        return max_val_all, indices_

    def checkvalues(self, idx_list, val_list):
        """Revisit-avoidance + gamma-decayed short-term distance memory:
        skip candidates already measured or closer than dscale*gamma^i to the
        i-th most recent query (reference boptim.py:378-429)."""
        dscale_ = 0 if self.dscale is None else self.dscale

        def too_close(idx):
            idx_prev = self.indices_all[-self.points_mem:]
            d_all = [np.linalg.norm(np.asarray(idx) - np.asarray(i))
                     for i in idx_prev]
            thresholds = [dscale_ * self.gamma ** i
                          for i in range(len(idx_prev))]
            # most recent point gets the largest exclusion radius
            return any(d <= t for d, t in zip(d_all[::-1], thresholds))

        _idx = 0
        if self.verbose == 2:
            print('Acquisition function max value {} at {}'.format(
                val_list[_idx], idx_list[_idx]))
        if len(self.indices_all) == 0:
            return idx_list[_idx], val_list[_idx]
        while (idx_list[_idx] in self.indices_all
               or too_close(idx_list[_idx])):
            if self.verbose == 2:
                print("Finding the next max point...")
            _idx += 1
            if _idx == len(idx_list):
                _idx = (self._rng.randint(0, len(idx_list))
                        if self.exit_strategy else -1)
                if self.verbose == 2:
                    print('Index out of list. Exiting with acquisition '
                          'function value {} at {}'.format(
                              val_list[_idx], idx_list[_idx]))
                break
            if self.verbose == 2:
                print('Acquisition function max value {} at {}'.format(
                    val_list[_idx], idx_list[_idx]))
        return idx_list[_idx], val_list[_idx]

    # ------------------------------------------------------------------

    def single_step(self, e):
        """One explore-measure-update cycle (reference boptim.py:431-457).

        On the fused path the posterior update for measurement e happens at
        the START of step e+1's device program (retrain -> acquire is one
        jit call, one fetch) instead of at the end of step e - the same
        train-on-the-same-data schedule, moved across the step boundary;
        run() adds the reference's trailing post-measurement retrain.
        """
        if self.verbose:
            print("\nExploration step {} / {}".format(
                e + 1, self.exploration_steps))
        if self._fused_ok():
            iters = (self.surrogate_model.iterations if e == 0
                     else self.refit_iterations)
            self.surrogate_model.update_data(self.X_sparse, self.y_sparse)
            vals, inds, lscale = self._fused_step(iters)
            if self.batch_update:
                bd = (self.batch_dscale if self.batch_dscale is not None
                      else lscale)
                vals, inds = self.update_points(vals, inds, bd)
            else:
                inds, vals = self.checkvalues(inds, vals)
            self.evaluate_function(inds)
        else:
            if e == 0:
                self.surrogate_model.train()
            vals, inds = self.next_point()
            if not self.batch_update:
                inds, vals = self.checkvalues(inds, vals)
            self.evaluate_function(inds)
            self.update_posterior()
        if isinstance(vals, float):
            self.indices_all.append(inds)
            self.vals_all.append(vals)
        else:
            self.indices_all.extend(inds)
            self.vals_all.extend(vals)

    def run(self):
        """Run the exploration loop (resumable - continues from steps_done
        after load_checkpoint) with optional per-step checkpoints."""
        start = self.steps_done
        for i in range(self.steps_done, self.exploration_steps):
            self.single_step(i)
            self.steps_done = i + 1
            if self.save_checkpoints:
                self._materialize()
                self.save_results()
                self.save_checkpoint(self.filename + "_state")
        if self._fused_ok() and self.steps_done > start:
            # trailing posterior update: the reference loop retrains after
            # the LAST measurement too (boptim.py:449); the fused path
            # deferred every other retrain into the next step's program.
            # Run it device-resident (no trajectory fetch - _materialize
            # below packs it into the final RPC) unless a mesh is in play,
            # where the surrogate's own train() handles the sharding.
            m = self.surrogate_model
            m.update_data(self.X_sparse, self.y_sparse)
            if m._mesh is not None:
                self._materialize()
                m.train(verbose=self.verbose,
                        iterations=self.refit_iterations)
            else:
                u, traj = engine.train(
                    m.u, m._Xd, m._yd, m._maskd, m._bounds(),
                    jnp.asarray(m.learning_rate, m.dtype),
                    jnp.asarray(m.jitter, m.dtype), kernel=m.kernel_type,
                    iterations=int(self.refit_iterations),
                    sparse=m.do_sparse)
                m.u = u
                m._traj_list.append(traj)
        self._materialize()
        self.save_results()
        if self.verbose:
            print("\nExploration completed")

    # ------------------------------------------------------------------
    # resumable experiment state (the reference only np.saves result
    # artifacts and has no resume path - SURVEY.md section 5)
    # ------------------------------------------------------------------

    def save_checkpoint(self, filename):
        """Full resumable state: measurements, query history, RNG state and
        the surrogate's trained (unconstrained) hyperparameters."""
        state = {
            "y_sparse": self.y_sparse,
            "indices_all": self.indices_all,
            "vals_all": self.vals_all,
            "target_func_vals": self.target_func_vals,
            "gp_predictions": self.gp_predictions,
            "steps_done": self.steps_done,
            "rng_state": self._rng.get_state(),
            "surrogate_u": {k: np.asarray(v)
                            for k, v in self.surrogate_model.u.items()},
        }
        _atomic_save(str(filename) + ".npy", state, allow_pickle=True)

    def load_checkpoint(self, filename):
        """Restore state written by save_checkpoint; run() then continues
        from the saved step."""
        import jax.numpy as jnp
        fname = str(filename)
        if not fname.endswith(".npy"):
            fname += ".npy"
        state = np.load(fname, allow_pickle=True).item()
        self.y_sparse = state["y_sparse"]
        self.X_sparse = gridutils.get_sparse_grid(self.y_sparse, self.extent)
        self.indices_all = list(state["indices_all"])
        self.vals_all = list(state["vals_all"])
        self.target_func_vals = list(state["target_func_vals"])
        self.gp_predictions = list(state["gp_predictions"])
        self.steps_done = int(state["steps_done"])
        self._rng.set_state(state["rng_state"])
        self.surrogate_model.u = {
            k: jnp.asarray(v) for k, v in state["surrogate_u"].items()}
        self.surrogate_model.update_data(self.X_sparse, self.y_sparse)

    def save_results(self, *args):
        """np.save a dict of {gp_pred, func_val, inds_all, vals_all}
        (artifact-compatible with reference boptim.py:472-485)."""
        filename = args[0] if args else self.filename
        results = {
            'gp_pred': self.gp_predictions,
            'func_val': self.target_func_vals,
            'inds_all': np.array(self.indices_all),
            'vals_all': np.array(self.vals_all),
        }
        _atomic_save(filename + ".npy", results, allow_pickle=True)
