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

import numpy as np

from gpim_tpu.gpbayes import acqfunc
from gpim_tpu.gpreg import gpr
from gpim_tpu.native import spatial
from gpim_tpu.utils import gridutils

__all__ = ["boptimizer"]


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
        """One explore-measure-update cycle (reference boptim.py:431-457)."""
        if self.verbose:
            print("\nExploration step {} / {}".format(
                e + 1, self.exploration_steps))
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
        for i in range(self.steps_done, self.exploration_steps):
            self.single_step(i)
            self.steps_done = i + 1
            if self.save_checkpoints:
                self.save_results()
                self.save_checkpoint(self.filename + "_state")
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
