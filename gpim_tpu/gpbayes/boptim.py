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

Two device fast paths replace the reference's fetch-per-phase hot loop:

- live instruments: ``_device_bo_step`` fuses retrain -> dense predict ->
  acquisition -> top-k into one jitted program with ONE small fetch per
  exploration step (~28 steps/s through the axon tunnel's ~25 ms RPC floor);
- simulated measurements (``simulate_measurement=True`` with a finite
  ``y_true``): ``_device_bo_explore`` scans the WHOLE explore-measure-update
  loop as one zero-fetch device program (~70 steps/s, compute-bound).
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
    # same-dtype buffer (hostio.fetch_tree); exact only for flat grids
    # below 2**24 cells under f32 (2**53 under f64) - _fused_ok gates
    # f32 models on that bound, larger grids take the host path
    small = (vals, order.astype(vals.dtype),
             traj["lengthscale"][-1].reshape(-1))
    return u, traj, mean, sd, small


@partial(jax.jit, static_argnames=(
    "kernel", "iterations", "refit", "steps", "sparse", "acq_kind"))
def _device_bo_explore(u0, Xr0, yr0, mr0, ids0, ytrue, obs0, bounds, lr,
                       jitter, chunks, sel_mask, alpha, beta, xi, *,
                       kernel, iterations, refit, steps, sparse, acq_kind):
    """The WHOLE simulated-measurement exploration loop as one device
    program: train -> predict -> acquire -> select -> measure (a y_true
    lookup) -> update, scanned over ``steps`` with zero host round trips.

    When the measurement is a lookup in a known array (the reference's
    ``simulate_measurement`` mode, boptim.py:253-262), nothing in the loop
    needs the host, so the per-step tunnel fetch that floors the live
    instrument loop at ~25-30 ms/step (see _device_bo_step) disappears
    entirely. The surrogate trains on a compacted row buffer
    (Xr, yr, mr, ids) of static size nmax = bucket(n_seed + steps) - the
    SAME sorted-by-flat-index row layout the host path's
    prepare_training_data builds, so a measurement is an ordered insert
    done as one gather (shift rows past the insertion point) instead of a
    host re-upload. The Cholesky stays at bucket size (vs the full grid),
    which keeps the loop compute-light at any grid size.

    Selection parity with the host path (checkvalues, reference
    boptim.py:378-429 at the default dscale=None): the best candidate not
    selected earlier in this run; already-measured SEED points are not
    excluded (the host only dedups against indices_all) - re-measuring a
    seed updates its row in place instead of inserting. The sole
    divergence: when every candidate has been selected the host falls back
    to a random index (exit_strategy) - here the argmax of an all -inf
    vector, which cannot occur under the steps <= n_candidates gate.

    Returns (u_final, per-step small results, device-resident mean/sd
    maps and trajectory segments).
    """
    Xd = chunks.reshape(-1, chunks.shape[-1])
    predict_fn = engine.predict_vfe if sparse else engine.predict_exact
    neg_inf = jnp.asarray(-jnp.inf, yr0.dtype)
    nmax = Xr0.shape[0]
    j = jnp.arange(nmax)

    def body(carry, iters):
        u, Xr, yr, mr, ids, obs, chosen = carry
        u, traj = engine.train(u, Xr, yr, mr, bounds, lr, jitter,
                               kernel=kernel, iterations=iters,
                               sparse=sparse)
        mean, var = predict_fn(u, Xr, yr, mr, bounds, jitter, chunks,
                               kernel=kernel, noiseless=False)
        sd = jnp.sqrt(var)
        if acq_kind == "cb":
            acq = alpha * mean + beta * sd
        else:
            best = jnp.max(jnp.where(obs, mean, neg_inf))
            z = (mean - best - xi) / sd
            if acq_kind == "ei":
                acq = ((mean - best - xi) * jax.scipy.stats.norm.cdf(z)
                       + sd * jax.scipy.stats.norm.pdf(z))
            else:
                acq = jax.scipy.stats.norm.cdf(z)
        macq = sel_mask * acq
        macq = jnp.where(jnp.isnan(macq) | (sel_mask == 0), neg_inf, macq)
        macq = jnp.where(chosen, neg_inf, macq)
        fid = jnp.argmax(macq)
        aval = macq[fid]
        mval = ytrue[fid]
        # ordered insert at the sorted flat-index position p (empty slots
        # hold the sentinel id n_flat > any real fid, so they never count);
        # a re-measured seed point is already present -> in-place value set
        present = jnp.any(ids == fid)
        p = jnp.sum(ids < fid)
        src = jnp.clip(j - (j > p), 0, nmax - 1)
        at_p = j == p
        Xr_i = jnp.where(at_p[:, None], Xd[fid][None, :], Xr[src])
        yr_i = jnp.where(at_p, mval, yr[src])
        mr_i = jnp.where(at_p, jnp.ones((), mr.dtype), mr[src])
        ids_i = jnp.where(at_p, fid, ids[src])
        yr_u = jnp.where(ids == fid, mval, yr)
        Xr = jnp.where(present, Xr, Xr_i)
        yr = jnp.where(present, yr_u, yr_i)
        mr = jnp.where(present, mr, mr_i)
        ids = jnp.where(present, ids, ids_i)
        obs = obs.at[fid].set(True)
        chosen = chosen.at[fid].set(True)
        return (u, Xr, yr, mr, ids, obs, chosen), \
            (traj, mean, sd, fid, aval)

    chosen0 = jnp.zeros(ytrue.shape, bool)
    carry, out0 = body((u0, Xr0, yr0, mr0, ids0, obs0, chosen0), iterations)
    carry, outs = jax.lax.scan(lambda c, _: body(c, refit), carry, None,
                               length=steps - 1)
    u, Xr, yr, mr = carry[0], carry[1], carry[2], carry[3]
    # trailing posterior update on the final data (reference boptim.py:449)
    u, traj_tail = engine.train(u, Xr, yr, mr, bounds, lr, jitter,
                                kernel=kernel, iterations=refit,
                                sparse=sparse)
    traj0, mean0, sd0, fid0, aval0 = out0
    trajs, means, sds, fids, avals = outs
    # measured values are NOT returned: the host re-reads them from its own
    # f64 y_true (bit-exact vs the step loop; the device copy is m.dtype)
    small = (jnp.concatenate([fid0[None], fids]).astype(yr0.dtype),
             jnp.concatenate([aval0[None], avals]))
    return u, small, (mean0, sd0, means, sds), (traj0, trajs, traj_tail)


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
        # None = auto (take the zero-fetch device loop whenever
        # _device_explore_ok holds); False = always the host step loop
        self._device_loop = kwargs.get("device_loop", None)
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
        # the device paths can only ever select from the finite, nonzero
        # mask entries (everything else is -inf in the masked acquisition)
        self._n_candidates = int(np.count_nonzero(np.nan_to_num(sel)))
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
                and self._n_test == int(np.prod(np.shape(self.y_sparse)))
                # candidate indices ride the one-buffer fetch as floats:
                # exact only below 2**24 flat cells for f32 models
                and (np.dtype(self.surrogate_model.dtype) != np.float32
                     or self._n_flat < 2 ** 24))

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

    def _device_explore_ok(self):
        """Gate for the zero-fetch device-resident exploration loop
        (_device_bo_explore): simulated measurements with a finite lookup
        table, default single-point selection semantics (no batch spacing,
        no distance memory), no per-step host checkpoints, fresh run, no
        mesh. Training stays at the compacted-row bucket size regardless
        of grid size, so no grid-size gate is needed."""
        return (self._device_loop is not False
                and self._fused_ok()
                and self.simulate_measurement
                and not self.batch_update
                and self.dscale is None
                and not self.save_checkpoints
                and self.surrogate_model._mesh is None
                and self.steps_done == 0
                # each step retires one candidate; with an acquisition
                # mask the pool is only the finite nonzero mask entries,
                # NOT the whole test grid - past exhaustion every argmax
                # of the all -inf acquisition would silently pick flat
                # index 0 instead of the host path's exit_strategy
                and self.exploration_steps <= self._n_candidates
                and bool(np.isfinite(
                    np.asarray(self.y_true, dtype=float)).all()))

    def _run_device_explore(self):
        """Run the whole exploration loop in one jitted program and unpack
        the results into the same host-side state the step loop builds
        (indices_all / vals_all / y_sparse / target_func_vals /
        gp_predictions / surrogate trajectory)."""
        m = self.surrogate_model
        n_flat, n_test = self._n_flat, self._n_test
        steps = int(self.exploration_steps)
        # compacted seed rows in the host layout: C-order flatten, NaN rows
        # dropped = rows sorted by flat grid index (prepare_training_data)
        ys = np.asarray(self.y_sparse, dtype=m.dtype).ravel()[:n_test]
        seed_ids = np.flatnonzero(np.isfinite(ys))
        chunks_np = np.asarray(self._chunks_d)
        Xflat = chunks_np.reshape(n_flat, chunks_np.shape[-1])
        nmax = -(-(len(seed_ids) + steps) // gpr._PAD_BUCKET) \
            * gpr._PAD_BUCKET
        Xr0 = np.zeros((nmax, Xflat.shape[-1]), m.dtype)
        yr0 = np.zeros(nmax, m.dtype)
        mr0 = np.zeros(nmax, m.dtype)
        ids0 = np.full(nmax, n_flat, np.int32)   # sentinel = n_flat
        Xr0[:len(seed_ids)] = Xflat[seed_ids]
        yr0[:len(seed_ids)] = ys[seed_ids]
        mr0[:len(seed_ids)] = 1.0
        ids0[:len(seed_ids)] = seed_ids
        yt = np.zeros(n_flat, m.dtype)
        yt[:n_test] = np.asarray(self.y_true, dtype=m.dtype).ravel()
        obs0 = np.zeros(n_flat, bool)
        obs0[seed_ids] = True
        u, small, maps, trajs = _device_bo_explore(
            m.u, jnp.asarray(Xr0), jnp.asarray(yr0), jnp.asarray(mr0),
            jnp.asarray(ids0), jnp.asarray(yt), jnp.asarray(obs0),
            m._bounds(), self._lr_d, self._jitter_d, self._chunks_d,
            self._sel_mask_d,
            float(self.alpha), float(self.beta), float(self.xi),
            kernel=m.kernel_type, iterations=int(m.iterations),
            refit=int(self.refit_iterations), steps=steps,
            sparse=m.do_sparse, acq_kind=self.acquisition_function)
        idxs_f, avals = fetch_tree(small)   # THE one fetch
        idxs = np.asarray(idxs_f).astype(np.int64)
        for i in range(steps):
            idx = np.unravel_index(idxs[i], self._fulldims)
            self.indices_all.append(list(int(v) for v in idx))
            self.vals_all.append(float(avals[i]))
            self.y_sparse[idx] = self.y_true[idx]
            self.target_func_vals.append(self.y_sparse.copy())
        self.X_sparse = gridutils.get_sparse_grid(self.y_sparse, self.extent)
        mean0, sd0, means, sds = maps
        self.gp_predictions.append((mean0, sd0))
        for i in range(steps - 1):
            self.gp_predictions.append((means[i], sds[i]))
        traj0, trajs_scan, traj_tail = trajs
        m.u = u
        m._traj_list.append(traj0)
        if steps > 1:
            m._traj_list.append(jax.tree_util.tree_map(
                lambda a: a.reshape((-1,) + a.shape[2:]), trajs_scan))
        m._traj_list.append(traj_tail)
        # keep the surrogate's own (compacted-row) training set in sync for
        # save/load and any subsequent host-path use
        m.update_data(self.X_sparse, self.y_sparse)
        self.steps_done = steps
        if self.verbose:
            print("\nExploration completed ({} steps, device-resident "
                  "simulated loop)".format(steps))

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
        if self.exploration_steps > self.steps_done \
                and self._device_explore_ok():
            self._run_device_explore()
            self._materialize()
            self.save_results()
            return
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
