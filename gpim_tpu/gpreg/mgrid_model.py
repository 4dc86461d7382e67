"""
Masked-grid Kronecker CG engine: the SKI path for data ON the data lattice.

Every GPim workload feeds observations that sit exactly on the Cartesian
data grid (X comes from gprutils.get_sparse_grid; reference
boptim.py:274, gpr.py:115), with NaNs marking the unmeasured cells. The
TPU-native operator for that regime sets the inducing grid EQUAL to the
data grid, making W a masked identity:

    A v = M . K_UU (M . v) + (noise + jitter) v

pure Kronecker mode products on the MXU plus elementwise masks - no
gathers, no scatters (XLA's TPU scatter/gather lowering is what throttles
the generic interpolation operator at large n: measured ~0.9 s per mvm at
n = 314k off-lattice vs low-ms here at G = 1M). It is also EXACT in W
(zero interpolation error), so this engine strictly dominates grid
interpolation whenever the data is lattice-aligned; the generic
ops/ski.py interpolation engine (SKIEngine) remains the off-lattice path.

Capability match: reference skgpr.py:436-440 (GridInterpolationKernel on
masked 2D-4D grids) at its headline 128x128-image scale and beyond.

Training mirrors gpreg/ski_model.py: segmented Adam, split-preconditioned
CG + SLQ through the shared ski.ski_mll_from_mvm custom-VJP core. The
preconditioner basis is the FACTORED ski.KronRoot (per-dim eigen tables +
sorted mode indices + an r x r rotation): no (G, r) matrix is stored or
re-read per CG iteration - the dense root exists only transiently inside
the once-per-segment rebuild (ski.mgrid_split_root).
"""

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gpim_tpu.kernels.transforms import interval_log_jacobian
from gpim_tpu.ops import ski
from gpim_tpu.gpreg.multi import _constrain_task as _constrain

__all__ = ["MaskedGridEngine", "detect_masked_lattice",
           "cartesian_axes_from_points"]

_LOG_2PI = float(np.log(2.0 * np.pi))

# Largest grid the auto rule will train as ONE fused device program. At
# 4,194,304 cells the fused 30-iteration program (a ~2-minute single
# device execution) reproducibly crashed the TPU worker while the
# 10-iteration one (~45 s) ran fine and compiled memory was identical -
# an execution-length kill, not capacity. The proven-fused 2.36M shape
# stays comfortably under this; larger grids use the per-segment host
# loop (same schedule, ~1 RPC per segment). Override per-call with
# train(..., fused=True/False).
_FUSED_MAX_G = 3_000_000


# --------------------------------------------------------------------------
# host-side lattice detection
# --------------------------------------------------------------------------

def _fit_uniform_axis(vals_2d, rtol=1e-6):
    """Given per-line coordinate samples (N, n_other) with NaNs, recover a
    uniform axis a + b*i by least squares over observed lines; None if the
    observed coordinates are not uniform within tolerance."""
    N = vals_2d.shape[0]
    line_val = np.full(N, np.nan)
    for i in range(N):
        row = vals_2d[i]
        row = row[~np.isnan(row)]
        if len(row):
            if np.ptp(row) > rtol * (abs(row[0]) + 1.0):
                return None                    # not constant along the line
            line_val[i] = row[0]
    obs = ~np.isnan(line_val)
    if obs.sum() < 2:
        return None
    i_obs = np.nonzero(obs)[0]
    # exact for uniform axes; lstsq tolerates f32 round-off
    A = np.stack([np.ones(len(i_obs)), i_obs.astype(np.float64)], -1)
    coef, *_ = np.linalg.lstsq(A, line_val[obs], rcond=None)
    axis = coef[0] + coef[1] * np.arange(N)
    span = np.abs(axis).max() + 1.0
    if np.abs(axis[i_obs] - line_val[obs]).max() > rtol * span:
        return None
    if abs(coef[1]) < 1e-12:
        return None
    return axis


def detect_masked_lattice(X_raw, y_raw, rtol=1e-6):
    """If ``X_raw`` (d, *y.shape) is a (possibly NaN-masked) mgrid over
    uniform per-dim axes, return the list of 1D axes; else None.

    Fully-unmeasured grid lines are filled by the fitted uniform axis
    (their coordinates are implied by the lattice).
    """
    X_raw = np.asarray(X_raw, np.float64)
    shape = np.shape(y_raw)
    d = len(shape)
    if X_raw.ndim != d + 1 or X_raw.shape != (d,) + tuple(shape):
        return None
    axes = []
    for k in range(d):
        vals = np.moveaxis(X_raw[k], k, 0).reshape(shape[k], -1)
        axis = _fit_uniform_axis(vals, rtol)
        if axis is None:
            return None
        axes.append(axis)
    return axes


def cartesian_axes_from_points(X_flat, dims, rtol=1e-6):
    """Per-dim axes if the (m, d) rows are the C-order flattening of a
    Cartesian product over ``dims`` with uniform axes; else None."""
    from gpim_tpu.ops.kron_exact import detect_cartesian
    axes = detect_cartesian(np.asarray(X_flat, np.float64), dims, rtol)
    if axes is None:
        return None
    for ax in axes:
        if len(ax) > 1:
            steps = np.diff(ax)
            if np.ptp(steps) > rtol * (np.abs(ax).max() + 1.0):
                return None
    return axes


# --------------------------------------------------------------------------
# jitted programs (module-level: shared compilation across instances)
# --------------------------------------------------------------------------

def _loss(u, axes, mask_flat, g0, Qp, lam_n, y_flat, bounds, jitter, *,
          kernel, grid_shape, cg_iters, mesh=None, record_iters=False):
    # batch-first layout throughout (g0 is (n_probes, G)): the CG state
    # never materializes a lane-padded (G, small) block - see
    # ski.batched_pcg on the TPU tiling economics
    mvm = ski.make_masked_grid_mvm(kernel, list(axes), grid_shape,
                                   mask_flat, batch_first=True, mesh=mesh)
    constrain = None
    if mesh is not None:
        # shard the G-sized CG state over 'grid': the mode products run
        # through the explicit all-to-all shard_map form where the dims
        # divide (ski.kron_mvm_bf_sharded - shard-sized intermediates),
        # GSPMD partitioning otherwise (ski.ski_mll_from_mvm)
        shard = ski._grid_sharder(mesh)
        constrain = lambda x: shard(x, (None, "grid"))
    core = ski.ski_mll_from_mvm(mvm, cg_iters, g0, vec_axis=1,
                                constrain=constrain,
                                return_iters=record_iters)
    p = _constrain(u, bounds)
    yc = (y_flat - p["mean"]) * mask_flat
    noise_pj = p["noise"] + jitter
    n_eff = jnp.sum(mask_flat)
    G = y_flat.shape[0]
    kp = {"lengthscale": p["lengthscale"], "variance": p["variance"]}
    base = core(kp, noise_pj, yc, Qp, lam_n)
    it = None
    if record_iters:
        base, it = base
    # identical objective to ski_model._loss with n_pad = G: masked grid
    # cells are exact noise*I rows of A, subtracted from the logdet
    loss = (base
            + 0.5 * n_eff * _LOG_2PI
            - 0.5 * (G - n_eff) * jnp.log(noise_pj)
            - interval_log_jacobian(
                u["lengthscale"], bounds["ls_lo"], bounds["ls_hi"]))
    return (loss, it) if record_iters else loss


@partial(jax.jit, static_argnames=("kernel", "grid_shape", "rank"))
def _build_precond(u, axes, mask_flat, bounds, *, kernel, grid_shape, rank):
    """Returns the preconditioner's orthonormal Nystrom form (Q, lam_n) -
    NOISE-INDEPENDENT and fixed for a whole training segment, so no
    factorization of any kind runs inside the loss. Q is the FACTORED
    :class:`ski.KronRoot` (mode products, no stored (G, r) matrix - see
    ski.mgrid_split_root; at G ~ 1M the dense basis is ~2 GB of HBM
    re-read twice per CG iteration)."""
    if rank == 0:
        Lp = jnp.zeros((mask_flat.shape[0], 0), mask_flat.dtype)
        return Lp, jnp.zeros((0,), mask_flat.dtype)
    p = _constrain(u, bounds)
    kp = {"lengthscale": p["lengthscale"], "variance": p["variance"]}
    Qp, lam_n, _, _ = ski.mgrid_split_root(
        kernel, kp, list(axes), grid_shape, mask_flat, rank)
    return Qp, lam_n


def _loss_ws(u, X0, axes, mask_flat, g0, Qp, lam_n, y_flat, bounds,
             jitter, *, kernel, grid_shape, cg_iters, mesh=None):
    """Warm-started variant of :func:`_loss`: takes the previous Adam
    step's split-space CG solution block ``X0`` and returns
    (loss, (X_new, realized_iters)) - see ski.ski_mll_from_mvm
    warm_start for the estimator contract (gradients exact-in-tolerance,
    recorded loss value's logdet approximate)."""
    mvm = ski.make_masked_grid_mvm(kernel, list(axes), grid_shape,
                                   mask_flat, batch_first=True, mesh=mesh)
    constrain = None
    if mesh is not None:
        shard = ski._grid_sharder(mesh)
        constrain = lambda x: shard(x, (None, "grid"))
    core = ski.ski_mll_from_mvm(mvm, cg_iters, g0, vec_axis=1,
                                constrain=constrain, warm_start=True)
    p = _constrain(u, bounds)
    yc = (y_flat - p["mean"]) * mask_flat
    noise_pj = p["noise"] + jitter
    n_eff = jnp.sum(mask_flat)
    G = y_flat.shape[0]
    kp = {"lengthscale": p["lengthscale"], "variance": p["variance"]}
    base, aux = core(kp, noise_pj, yc, Qp, lam_n, X0)
    loss = (base
            + 0.5 * n_eff * _LOG_2PI
            - 0.5 * (G - n_eff) * jnp.log(noise_pj)
            - interval_log_jacobian(
                u["lengthscale"], bounds["ls_lo"], bounds["ls_hi"]))
    return loss, aux


@partial(jax.jit, static_argnames=(
    "kernel", "grid_shape", "cg_iters", "iterations", "mesh",
    "record_iters", "warm_start"))
def _train_seg(u0, opt_state, Qp, lam_n, axes, mask_flat, g0, y_flat,
               bounds, lr, jitter, *, kernel, grid_shape, cg_iters,
               iterations, mesh=None, record_iters=False,
               warm_start=False):
    opt = optax.adam(learning_rate=lr)
    if warm_start:
        lf = partial(_loss_ws, kernel=kernel, grid_shape=grid_shape,
                     cg_iters=cg_iters, mesh=mesh)

        def step(carry, _):
            u, opt_state, X = carry
            (loss, (X_new, cg_it)), g = jax.value_and_grad(
                lf, has_aux=True)(
                u, X, axes, mask_flat, g0, Qp, lam_n, y_flat, bounds,
                jitter)
            updates, opt_state = opt.update(g, opt_state, u)
            u = optax.apply_updates(u, updates)
            p = _constrain(u, bounds)
            rec = {"lengthscale": p["lengthscale"],
                   "noise": p["noise"], "loss": loss}
            if record_iters:
                rec["cg_iters"] = cg_it
            return (u, opt_state, X_new), rec

        X0 = jnp.zeros((g0.shape[0] + 1, g0.shape[1]), g0.dtype)
        (u_final, opt_state, _), traj = jax.lax.scan(
            step, (u0, opt_state, X0), None, length=iterations)
        return u_final, opt_state, traj

    lf = partial(_loss, kernel=kernel, grid_shape=grid_shape,
                 cg_iters=cg_iters, mesh=mesh, record_iters=record_iters)

    def step(carry, _):
        u, opt_state = carry
        if record_iters:
            (loss, cg_it), g = jax.value_and_grad(lf, has_aux=True)(
                u, axes, mask_flat, g0, Qp, lam_n, y_flat, bounds, jitter)
        else:
            loss, g = jax.value_and_grad(lf)(
                u, axes, mask_flat, g0, Qp, lam_n, y_flat, bounds, jitter)
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
                                   "iterations", "segment", "rank"))
def _train_fused(u0, opt_state0, axes, mask_flat, g0, y_flat, bounds, lr,
                 jitter, *, kernel, grid_shape, cg_iters, iterations,
                 segment, rank):
    """The WHOLE adaptive-cadence training loop as ONE device program.

    The host segment loop (MaskedGridEngine.train) pays 2 dispatches + 1
    trajectory fetch per segment - ~30 tunnel round trips for a 30-iter
    1M-cell run. Measured on TPU v5e at the 1M shape: warm train 5.5 ->
    5.0 s in a healthy tunnel window, and (the larger point) the wall no
    longer tracks the tunnel's RPC-latency drift, which made back-to-back
    host-loop suite runs read 6.4 vs 9.4 s (benchmarks/suite.py _timed
    docstring). Here the SAME schedule runs inside one lax.scan: a step
    at a segment boundary adapts the next segment length from the
    previous step's realized CG iterations (identical rule and
    remaining-clamp as the host loop, so the rebuild points coincide
    exactly) and rebuilds the split preconditioner under ``lax.cond``
    (eigen-root only at boundaries). One dispatch, one trajectory fetch
    per train() call. The cost is compile time for the giant program
    (~9 min cold at the 1M shape through the tunnel, then persistently
    cached) - hence the CPU-backend carve-out in train()'s auto rule.

    The host loop remains for ``mesh`` training (its per-segment programs
    carry the sharding constraints the partitioning tests pin) and for
    the opt-in ``warm_start`` estimator.
    """
    opt = optax.adam(learning_rate=lr)
    lf = partial(_loss, kernel=kernel, grid_shape=grid_shape,
                 cg_iters=cg_iters, mesh=None, record_iters=True)

    def rebuild(u):
        return _build_precond(u, axes, mask_flat, bounds, kernel=kernel,
                              grid_shape=grid_shape, rank=rank)

    # segment 0 (length min(2, iterations), host parity) builds eagerly,
    # which also gives the scan carry its (Qp, lam) pytree structure
    Qp0, lam0 = rebuild(u0)
    s0 = min(2, int(iterations))

    def body(carry, i):
        u, opt_state, Qp, lam, left, s_cur, s_next, prev_it = carry
        at_boundary = left == 0
        # host rule, applied with the previous step's realized count and
        # the (remaining-clamped) length of the segment that just ended
        s_next_new = jnp.where(
            prev_it >= 16.0, jnp.maximum(2, s_cur // 2),
            jnp.where(prev_it <= 8.0,
                      jnp.minimum(segment, s_cur * 2), s_next))
        s_new = jnp.minimum(s_next_new, iterations - i)
        Qp, lam = jax.lax.cond(at_boundary, rebuild, lambda _: (Qp, lam),
                               u)
        s_cur = jnp.where(at_boundary, s_new, s_cur)
        s_next = jnp.where(at_boundary, s_next_new, s_next)
        left = jnp.where(at_boundary, s_new, left)
        (loss, cg_it), g = jax.value_and_grad(lf, has_aux=True)(
            u, axes, mask_flat, g0, Qp, lam, y_flat, bounds, jitter)
        updates, opt_state = opt.update(g, opt_state, u)
        u = optax.apply_updates(u, updates)
        p = _constrain(u, bounds)
        rec = {"lengthscale": p["lengthscale"], "noise": p["noise"],
               "loss": loss, "cg_iters": cg_it}
        return (u, opt_state, Qp, lam, left - 1, s_cur, s_next,
                jnp.asarray(cg_it, jnp.float32)), rec

    carry0 = (u0, opt_state0, Qp0, lam0,
              jnp.asarray(s0, jnp.int32), jnp.asarray(s0, jnp.int32),
              jnp.asarray(2, jnp.int32),
              jnp.asarray(12.0, jnp.float32))   # neutral: keeps s_next
    (u_final, opt_state, *_), traj = jax.lax.scan(
        body, carry0, jnp.arange(iterations, dtype=jnp.int32))
    return u_final, opt_state, traj


@partial(jax.jit, static_argnames=("kernel", "grid_shape", "cg_iters",
                                   "precond_rank", "mesh"))
def _predict_grid(u, axes, mask_flat, y_flat, t_axes, bounds, jitter, *,
                  kernel, grid_shape, cg_iters, precond_rank, mesh=None):
    predictor = ski.make_grid_predictor(
        kernel, list(axes), grid_shape, cg_iters, precond_rank, mesh=mesh)
    p = _constrain(u, bounds)
    yc = (y_flat - p["mean"]) * mask_flat
    noise_pj = p["noise"] + jitter
    kss = p["variance"]
    mean, var = predictor(
        {"lengthscale": p["lengthscale"], "variance": p["variance"]},
        noise_pj, mask_flat, yc, list(t_axes), kss)
    return mean + p["mean"], var + p["noise"]   # noiseless=False semantics


@partial(jax.jit, static_argnames=("kernel", "grid_shape", "cg_iters",
                                   "precond_rank", "mesh"))
def _predict_points(u, axes, mask_flat, y_flat, Xt_chunks, bounds, jitter, *,
                    kernel, grid_shape, cg_iters, precond_rank, mesh=None):
    """Scattered-test fallback: exact per-dim cross-covariance einsum chains
    per chunk (no gathers), Nystrom-extension variance. With a mesh, each
    chunk's rows shard over 'grid' (per-row work is independent)."""
    shard = ski._grid_sharder(mesh)
    p = _constrain(u, bounds)
    kp = {"lengthscale": p["lengthscale"], "variance": p["variance"]}
    yc = (y_flat - p["mean"]) * mask_flat
    noise_pj = p["noise"] + jitter
    am, Bmat, sel = ski.mgrid_solve_core(
        kernel, kp, list(axes), grid_shape, mask_flat, precond_rank,
        cg_iters, noise_pj, yc)
    d = len(axes)

    def one(xc):
        xc = shard(xc, ("grid", None))
        E = ski.grid_cross_factors(
            kernel, kp, list(axes), [xc[:, k] for k in range(d)])
        # mean: per-point Kronecker cross-rows contracted mode by mode
        T = jnp.einsum("bi,i...->b...", E[0], am)
        for k in range(1, d):
            T = jnp.einsum("bi,bi...->b...", E[k], T)
        mean_c = T
        # variance: Nystrom extension Lt = KR_b(E_k sel_k) Lam^{-1/2}
        B = jnp.dot(E[0], sel[0], precision=jax.lax.Precision.HIGHEST)
        for k in range(1, d):
            B = B * jnp.dot(E[k], sel[k],
                            precision=jax.lax.Precision.HIGHEST)
        H = jnp.dot(B, Bmat, precision=jax.lax.Precision.HIGH)
        var_c = jnp.maximum(p["variance"] - jnp.sum(H * H, axis=1), 0.0)
        return mean_c, var_c

    means, variances = jax.lax.map(one, Xt_chunks)
    return (means.reshape(-1) + p["mean"],
            variances.reshape(-1) + p["noise"])


class MaskedGridEngine:
    """Holds the axes/mask of one lattice dataset; compiled programs are
    shared across instances of the same shape."""

    def __init__(self, kernel, axes, mask_grid, y_grid, dtype, *,
                 cg_iters=64, n_probes=8, precond_rank=None,
                 segment=10, seed=0, mesh=None, pad_dodge=None):
        self.kernel = kernel
        self.dtype = dtype
        self.mesh = mesh
        # RETIRED TPU-miscompile dodge (kept as an escape hatch). Round 3
        # observed a TPU-backend bug: with any grid dim a multiple of 128,
        # jitting value_and_grad of the masked-grid MLL corrupted the CG
        # while_loop output (NaN gradients; value-only programs were finite
        # and bit-reproducible; 127/129/96/64-sized dims never failed). The
        # workaround padded such dims by +4 masked cells - EXACT, not an
        # approximation: padded cells are masked, so A is block-diagonal
        # with an exact noise*I block whose logdet the MLL correction term
        # already subtracts, and CG gives alpha = 0 at padded cells.
        # Round 4 measured the bug HEALED (jax 0.9.0 / TPU v5 lite: canary
        # rel_param_gap 0.0035 at the (128, 6) trigger shape, and the raw
        # 1M program is healthy AND 1.6x faster than its padded twin - see
        # benchmarks/RESULTS.md tpu_128_miscompile_canary and
        # BASELINE_MEASURED.md), so padding is now OFF by default. Safety
        # nets: tests/test_tpu_canary.py + the suite canary row announce a
        # regression; train() raises an actionable error if a raw
        # 128-multiple trajectory ever goes non-finite; force padding back
        # on with pad_dodge=True or GPIM_TPU_PAD_DODGE=1 (the repro
        # script passes pad_dodge explicitly either way).
        if pad_dodge is None:
            pad_dodge = os.environ.get("GPIM_TPU_PAD_DODGE", "0") == "1"
        axes = [np.asarray(a, dtype) for a in axes]
        mult128 = [len(a) % 128 == 0 for a in axes]
        self._raw_mult128 = any(mult128) and not pad_dodge
        pads = [4 if pad_dodge and m else 0 for a, m in zip(axes, mult128)]
        if any(pads):
            axes = [np.concatenate([a, a[-1] + (a[1] - a[0])
                                    * np.arange(1, p + 1, dtype=dtype)])
                    if p else a for a, p in zip(axes, pads)]
            mask_grid = np.pad(np.asarray(mask_grid, bool),
                               [(0, p) for p in pads])
            y_grid = np.pad(np.asarray(y_grid, dtype),
                            [(0, p) for p in pads])
        self._pads = pads
        self.grid_shape = tuple(len(a) for a in axes)
        self.axes_np = axes
        self._axes = tuple(jnp.asarray(a) for a in self.axes_np)
        G = int(np.prod(self.grid_shape))
        mask_flat = np.asarray(mask_grid, dtype).reshape(-1)
        self._mask = jnp.asarray(mask_flat)
        self._y = jnp.asarray(
            np.nan_to_num(np.asarray(y_grid, dtype)).reshape(-1))
        self.n_eff = int(mask_flat.sum())
        self.cg_iters = int(min(cg_iters, G))
        if precond_rank is None:
            # scale-adaptive default: with the factored KronRoot apply the
            # per-CG-iteration cost is nearly rank-independent, so at
            # reference scale a bigger eigenspace is a straight win
            # (measured at G ~ 1.1M: 83 -> 59 realized iters for a 125 ms
            # once-per-segment rebuild - BASELINE_MEASURED.md); small grids
            # keep 512 (their solves converge in a handful of iterations)
            precond_rank = 1024 if G >= 500_000 else 512
        self.precond_rank = int(min(precond_rank, G))
        self.segment = int(segment)
        rng = np.random.default_rng(seed)
        pm1 = np.asarray([-1.0, 1.0], dtype)
        # probes of the SPLIT operator (z~ with E[z~ z~^T] = I; equivalently
        # z = P^1/2 z~ ~ N(0, P) - see ski.ski_mll), BATCH-FIRST (probes
        # are rows: see ski.batched_pcg on the TPU tiling economics)
        self._g0 = jnp.asarray(rng.choice(pm1, size=(n_probes, G)))

    def _check_traj_finite(self, traj):
        """Regression net for the (retired) 128-multiple pad dodge: raise an
        actionable error if a raw 128-multiple training trajectory went
        non-finite. The recorded loss is PRE-update for its step, so a
        miscompiled (NaN) gradient on the FINAL Adam step leaves the loss
        series finite while the returned parameters are NaN — the last
        recorded lengthscale/noise entries are post-update and catch it."""
        if not self._raw_mult128:
            return
        bad = (not np.isfinite(traj["loss"]).all()
               or not np.isfinite(np.asarray(traj["lengthscale"][-1])).all()
               or not np.isfinite(np.asarray(traj["noise"][-1])).all())
        if bad:
            raise RuntimeError(
                "masked-grid training went non-finite on a grid with a "
                "128-multiple dim and padding disabled. This is the "
                "signature of the (retired) TPU-backend value_and_grad "
                "miscompile - see benchmarks/repro_tpu_128_miscompile.py. "
                "Re-enable the exact padding dodge with "
                "MaskedGridEngine(pad_dodge=True) or GPIM_TPU_PAD_DODGE=1 "
                "(if training also diverges WITH padding, the cause is "
                "numerical - lower the learning rate instead).")

    def train_memory_analysis(self, u0, bounds, lr, jitter, *,
                              iterations=30):
        """Compiled-program memory accounting of the fused training program
        at this engine's exact shapes (the HBM evidence behind the
        benchmarks/mgrid_scaling.py frontier sweep): lowers _train_fused
        and returns the backend's memory_analysis fields in bytes, plus
        the analytic model of the dominant buffers (CG batch state, probe
        block, grid vectors, trajectory) for cross-checking. Compile-only:
        never executes the program."""
        lowered = _train_fused.lower(
            u0, optax.adam(1.0).init(u0), self._axes, self._mask,
            self._g0, self._y, bounds, lr, jitter, kernel=self.kernel,
            grid_shape=self.grid_shape, cg_iters=self.cg_iters,
            iterations=int(iterations), segment=int(self.segment),
            rank=self.precond_rank)
        out = {"G": int(np.prod(self.grid_shape)),
               "grid_shape": tuple(self.grid_shape),
               "rank": self.precond_rank,
               "n_probes": int(self._g0.shape[0]),
               "itemsize": int(np.dtype(self.dtype).itemsize)}
        G, p, isz = out["G"], out["n_probes"], out["itemsize"]
        # analytic model (see ski.split_pcg / mgrid_split_root): the
        # (1 rhs + p probes) batched split-CG carries x/r/z/pdir buffers of
        # (p+1, G); the preconditioner is FACTORED (per-dim Us + (r, r) C -
        # no (G, r) matrix); grid-resident vectors: y, mask, probe block.
        out["analytic_bytes"] = {
            "cg_state_4x(p+1)G": 4 * (p + 1) * G * isz,
            "probe_block_pG": p * G * isz,
            "grid_vectors_y_mask": 2 * G * isz,
            "precond_factored_rr": (self.precond_rank ** 2 * isz
                                    + sum(len(a) * min(len(a), 4096) * isz
                                          for a in self.axes_np)),
            "trajectory_per_iter": (int(iterations)
                                    * (2 + len(self.axes_np)) * isz),
        }
        try:
            ma = lowered.compile().memory_analysis()
            for k in ("argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes", "alias_size_in_bytes",
                      "generated_code_size_in_bytes"):
                v = getattr(ma, k, None)
                if v is not None:
                    out[k] = int(v)
        except Exception as e:   # backend without memory_analysis support
            out["memory_analysis_error"] = repr(e)[:120]
        return out

    # -- the same train contract as SKIEngine.train -----------------------

    def train(self, u0, bounds, lr, jitter, *, iterations,
              record_cg_iters=False, warm_start=False, fused=None):
        u = u0
        if int(iterations) <= 0:
            d = u0["lengthscale"].shape[0]
            zero = np.zeros((0,), self.dtype)
            out = {"lengthscale": np.zeros((0, d), self.dtype),
                   "noise": zero, "loss": zero}
            if record_cg_iters:
                out["cg_iters"] = zero
            return u, out
        from gpim_tpu.utils.hostio import fetch_tree
        if fused is None:
            # auto: fused on accelerators (one dispatch/fetch per train,
            # immune to tunnel-latency drift; compile is server-side and
            # persistently cached). On CPU the giant single program costs
            # minutes of local compile vs seconds for the per-segment
            # programs - keep the host loop there (tests pass fused=True
            # explicitly to pin schedule parity). Above _FUSED_MAX_G cells
            # the host loop also wins on accelerators: one fused
            # multi-minute device program at 4.2M cells reproducibly
            # crashed the TPU worker (fresh process, memory_analysis
            # identical to the healthy 10-iteration program - a
            # wall-time/watchdog kill, not OOM; benchmarks/
            # BASELINE_MEASURED.md round-5 frontier), while the
            # per-segment dispatches run the same schedule in ~seconds
            # each with ~1 RPC round trip per segment of overhead.
            G = int(np.prod(self.grid_shape))
            fused = (self.mesh is None and not warm_start
                     and jax.default_backend() != "cpu"
                     and G <= _FUSED_MAX_G)
        if fused:
            # one device program for the whole adaptive schedule (zero
            # per-segment round trips; see _train_fused). Same schedule,
            # same estimator - the host segment loop below remains for
            # mesh training and the opt-in warm-start estimator.
            u, _, traj = _train_fused(
                u0, optax.adam(1.0).init(u0), self._axes, self._mask,
                self._g0, self._y, bounds, lr, jitter, kernel=self.kernel,
                grid_shape=self.grid_shape, cg_iters=self.cg_iters,
                iterations=int(iterations), segment=int(self.segment),
                rank=self.precond_rank)
            traj = fetch_tree(traj)
            self._check_traj_finite(traj)
            full = {k: np.asarray(v) for k, v in traj.items()}
            if not record_cg_iters:
                full.pop("cg_iters", None)
            return u, full
        opt_state = optax.adam(1.0).init(u0)
        trajs = []
        remaining = int(iterations)
        # ADAPTIVE rebuild cadence. The measured per-iteration wall at
        # G ~ 1M is ~13.7 ms per realized CG iteration + 137 ms per basis
        # rebuild (benchmarks/mgrid_iter_trace.py, BASELINE_MEASURED.md
        # "1M iteration accounting"): the round-3 static ramp (2, 4, 8,
        # segment, ...) let realized iters climb 24 -> 64 and 3 -> 36
        # between rebuilds while hyperparameters moved - most of the
        # "missing" wall of the 30-iter run. A rebuild pays for itself in
        # ~10 saved CG iterations, so the segment length now adapts to
        # the REALIZED convergence: double it while solves stay cheap,
        # halve it when the last step's iteration count crosses the
        # rebuild-worthy threshold. Segment lengths stay powers of two
        # (capped by ``segment``) so each distinct scan length compiles
        # once. Each segment's trajectory is fetched in ONE packed RPC
        # (hostio.fetch_tree) - that fetch both feeds the adaptation and
        # pre-pays the end-of-train assembly.
        s_next = 2
        while remaining > 0:
            s = min(s_next, remaining)
            Qp, lam_n = _build_precond(
                u, self._axes, self._mask, bounds,
                kernel=self.kernel, grid_shape=self.grid_shape,
                rank=self.precond_rank)
            u, opt_state, traj = _train_seg(
                u, opt_state, Qp, lam_n, self._axes, self._mask,
                self._g0, self._y, bounds, lr, jitter,
                kernel=self.kernel, grid_shape=self.grid_shape,
                cg_iters=self.cg_iters, iterations=s, mesh=self.mesh,
                record_iters=True, warm_start=warm_start)
            traj = fetch_tree(traj)
            self._check_traj_finite(traj)
            last_it = float(traj["cg_iters"][-1])
            if last_it >= 16.0:
                s_next = max(2, s // 2)
            elif last_it <= 8.0:
                s_next = min(self.segment, s * 2)
            trajs.append(traj)
            remaining -= s
        full = {k: np.concatenate([np.asarray(t[k]) for t in trajs])
                for k in trajs[0]}
        if not record_cg_iters:
            full.pop("cg_iters", None)
        return u, full

    def predict(self, u, bounds, jitter, Xtest_clean, fulldims, mesh=None):
        """Cartesian test grids run the fused mode-product path; scattered
        test points fall back to corner gathers (once per predict). With a
        mesh, test rows shard over its 'grid' axis on both paths; when
        ``mesh`` is not given, the construction-time engine mesh applies
        (so a mesh-built engine never silently predicts replicated)."""
        if mesh is None:
            mesh = self.mesh
        t_axes = None
        if fulldims is not None and len(fulldims) == len(self.grid_shape) \
                and len(Xtest_clean) == int(np.prod(fulldims)):
            t_axes = cartesian_axes_from_points(Xtest_clean, fulldims)
        if t_axes is not None:
            t_axes_j = tuple(jnp.asarray(np.asarray(a, self.dtype))
                             for a in t_axes)
            return _predict_grid(
                u, self._axes, self._mask, self._y, t_axes_j,
                bounds, jitter, kernel=self.kernel,
                grid_shape=self.grid_shape, cg_iters=self.cg_iters,
                precond_rank=self.precond_rank, mesh=mesh)
        from gpim_tpu.gpreg import engine as _eng
        Xt = np.asarray(Xtest_clean, self.dtype)
        chunks, n_t = _eng.chunk_rows(Xt, min(4096, max(128, len(Xt))))
        mean, var = _predict_points(
            u, self._axes, self._mask, self._y, jnp.asarray(chunks),
            bounds, jitter, kernel=self.kernel, grid_shape=self.grid_shape,
            cg_iters=self.cg_iters, precond_rank=self.precond_rank,
            mesh=mesh)
        return mean[:n_t], var[:n_t]
