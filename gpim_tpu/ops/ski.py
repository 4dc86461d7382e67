"""
Structured Kernel Interpolation (SKI / KISS-GP) operator, TPU-first.

Re-implements the capability of GPyTorch's GridInterpolationKernel + BBMM +
LOVE stack (reference skgpr.py:124-131,285,436-440) from scratch on XLA
primitives chosen for the TPU:

    K  ~=  W  K_UU  W^T,      K_UU = (x)_d  K_d   (Kronecker over dims)

- W: sparse linear interpolation onto a Cartesian inducing grid, stored as
  (n, 2^d) flat indices + weights; applied with gathers / scatter-adds.
- K_UU mvm: dense per-dim factors (grids are a few hundred points per dim,
  so dense mode-products on the MXU beat FFT/Toeplitz tricks) applied as
  d tensor-mode contractions.
- Solves: batched conjugate gradients on the mvm (all rhs at once - one
  fused program, matmul-shaped inner products).
- log-determinant: stochastic Lanczos quadrature over Rademacher probes
  (the same estimator family as GPyTorch's BBMM logdet), with a custom VJP
  that turns the gradient into Hutchinson trace estimation:
      d logdet/d theta ~= (1/p) sum_i (A^-1 z_i)^T (dA) z_i,
  expressed as jax.grad of a surrogate quadratic in the mvm - no
  differentiation through CG or eigh.
- Predictive variance: LOVE-style rank-r Lanczos factorization
  A ~= Q T Q^T; with C = K_UU W^T Q cached once, per-point variance is an
  r-vector triangular solve - O(2^d r) per test point. r honors the
  reference's ``maxroot`` kwarg (skgpr.py:126).

The grid-product form treats the kernel as a product of 1D kernels per
dimension - exact for RBF, and the same modeling choice GPyTorch's grid
kernels make for non-separable families like Matern.
"""

import math
from functools import partial
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from gpim_tpu.ops.linalg import safe_cholesky

__all__ = [
    "choose_grid", "build_interp", "build_interp_sep", "ski_mvm",
    "batched_cg", "batched_pcg", "kron_eig_root",
    "split_root", "split_apply", "split_pcg", "KronRoot",
    "mgrid_split_root", "mgrid_solve_core",
    "lanczos", "ski_mll", "ski_mll_from_mvm", "make_ski_predictor",
    "grid_kernel_factors", "make_masked_grid_mvm", "grid_kr_rows",
    "grid_nystrom_var", "make_grid_predictor", "grid_cross_factors",
]

_LOG_2PI = math.log(2.0 * math.pi)


# --------------------------------------------------------------------------
# host-side grid + interpolation construction (parameter-independent)
# --------------------------------------------------------------------------

def choose_grid(X, ratio=1.0, min_size=8, max_size=512):
    """Per-dim 1D inducing grids (gpytorch choose_grid_size analog:
    grid size ~ ratio * n^(1/d), bounds = data range padded by one step)."""
    n, d = X.shape
    g = int(max(min_size, min(max_size, round(ratio * n ** (1.0 / d)))))
    grids = []
    for k in range(d):
        lo, hi = float(np.min(X[:, k])), float(np.max(X[:, k]))
        span = max(hi - lo, 1e-6)
        step = span / (g - 1) if g > 1 else span
        grids.append(np.linspace(lo - step, hi + step, g + 2,
                                 dtype=X.dtype))
    return grids


def build_interp(X, grids, mask=None):
    """Linear-interpolation weights of each point onto the Cartesian grid.

    Returns (idx, wgt): (n, 2^d) int32 flat grid indices and weights.
    Rows with mask == 0 get zero weights (padding is inert).
    """
    n, d = X.shape
    sizes = [len(g) for g in grids]
    lower_idx, lower_w = [], []
    for k in range(d):
        g = grids[k]
        step = g[1] - g[0]
        t = (X[:, k] - g[0]) / step
        i0 = np.clip(np.floor(t).astype(np.int64), 0, sizes[k] - 2)
        frac = np.clip(t - i0, 0.0, 1.0)
        lower_idx.append(i0)
        lower_w.append(1.0 - frac)
    S = 1 << d
    idx = np.zeros((n, S), np.int64)
    wgt = np.ones((n, S), X.dtype)
    for s in range(S):
        flat = np.zeros(n, np.int64)
        w = np.ones(n, X.dtype)
        for k in range(d):
            bit = (s >> k) & 1
            ik = lower_idx[k] + bit
            wk = (1.0 - lower_w[k]) if bit else lower_w[k]
            flat = flat * sizes[k] + ik
            w = w * wk
        idx[:, s] = flat
        wgt[:, s] = w
    if mask is not None:
        wgt = wgt * np.asarray(mask, X.dtype)[:, None]
    return idx.astype(np.int32), wgt


def build_interp_sep(X, grids):
    """Per-dim (separable) form of the linear interpolation: lower grid
    index and lower weight of each point in each dimension, (n, d) each.

    Because the corner weights of ``build_interp`` factor per dimension
    (wgt[i, s] = prod_k w_k[i, bit_k(s)]), this form is enough to apply W
    to any matrix whose columns are Kronecker (separable) over the grid
    dims - see :func:`kron_eig_root`.
    """
    n, d = X.shape
    i0 = np.zeros((n, d), np.int64)
    w0 = np.zeros((n, d), X.dtype)
    for k in range(d):
        g = grids[k]
        step = g[1] - g[0]
        t = (X[:, k] - g[0]) / step
        i = np.clip(np.floor(t).astype(np.int64), 0, len(g) - 2)
        i0[:, k] = i
        w0[:, k] = 1.0 - np.clip(t - i, 0.0, 1.0)
    return i0.astype(np.int32), w0


# --------------------------------------------------------------------------
# parameter-dependent pieces (inside jit)
# --------------------------------------------------------------------------

def grid_kernel_factors(kernel, p, grids):
    """Dense 1D kernel factors K_d; the output variance multiplies the
    first factor. Product-form per dim (see module docstring).

    The returned factors are pinned with ``optimization_barrier``: fusing
    the differentiated factor build (pairwise distances + exp) into the
    G-sized mode-product contractions that consume it miscompiles on the
    TPU backend (finite factor cotangents and a finite hand-chained VJP,
    NaN for the fused value_and_grad - observed at 128-sized grid dims,
    ncols >= 8). The factors are (g_k, g_k) - tiny next to their consumers
    - so the lost fusion is irrelevant; same workaround family as
    ops.linalg.safe_cholesky."""
    from gpim_tpu.kernels.functional import get_kernel_fn
    kfn = get_kernel_fn(kernel)
    d = len(grids)
    ls = jnp.broadcast_to(p["lengthscale"], (d,))
    factors = []
    for k, g in enumerate(grids):
        pk = {"lengthscale": ls[k][None],
              "variance": p["variance"] if k == 0 else 1.0}
        if "alpha" in p:
            pk["alpha"] = p["alpha"]
        factors.append(kfn(pk, g[:, None], g[:, None]))
    return list(jax.lax.optimization_barrier(tuple(factors)))


def kron_mvm(factors, v_grid):
    """(x)_d K_d applied to a grid-shaped tensor via mode products."""
    d = len(factors)
    out = v_grid
    for k in range(d):
        out = jnp.tensordot(factors[k], out, axes=([1], [k]))
        out = jnp.moveaxis(out, 0, k)
    return out


def kron_mvm_bf(factors, t):
    """Batch-first mode products: ``t`` is (b, g_1, ..., g_d); factor k is
    applied as sum_x factors[k][x, m] t[..., x, ...] (i.e. factors[k]^T -
    pass the transpose for a non-symmetric factor; kernel Gram factors are
    symmetric). Each step contracts axis 1 and appends the result axis at
    the END, so after d steps the axis order has rotated back to the
    original - no explicit transposes between gemms."""
    out = t
    for f in factors:
        out = jax.lax.dot_general(out, f, (((1,), (0,)), ((), ())))
    return out


def kron_shardable(grid_shape, mesh, axis_name="grid"):
    """True when :func:`kron_mvm_bf_sharded` applies: a real multi-device
    'grid' axis whose size divides BOTH leading grid dims (the shard dim
    and the dim the all_to_all reshard parks it on)."""
    if mesh is None or len(grid_shape) < 2:
        return False
    n = int(mesh.shape[axis_name])
    return (n > 1 and grid_shape[0] % n == 0 and grid_shape[1] % n == 0)


def kron_mvm_bf_sharded(factors, t, mesh, axis_name="grid"):
    """:func:`kron_mvm_bf` for ``t`` (b, g_1, ..., g_d) sharded over its
    FIRST grid dim (tensor axis 1), without ever materializing the full
    tensor on any device.

    Under plain GSPMD the contraction over the sharded dim all-gathers the
    whole (b, G) block to every device - the dominant per-device temp of
    the mesh-sharded masked-grid training segment (measured: two
    full-G gathered buffers of ~75 MB each at the 1M f64 shape,
    benchmarks/MULTICHIP_MEMORY.json). This explicit shard_map form keeps
    every intermediate shard-sized: contract the UNSHARDED dims first
    (local gemms), reshard once with a tiled ``all_to_all`` (moves only
    1/n_dev of the block per device), contract the previously-sharded dim
    locally, and reshard back. Communication per mvm: 2 all-to-alls of the
    SHARD size vs 1 all-gather of the FULL size.

    Requires :func:`kron_shardable`; factors must be the full square
    (g_k, g_k) tables (symmetric kernel Gram factors). Differentiable
    (all_to_all transposes to its inverse)."""
    from jax.sharding import PartitionSpec
    d = len(factors)
    spec_t = PartitionSpec(*([None, axis_name] + [None] * (d - 1)))
    repl = PartitionSpec()

    def body(t_blk, *fs):
        out = t_blk                       # (b, g1/n, g2, ..., gd)
        # dims d..2 are unsharded: contract locally, factor k on axis k+1
        for k in range(d - 1, 0, -1):
            out = jnp.tensordot(out, fs[k], axes=([k + 1], [0]))
            out = jnp.moveaxis(out, -1, k + 1)
        # park the shard on (already-transformed) dim 2, contract dim 1
        out = jax.lax.all_to_all(out, axis_name, split_axis=2,
                                 concat_axis=1, tiled=True)
        out = jnp.tensordot(out, fs[0], axes=([1], [0]))
        out = jnp.moveaxis(out, -1, 1)    # (b, m1, m2/n, m3, ...)
        return jax.lax.all_to_all(out, axis_name, split_axis=1,
                                  concat_axis=2, tiled=True)

    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec_t,) + (repl,) * d,
        out_specs=spec_t)(t, *factors)


def ski_mvm(factors, idx, wgt, noise_plus_jitter, grid_shape, v,
            sorted_corners=False):
    """A v = W K_UU W^T v + (noise + jitter) v, for v of shape (n,) or
    (n, b) batched.

    ``sorted_corners=True`` promises that the points are sorted by their
    lower-corner flat index idx[:, 0] (SKIEngine sorts once at build
    time). That unlocks the one-scatter form: corner s sits at a constant
    GRID SHIFT from the lower corner (idx[:, s] = idx[:, 0] +
    sum_k bit_k(s) * stride_k), so the whole (n, 2^d * b) weighted block
    scatters to the lower corners in ONE sorted scatter-add and the
    corner offsets are realized as d-dim rolls of the grid (cheap
    elementwise adds); the gather side mirrors it with pre-rolled grids
    and ONE sorted gather. Rolls never wrap into live data because
    build_interp clips i0 <= size-2 per dim, so rolled-in slices are
    only read/written where no point ever lands. Measured at n = 39k,
    G = 47k, 9-column block on TPU v5e: 1.17 ms vs 3.73 ms for the
    per-corner sorted scatters and 6.9 ms for the flat unsorted form
    (benchmarks/proto_mvm_variants.py v7/v1/v0) - this mvm is the
    bottleneck of the off-lattice CG training iteration.
    """
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    b = v.shape[1]
    G = int(np.prod(grid_shape))
    S = idx.shape[1]
    if sorted_corners:
        d = len(grid_shape)
        n = v.shape[0]
        idx0 = idx[:, 0]
        bits = [[(s >> k) & 1 for k in range(d)] for s in range(S)]
        dims = tuple(range(d))
        # W^T v: ONE sorted scatter of all corners' contributions to the
        # lower corner, then realize corner offsets as grid rolls
        contrib = (wgt[:, :, None] * v[:, None, :]).reshape(n, S * b)
        U0 = jnp.zeros((G, S * b), v.dtype).at[idx0].add(
            contrib, indices_are_sorted=True, mode="promise_in_bounds")
        Ug = U0.reshape(tuple(grid_shape) + (S, b))
        acc = jnp.zeros(tuple(grid_shape) + (b,), v.dtype)
        for s in range(S):
            acc = acc + jnp.roll(Ug[..., s, :], shift=bits[s], axis=dims)
        t = kron_mvm(factors, acc)
        # W t: pre-roll the grid per corner, ONE sorted gather
        T = jnp.stack([jnp.roll(t, shift=[-x for x in bits[s]], axis=dims)
                       for s in range(S)], axis=-2)
        g = T.reshape(G, S * b).at[idx0].get(
            indices_are_sorted=True, mode="promise_in_bounds")
        out = jnp.sum(wgt[:, :, None] * g.reshape(n, S, b), axis=1)
        out = out + noise_plus_jitter * v
        return out[:, 0] if squeeze else out
    # W^T v: scatter-add weighted rows into the grid
    contrib = wgt[:, :, None] * v[:, None, :]           # (n, S, b)
    u = jnp.zeros((G, b), v.dtype)
    u = u.at[idx.reshape(-1)].add(
        contrib.reshape(-1, b))
    t = kron_mvm(factors, u.reshape(grid_shape + (b,)))
    t = t.reshape(G, b)
    # W t: gather + weight
    gathered = t[idx]                                    # (n, S, b)
    out = jnp.sum(wgt[:, :, None] * gathered, axis=1)
    out = out + noise_plus_jitter * v
    return out[:, 0] if squeeze else out


def _decode_flat(flat, grid_shape):
    """Per-dim indices from flat row-major indices (any shape)."""
    rem = flat
    out = []
    for k in range(len(grid_shape) - 1, -1, -1):
        out.append(rem % grid_shape[k])
        rem = rem // grid_shape[k]
    return out[::-1]


def kron_eig_root(kernel, p, grids, grid_shape, i0, w0, rank,
                  mask=None, modes=None):
    """Rank-``rank`` root L of the SKI kernel's dominant eigenspace:
    K_hat = W K_UU W^T ~= L L^T with L = W U_r sqrt(Lam_r).

    Because K_UU is a Kronecker product, its full eigendecomposition costs
    only d tiny per-dim ``eigh`` calls, and every grid eigenvector is
    separable (a Kronecker product of per-dim eigenvector columns). The
    linear-interpolation corner weights of W are ALSO separable
    (wgt[i, s] = prod_k w_k[i, bit_k(s)]), so the 2^d corner sum
    factorizes per dimension:

        (W U_r)_{i,m} = prod_k ( w0_k[i] U_k[i0_k[i],   m_k]
                               + w1_k[i] U_k[i0_k[i]+1, m_k] )

    i.e. d per-dim row interpolations of the eigenvector tables followed by
    an elementwise product over dims - O(n r d) time AND memory with no
    dependence on the grid size G. This supersedes both earlier strategies
    (a materialized (G, r) grid root with row interpolation, and a chunked
    per-mode corner gather for giant grids): one path, exact, and it scales
    to arbitrarily large grids (the round-2 "giant-grid fallback" regime,
    e.g. 128x128x64 masked cubes, runs through this same code).

    This beats pivoted Cholesky in this regime both in quality (r can be
    hundreds without sequential MVMs: a rank-512 preconditioner drove CG
    residuals from 1e0 to 1e-4 at 64 iters on a 70%-masked 64x64x32 cube)
    and in build cost (no n-length one-hot solves). GPyTorch's analog is
    its pivoted-Cholesky preconditioner for BBMM (reference
    skgpr.py:124-131 regime); the Kronecker grid structure is what lets us
    do strictly better here.

    ``i0``/``w0`` are :func:`build_interp_sep` outputs (n, d). ``mask``
    (n,) zeroes padded rows. ``modes`` lets callers reuse one
    :func:`_kron_top_modes` result for several roots over the same
    eigenspace (train- and test-side roots must pick the SAME modes).
    """
    if modes is None:
        modes = _kron_top_modes(kernel, p, grids, rank)
    lam_top, Us, mdim = modes
    d = len(grid_shape)
    out = None
    for k in range(d):
        U = Us[k]                                     # (g_k, r_k) pruned
        g_k = U.shape[0]
        # column-select the per-mode eigenvector table (tiny gather), then
        # apply the 1D interpolation as a DENSE (n, g_k) one-hot-weighted
        # matrix times the (g_k, rank) table: a plain MXU gemm. The naive
        # alternative - row-gather U[i0] then lane-dimension column gather
        # [:, mdim[k]] - is pathologically slow on TPU (arbitrary
        # minor-dim gathers don't vectorize; measured minutes vs
        # milliseconds at n = 314k, rank = 512).
        U_sel = U[:, mdim[k]]                          # (g_k, rank)
        cells = jnp.arange(g_k, dtype=i0.dtype)[None, :]
        P = (w0[:, k, None] * (i0[:, k, None] == cells)
             + (1.0 - w0[:, k])[:, None]
             * ((i0[:, k, None] + 1) == cells))        # (n, g_k) interp
        cols = jnp.dot(P, U_sel, precision=jax.lax.Precision.HIGHEST)
        out = cols if out is None else out * cols
    out = out * jnp.sqrt(lam_top)[None, :]
    if mask is not None:
        out = out * mask[:, None]
    return out


def _kron_top_modes(kernel, p, grids, rank, dim_cap=None):
    """Per-dim eigh + top-``rank`` Kronecker modes (shared selection logic
    so train- and test-side roots always pick the same eigenspace).

    Returns (lam_top (rank,), pruned per-dim eigenvector tables Us
    [(g_k, r_k)], per-dim mode indices mdim [(rank,)] INTO the pruned
    tables). Per-dim spectra are pruned to their top min(g_k, rank)
    values first - a product using a per-dim index beyond ``rank`` is
    dominated by >= rank larger products, so pruning is lossless and keeps
    the materialized product spectrum at prod_k min(g_k, rank) entries
    instead of G.

    ``dim_cap`` optionally tightens the per-dim pruning to min(g_k, rank,
    dim_cap). Unlike the rank-pruning above this is a HEURISTIC: with
    roughly balanced per-dim spectral decay the top-``rank`` products
    live in a small per-dim rectangle (measured at the 1M headline
    config: every top-512 mode of a 132x132x64 grid has per-dim index
    < 32, so cap 32 leaves the selection bit-identical), and the capped
    tables shrink every mode-product transform that consumes them (the
    per-CG-iteration P^-1/2 applies went 19.9 -> 12.7 ms at G ~ 1.1M).
    A too-small cap cannot break correctness - every estimator is exact
    for ANY SPD preconditioner - it can only cost CG iterations.
    """
    factors = grid_kernel_factors(kernel, p, grids)
    cap = rank if dim_cap is None else min(rank, int(dim_cap))
    lams, Us = [], []
    for f in factors:
        lam, U = jnp.linalg.eigh(f)                  # ascending
        r_k = int(min(f.shape[0], cap))
        lams.append(lam[::-1][:r_k])                 # descending, pruned
        Us.append(U[:, ::-1][:, :r_k])
    lam_prod = lams[0]
    for lam in lams[1:]:
        lam_prod = (lam_prod[:, None] * lam[None, :]).reshape(-1)
    rank = int(min(rank, lam_prod.shape[0]))
    lam_top, flat_modes = jax.lax.top_k(lam_prod, rank)
    lam_top = jnp.maximum(lam_top, 0.0)
    pruned_shape = tuple(l.shape[0] for l in lams)
    mdim = _decode_flat(flat_modes, pruned_shape)     # per-dim (rank,)
    return lam_top, Us, mdim


# --------------------------------------------------------------------------
# split preconditioning: the f32-stable form of the Woodbury solve
# --------------------------------------------------------------------------
#
# Applying P^-1 = (noise I + L L^T)^-1 via the Woodbury identity computes
# (v - L C^-1 L^T v)/noise: for v in the top eigenspace the two terms agree
# to ~noise/lam and the difference carries a relative error of order
# sqrt(G) * eps * lam/noise. At the reference's headline scale (G ~ 1.2M,
# lam_max/noise ~ 3e5) that error EXCEEDS the true value ~30x: the PCG
# quadratic form r^T P^-1 r comes out NEGATIVE, the breakdown guard fires
# on iteration 1, and the "solution" carries a ~150% residual (observed on
# TPU f32 - the round-3 1M-point benchmark regression). The fix is to run
# PLAIN CG on the split-preconditioned operator P^-1/2 A P^-1/2 with
# P^+-1/2 applied through an ORTHONORMAL Nystrom basis
#
#     N = L^T L = Un lam_n Un^T,   Q = L Un lam_n^-1/2   (Q^T Q = I),
#     P^-1/2 v = v/sqrt(noise) + Q [(1/sqrt(lam_n+noise)
#                                    - 1/sqrt(noise)) (Q^T v)]
#
# whose amplification is only sqrt(lam/noise): the transformed residual is
# maintained by the CG recurrence (never by a P apply), r^T z = |r~|^2 is
# nonnegative by construction, and the recovered tridiagonals are directly
# the Lanczos matrices of the split operator (the SLQ contract). As a
# bonus, (Q, lam_n) is NOISE-INDEPENDENT, so the whole factorization hoists
# out of the training loop (the old path re-ran a Cholesky of
# noise I + L^T L inside every loss evaluation).


def _orth_eig(N):
    """Shared eigendecomposition + pruning of a Nystrom core N = Lp^T Lp:
    returns (lam_n clamped/pruned, Un, inv_root with pruned columns
    zeroed). The operand is pinned like ops.linalg.safe_cholesky (TPU
    whole-graph fusion miscompile family); the 1e-6-relative prune drops
    numerically-null directions so the orthonormalized basis stays
    well-scaled. Used by split_root, mgrid_split_root and _nystrom_bmat -
    ONE place to change the threshold or the barrier workaround."""
    lam_n, Un = jnp.linalg.eigh(jax.lax.optimization_barrier(N))
    lam_n = jnp.maximum(lam_n, 0.0)
    good = lam_n > 1e-6 * jnp.max(lam_n)
    inv_root = jnp.where(
        good, 1.0 / jnp.sqrt(jnp.maximum(lam_n, 1e-30)), 0.0)
    lam_n = jnp.where(good, lam_n, 0.0)
    return lam_n, Un, inv_root


def split_root(Lp, LtL=None):
    """Orthonormal Nystrom basis of the preconditioner root: returns
    (Q, lam_n, Un) with Q^T Q = I (up to pruned null columns) and
    Lp Lp^T = Q diag(lam_n) Q^T. Noise-independent: compute once per
    training segment. ``LtL`` optionally supplies a precomputed Lp^T Lp."""
    n, r = Lp.shape
    if r == 0:
        z = jnp.zeros((0,), Lp.dtype)
        return Lp, z, jnp.zeros((0, 0), Lp.dtype)
    if LtL is None:
        LtL = jnp.dot(Lp.T, Lp, precision=jax.lax.Precision.HIGHEST)
    lam_n, Un, inv_root = _orth_eig(LtL)
    Q = jnp.dot(Lp, Un * inv_root[None, :],
                precision=jax.lax.Precision.HIGHEST)
    return Q, lam_n, Un


def split_apply(Q, lam_n, noise_pj, vec_axis=0):
    """Returns (pisqrt, logdetP) for P = noise_pj I + Q diag(lam_n) Q^T:
    ``pisqrt(v)`` applies P^-1/2 to a vector (n,), or to a block laid out
    per ``vec_axis`` ((n, b) for 0, batch-first (b, n) for 1 - see
    :func:`batched_pcg`); ``logdetP`` is exact. ``Q`` is either a dense
    (n, r) orthonormal basis (:func:`split_root`) or a factored
    :class:`KronRoot` (:func:`mgrid_split_root`). Shapes degrade
    gracefully to rank 0 (pisqrt = v/sqrt(noise))."""
    s = 1.0 / jnp.sqrt(noise_pj)
    d = 1.0 / jnp.sqrt(lam_n + noise_pj) - s
    bf = vec_axis == 1

    if isinstance(Q, KronRoot):
        QT, Qm = _kron_root_ops(Q, batch_first=bf)
        n_total = Q.mask.shape[0]

        def pisqrt(v):
            squeeze = v.ndim == 1
            if squeeze:
                v = v[None, :] if bf else v[:, None]
            c = QT(v)
            out = s * v + Qm(c * d[None, :] if bf else d[:, None] * c)
            return (out[0] if bf else out[:, 0]) if squeeze else out
    else:
        n_total = Q.shape[0]

        def pisqrt(v):
            squeeze = v.ndim == 1
            if squeeze:
                v = v[None, :] if bf else v[:, None]
            if bf:
                c = jnp.dot(v, Q, precision=jax.lax.Precision.HIGHEST)
                out = s * v + jnp.dot(c * d[None, :], Q.T,
                                      precision=jax.lax.Precision.HIGHEST)
            else:
                c = jnp.dot(Q.T, v, precision=jax.lax.Precision.HIGHEST)
                out = s * v + jnp.dot(Q, d[:, None] * c,
                                      precision=jax.lax.Precision.HIGHEST)
            return (out[0] if bf else out[:, 0]) if squeeze else out

    logdetP = (n_total * jnp.log(noise_pj)
               + jnp.sum(jnp.log1p(lam_n / noise_pj)))
    return pisqrt, logdetP


class KronRoot(NamedTuple):
    """Factored form of the orthonormalized Nystrom basis for a MASKED
    Kronecker eigen-root,  Lp = M . ((x)_k U_k)[:, sel] . diag(rl),
    Q = Lp Un lam_n^-1/2.  Products with Q / Q^T run as d per-axis mode
    contractions plus a SORTED r-row gather/scatter of the Kronecker mode
    tensor and one (r, r) gemm - never materializing the (G, r) matrix.
    At reference scale (G ~ 1e6, r = 512) the dense basis costs ~2 GB of
    HBM and each P^-1/2 apply is bound on re-reading it (~4.3 GB/apply);
    the factored apply moves O(G b) instead (measured: see
    benchmarks/BASELINE_MEASURED.md structured-engine roofline)."""
    Us: Tuple[jax.Array, ...]   # per-dim pruned eigenvector tables (g_k, r_k)
    mflat: jax.Array            # (r,) int32 flat mode index into the pruned
    #                             tensor, SORTED ascending (gather/scatter
    #                             sortedness promise)
    rl: jax.Array               # (r,) sqrt(lam_top), in mflat order
    C: jax.Array                # (r, r) = Un diag(lam_n^-1/2)
    mask: jax.Array             # (G,) observed-cell mask


def _kron_root_ops(q, batch_first=False):
    """(QT, Qm) closures for a :class:`KronRoot`. Default layout: QT maps
    (G, b) -> (r, b), Qm maps (r, b) -> (G, b). With ``batch_first``,
    QT maps (b, G) -> (b, r) and Qm maps (b, r) -> (b, G) (see
    :func:`batched_pcg` on why batch-first is the fast CG layout)."""
    grid_shape = tuple(U.shape[0] for U in q.Us)
    pruned = tuple(U.shape[1] for U in q.Us)
    G = int(np.prod(grid_shape))
    Gp = int(np.prod(pruned))
    d = len(q.Us)

    if batch_first:
        UsT = tuple(U.T for U in q.Us)

        def QT(v):                                    # (b, G) -> (b, r)
            b = v.shape[0]
            t = kron_mvm_bf(q.Us, (q.mask[None, :] * v).reshape(
                (b,) + grid_shape))                   # applies U_k^T
            sel = t.reshape(b, Gp).at[:, q.mflat].get(
                indices_are_sorted=True, unique_indices=True,
                mode="promise_in_bounds")
            return jnp.dot(sel * q.rl[None, :], q.C,
                           precision=jax.lax.Precision.HIGHEST)

        def Qm(w):                                    # (b, r) -> (b, G)
            b = w.shape[0]
            c = q.rl[None, :] * jnp.dot(
                w, q.C.T, precision=jax.lax.Precision.HIGHEST)
            t = jnp.zeros((b, Gp), w.dtype).at[:, q.mflat].set(
                c, indices_are_sorted=True, unique_indices=True,
                mode="promise_in_bounds")
            t = kron_mvm_bf(UsT, t.reshape((b,) + pruned))  # applies U_k
            return q.mask[None, :] * t.reshape(b, G)

        return QT, Qm

    def QT(v):                                        # (G, b) -> (r, b)
        b = v.shape[1]
        t = (q.mask[:, None] * v).reshape(grid_shape + (b,))
        for k in range(d):
            t = jnp.tensordot(q.Us[k], t, axes=([0], [k]))
            t = jnp.moveaxis(t, 0, k)
        sel = t.reshape(Gp, b).at[q.mflat].get(
            indices_are_sorted=True, unique_indices=True,
            mode="promise_in_bounds")
        return jnp.dot(q.C.T, q.rl[:, None] * sel,
                       precision=jax.lax.Precision.HIGHEST)

    def Qm(w):                                        # (r, b) -> (G, b)
        b = w.shape[1]
        c = q.rl[:, None] * jnp.dot(q.C, w,
                                    precision=jax.lax.Precision.HIGHEST)
        t = jnp.zeros((Gp, b), w.dtype).at[q.mflat].set(
            c, indices_are_sorted=True, unique_indices=True,
            mode="promise_in_bounds")
        t = t.reshape(pruned + (b,))
        for k in range(d):
            t = jnp.tensordot(q.Us[k], t, axes=([1], [k]))
            t = jnp.moveaxis(t, 0, k)
        return q.mask[:, None] * t.reshape(G, b)

    return QT, Qm


def _kr_gram(sel, lam_top, mask_flat, block_bytes=256 * 1024 * 1024):
    """N = Lp^T Lp for the masked Kronecker eigen-root Lp =
    diag(mask) KR(sel) diag(sqrt(lam_top)), accumulated over leading-dim
    row blocks WITHOUT ever materializing the (G, r) root. Blocks are
    sized to ~``block_bytes`` so the gemms stay MXU-efficient (one row at
    a time costs ~2 s of launch/read overhead per rebuild at G ~ 1M)
    while the transient stays bounded: at G ~ 1M, r = 1024 this replaces
    a ~4.3 GB f32 root with ~256 MB blocks at the same total flops."""
    d = len(sel)
    r = int(lam_top.shape[0])
    g1 = int(sel[0].shape[0])
    rest = 1
    for k in range(1, d):
        rest *= int(sel[k].shape[0])
    root_lam = jnp.sqrt(lam_top)
    tb = max(1, min(g1, block_bytes // max(4 * rest * r, 1)))
    nb = -(-g1 // tb)                       # ceil; tail block zero-padded
    pad = nb * tb - g1
    sel0 = jnp.pad(sel[0], ((0, pad), (0, 0)))
    mask2d = jnp.pad(mask_flat.reshape(g1, -1), ((0, pad), (0, 0)))

    def step(N, i):
        r0 = jax.lax.dynamic_slice_in_dim(sel0, i * tb, tb)     # (tb, r)
        mb = jax.lax.dynamic_slice_in_dim(mask2d, i * tb, tb)   # (tb, rest)
        cols = r0[:, None, :]                                   # (tb, 1, r)
        for k in range(1, d):
            cols = (cols[:, :, None, :] * sel[k][None, None, :, :]).reshape(
                tb, -1, r)
        cols = (cols * root_lam[None, None, :]
                * mb[:, :, None]).reshape(tb * rest, r)
        return N + jnp.dot(cols.T, cols,
                           precision=jax.lax.Precision.HIGHEST), None

    N0 = jnp.zeros((r, r), lam_top.dtype)
    N, _ = jax.lax.scan(step, N0, jnp.arange(nb))
    return N


def mgrid_split_root(kernel, p, grids, grid_shape, mask_flat, rank,
                     dim_cap="auto"):
    """Structured :func:`split_root` for the masked-grid operator: returns
    (KronRoot, lam_n, Un, modes) with modes = (lam_top, Us, mdim, sel) in
    the SORTED-flat-mode order every returned piece shares (``sel`` are
    the per-dim mode tables Us[k][:, mdim[k]] the prediction paths
    consume). Noise-independent, like split_root; NO (G, r) matrix is
    materialized even transiently (see _kr_gram).

    ``dim_cap``: "auto" applies the ~4 rank^(1/d) per-dim candidate cap
    (see _kron_top_modes) - right for the TRAINING preconditioner, where a
    cap can only cost CG iterations. Pass None for UNCAPPED selection:
    prediction paths must, because their Nystrom variance reuses this
    eigenspace as a fixed-rank approximation with no CG backstop, and
    under strongly anisotropic lengthscales the true top modes can live
    outside the capped rectangle."""
    d = len(grids)
    if dim_cap == "auto":
        dim_cap = max(16, int(np.ceil(4.0 * rank ** (1.0 / max(d, 1)))))
    lam_top, Us, mdim = _kron_top_modes(kernel, p, grids, rank,
                                        dim_cap=dim_cap)
    pruned = tuple(U.shape[1] for U in Us)
    flat = mdim[0]
    for k in range(1, len(pruned)):
        flat = flat * pruned[k] + mdim[k]
    order = jnp.argsort(flat)
    mflat = flat[order].astype(jnp.int32)
    lam_top = lam_top[order]
    mdim = [m[order] for m in mdim]
    sel = [Us[k][:, mdim[k]] for k in range(len(Us))]
    N = _kr_gram(sel, lam_top, mask_flat)
    lam_n, Un, inv_root = _orth_eig(N)
    q = KronRoot(Us=tuple(Us), mflat=mflat, rl=jnp.sqrt(lam_top),
                 C=Un * inv_root[None, :], mask=mask_flat)
    return q, lam_n, Un, (lam_top, Us, mdim, sel)


def split_pcg(mvm, pisqrt, B, iters, return_iters=False, vec_axis=0):
    """Split-preconditioned CG solve of A X = B: plain CG on
    At = P^-1/2 A P^-1/2 with X = P^-1/2 Xt mapped back at the end.
    Same outputs as :func:`batched_pcg` (the tridiagonals are the split
    operator's Lanczos matrices - identical contract). ``vec_axis`` as in
    :func:`batched_pcg`; mvm and pisqrt must share the layout."""
    Bt = pisqrt(B)
    At = lambda v: pisqrt(mvm(pisqrt(v)))
    out = batched_pcg(At, lambda r: r, Bt, iters,
                      return_iters=return_iters, vec_axis=vec_axis)
    return (pisqrt(out[0]),) + tuple(out[1:])


def batched_pcg(mvm, pinv, B, iters, return_iters=False, vec_axis=0,
                x0=None, tol_ref=None):
    """Preconditioned conjugate gradients for A X = B, all columns at once.

    ``x0`` warm-starts the solve (X = x0 + CG solution of A D = B - A x0);
    the recovered tridiagonals then belong to the RESIDUAL's Lanczos
    process, not B's - callers using them for SLQ must start cold.
    ``tol_ref`` overrides the convergence reference |B|^2 per column (pass
    the ORIGINAL rhs norms when warm-starting, else the relative exit
    tolerance tightens with the shrinking initial residual and the warm
    start saves nothing).

    ``vec_axis`` selects the layout: 0 means B is (n, b) with each solution
    a COLUMN; 1 means B is (b, n) batch-first with each solution a ROW. Use
    batch-first whenever the mvm tolerates it: TPU f32 arrays tile the
    minormost dim to 128 lanes, so a (n, 9) CG state physically moves ~14x
    its logical bytes through HBM on every vector op, while (9, n) only
    pads the 8-sublane dim (~1.8x).

    Same frozen-column contract as :func:`batched_cg`; the recovered
    tridiagonals are the Lanczos matrices of the *split-preconditioned*
    operator P^-1/2 A P^-1/2 started from P^-1/2 b_j / |.|, which is what
    preconditioned SLQ needs (logdet A = logdet P + SLQ estimate when the
    probes are drawn from N(0, P)).

    With ``return_iters=True`` a fourth output is appended: the REALIZED
    iteration count (the while_loop trip count, i.e. iterations until the
    last column converged or the ``iters`` cap) - instrumentation for tying
    the ``cg_iters`` budget to measured convergence (benchmarks/
    ski_roofline.py).
    """
    ax = vec_axis
    if ax == 0:
        ex = lambda s: s[None, :]      # per-column scalar -> broadcast
    else:
        ex = lambda s: s[:, None]
    if x0 is None:
        X0 = jnp.zeros_like(B)
        R0 = B
    else:
        X0 = x0
        R0 = B - mvm(x0)
    Z0 = pinv(R0)
    P0 = Z0
    rz0 = jnp.sum(R0 * Z0, axis=ax)
    rs0 = jnp.sum(R0 * R0, axis=ax)
    rs_ref = rs0 if tol_ref is None else tol_ref
    eps = jnp.finfo(B.dtype).eps
    tol = jnp.maximum(rs_ref, 1e-30) * (100.0 * eps) ** 2
    b = B.shape[1 - ax]
    # preallocated tridiag buffers; untouched tail rows stay the decoupled
    # identity block (t_diag = 1, t_off = 0) the SLQ contract requires
    Td0 = jnp.ones((iters, b), B.dtype)
    To0 = jnp.zeros((iters, b), B.dtype)

    # ``iters`` is a CAP, not a trip count: with the Kronecker-eigen
    # preconditioner the solve typically converges in < 10 iterations
    # (measured: rel-res 5e-9 after 4 on the 70%-masked 64x64x32 cube), so
    # a while_loop that exits when every column is done cuts the dominant
    # per-training-step cost by the same factor. Nothing differentiates
    # through this loop (ski_mll wraps it in a custom VJP; prediction is
    # value-only), so while_loop's non-reverse-differentiability is free.
    def cond(carry):
        k = carry[0]
        done = carry[8]
        return (k < iters) & jnp.logical_not(jnp.all(done))

    def body(carry):
        k, X, R, Z, P, rz_old, alpha_prev, beta_prev, done, Td, To = carry
        AP = mvm(P)
        denom = jnp.sum(P * AP, axis=ax)
        live = jnp.logical_not(done)
        alpha_raw = rz_old / jnp.where(denom > 0, denom, 1.0)
        alpha = jnp.where(live & (denom > 0), alpha_raw, 0.0)
        X = X + ex(alpha) * P
        R = R - ex(alpha) * AP
        Z = pinv(R)
        rz_new = jnp.sum(R * Z, axis=ax)
        rs_new = jnp.sum(R * R, axis=ax)
        beta_raw = rz_new / jnp.where(rz_old > 0, rz_old, 1.0)
        beta = jnp.where(live, beta_raw, 0.0)
        P = jnp.where(ex(live), Z + ex(beta) * P, P)
        safe_alpha = jnp.where(alpha > 0, alpha, 1.0)
        safe_alpha_prev = jnp.where(alpha_prev > 0, alpha_prev, 1.0)
        t_diag = jnp.where(
            live, 1.0 / safe_alpha + beta_prev / safe_alpha_prev, 1.0)
        t_off = jnp.where(
            live, jnp.sqrt(jnp.maximum(beta, 0.0)) / safe_alpha, 0.0)
        done_new = done | (rs_new < tol) | (denom <= 0) | (rz_new <= 0)
        t_off = jnp.where(done_new & live, 0.0, t_off)
        Td = jax.lax.dynamic_update_index_in_dim(Td, t_diag, k, 0)
        To = jax.lax.dynamic_update_index_in_dim(To, t_off, k, 0)
        return (k + 1, X, R, Z, P, rz_new, alpha, beta, done_new, Td, To)

    init = (jnp.asarray(0), X0, R0, Z0, P0, rz0,
            jnp.ones_like(rz0), jnp.zeros_like(rz0),
            rs0 < tol, Td0, To0)
    out = jax.lax.while_loop(cond, body, init)
    X, t_diags, t_offs = out[1], out[9], out[10]
    if return_iters:
        return X, t_diags, t_offs, out[0]
    return X, t_diags, t_offs


def batched_cg(mvm, B, iters, vec_axis=0, return_iters=False,
               x0=None, tol_ref=None):
    """Conjugate gradients for A X = B, all columns at once.

    Also returns the Lanczos tridiagonal coefficients recovered from the CG
    alphas/betas (per column) for stochastic Lanczos quadrature. Converged
    columns are FROZEN: their state stops updating and their remaining
    tridiag entries become an identity block (t_diag = 1, t_off = 0) that is
    decoupled from e1 and therefore contributes exactly zero to the SLQ
    quadrature - without this, post-convergence round-off emits spurious
    Ritz values that wreck the logdet estimate.
    """
    # identity preconditioner: shares the adaptive while_loop machinery of
    # batched_pcg (same per-iteration math, cap = ``iters``)
    return batched_pcg(mvm, lambda r: r, B, iters, vec_axis=vec_axis,
                       return_iters=return_iters, x0=x0, tol_ref=tol_ref)


def _slq_from_tridiag(t_diags, t_offs, probe_sqnorms):
    """sum_i |z_i|^2 e1^T log(T_i) e1 / p  (Rademacher probes)."""
    m, p = t_diags.shape

    def one(diag, off, sq):
        T = (jnp.diag(diag)
             + jnp.diag(off[:-1], 1)
             + jnp.diag(off[:-1], -1))
        # operand pinned like ops.linalg.safe_cholesky: a batched eigh whose
        # operand is an otherwise-dead fused pipeline is exactly the
        # whole-graph miscompile pattern (observed here on the TPU backend:
        # finite value-only program, NaN under value_and_grad at G = 1M)
        lam, U = jnp.linalg.eigh(jax.lax.optimization_barrier(T))
        lam = jnp.maximum(lam, 1e-30)
        return sq * jnp.sum(U[0, :] ** 2 * jnp.log(lam))

    vals = jax.vmap(one, in_axes=(1, 1, 0))(t_diags, t_offs, probe_sqnorms)
    return jnp.mean(vals)


# --------------------------------------------------------------------------
# MLL with custom VJP (BBMM-style trace-estimated gradients)
# --------------------------------------------------------------------------

def _make_mvm(kernel, grids, grid_shape, idx, wgt, sorted_corners=False):
    def mvm(p, noise_pj, v):
        factors = grid_kernel_factors(kernel, p, grids)
        return ski_mvm(factors, idx, wgt, noise_pj, grid_shape, v,
                       sorted_corners=sorted_corners)
    return mvm


def ski_mll(kernel, grids, grid_shape, idx, wgt, cg_iters, g0,
            sorted_corners=False, return_iters=False):
    """Returns loss_core(p, noise_pj, yc, Q, lam_n) = 0.5 yc^T A^-1 yc
    + 0.5 logdet A with split-preconditioned CG solves and trace-estimated
    custom gradients (the BBMM estimator family, Gardner et al. 2018 -
    GPyTorch's engine for the reference's SKI path, skgpr.py:124-131).

    ``(Q, lam_n)`` is the orthonormal Nystrom form of the preconditioner
    P = noise I + Q diag(lam_n) Q^T - build it with :func:`kron_eig_root`
    + :func:`split_root` (rank 0 disables preconditioning exactly). It may
    be STALE (built at earlier hyperparameters): every estimator below is
    exact-in-expectation for ANY SPD P, staleness only costs CG iterations
    and probe variance, so callers rebuild it every few optimizer steps.
    It is also NOISE-INDEPENDENT, so nothing preconditioner-shaped runs
    inside the training loop at all. Gradients do not flow into it.

    ``g0`` (n, p) is a fixed probe basis with E[g g^T] = I (Rademacher or
    standard-normal), used DIRECTLY as probes z~ of the split operator
    At = P^-1/2 A P^-1/2 (equivalently z = P^1/2 z~ ~ N(0, P)):
    logdet A = logdet P + E[SLQ of At]. The gradient uses
    s_i^T dA w_i with s_i = A^-1 z_i = P^-1/2 At^-1 z~_i and
    w_i = P^-1 z_i = P^-1/2 z~_i, which is unbiased
    (E[w z^T] = P^-1 E[z z^T] = I) WITHOUT differentiating through the
    preconditioner. The caller adds constants and the padded-logdet
    correction outside. See the split-preconditioning block comment above
    :func:`split_root` for why plain Woodbury PCG is numerically unsafe
    here."""
    return ski_mll_from_mvm(
        _make_mvm(kernel, grids, grid_shape, idx, wgt,
                  sorted_corners=sorted_corners), cg_iters, g0,
        return_iters=return_iters)


def ski_mll_from_mvm(mvm, cg_iters, g0, vec_axis=0, constrain=None,
                     return_iters=False, warm_start=False):
    """:func:`ski_mll` core over an arbitrary ``mvm(p, noise_pj, v)``
    (used by both the interpolation operator and the masked-grid operator;
    same estimator contract as documented on ski_mll). ``vec_axis`` as in
    :func:`batched_pcg`: with 1, ``g0`` is (p, n) batch-first and the mvm
    must take (b, n) blocks.

    With ``return_iters=True`` the returned core yields
    ``(loss, realized_cg_iters)`` - the while_loop trip count as a float
    scalar, differentiation-inert - so training loops can record a
    per-Adam-step CG-convergence time series (the roofline instrumentation
    of benchmarks/mgrid_iter_trace.py); the default single-scalar contract
    is unchanged.

    ``constrain`` optionally pins the sharding of every 2D CG-state block
    (the RHS and each mvm output). Under a mesh, GSPMD then partitions the
    n-sized CG state and the operator's contractions across chips and
    inserts the collectives itself (for the Kronecker mvm: the leading
    grid axis shards, the contraction over it becomes one reduce per CG
    iteration) - pass e.g. ``lambda x: with_sharding_constraint(x,
    NamedSharding(mesh, P(None, 'grid')))`` for batch-first blocks."""
    bf = vec_axis == 1
    if constrain is not None:
        raw_mvm = mvm

        def mvm(p, noise_pj, v):                      # noqa: F811
            out = raw_mvm(p, noise_pj, v)
            return constrain(out) if out.ndim == 2 else out

    @partial(jax.custom_vjp, nondiff_argnums=())
    def core(p, noise_pj, yc, Q, lam_n):
        out, _ = _fwd(p, noise_pj, yc, Q, lam_n)
        return out

    def _fwd(p, noise_pj, yc, Q, lam_n):
        (out, _), res = _fwd_full(p, noise_pj, yc, Q, lam_n)
        return out, res

    def _fwd_full(p, noise_pj, yc, Q, lam_n):
        pisqrt, logdetP = split_apply(Q, lam_n, noise_pj,
                                      vec_axis=vec_axis)
        At = lambda v: pisqrt(mvm(p, noise_pj, pisqrt(v)))
        if bf:
            B = jnp.concatenate([pisqrt(yc[None, :]), g0], axis=0)
        else:
            B = jnp.concatenate([pisqrt(yc[:, None]), g0], axis=1)
        if constrain is not None:
            B = constrain(B)
        X, t_diags, t_offs, k_real = batched_cg(At, B, cg_iters,
                                                vec_axis=vec_axis,
                                                return_iters=True)
        # the sliced loop outputs are pinned AFTER slicing: on the TPU
        # backend, feeding a strided column slice of a loop output into the
        # differentiated mvm of the backward pass miscompiles the LOOP
        # itself (its X output turns NaN; observed at 128-sized leading
        # grid dims, value-only program bit-exact and finite). A barrier on
        # the whole X does NOT help; barriers on the slices do - the same
        # workaround family as ops.linalg.safe_cholesky.
        if bf:
            Xa, Xs = jax.lax.optimization_barrier((X[0], X[1:]))
        else:
            Xa, Xs = jax.lax.optimization_barrier((X[:, 0], X[:, 1:]))
        alpha = pisqrt(Xa)                           # A^-1 yc
        solves = pisqrt(Xs)                          # A^-1 z_i
        w = jax.lax.optimization_barrier(pisqrt(g0))  # P^-1 z = P^-1/2 z~
        sqnorms = jnp.sum(g0 * g0, axis=vec_axis)    # |z~|^2 (= n exactly)
        td, to = jax.lax.optimization_barrier(
            (t_diags[:, 1:], t_offs[:, 1:]))         # sliced: see above
        logdet = logdetP + _slq_from_tridiag(td, to, sqnorms)
        quad = 0.5 * jnp.dot(yc, alpha)
        out = quad + 0.5 * logdet
        return ((out, k_real.astype(out.dtype)),
                (p, noise_pj, alpha, solves, w, Q, lam_n))

    def _bwd(res, g):
        p, noise_pj, alpha, solves, w, Q, lam_n = res
        n_probes = solves.shape[1 - vec_axis]

        def surrogate(p_, noise_pj_):
            # d quad = -0.5 a^T (dA) a ; d logdet = tr(A^-1 dA)
            #   ~= (1/p) sum s_i^T (dA) w_i,  s_i = A^-1 z_i, w_i = P^-1 z_i
            quad_term = -0.5 * jnp.dot(alpha, mvm(p_, noise_pj_, alpha))
            w_sg = jax.lax.stop_gradient(w)
            solves_sg = jax.lax.stop_gradient(solves)
            trace_term = 0.5 * jnp.sum(
                solves_sg * mvm(p_, noise_pj_, w_sg)) / n_probes
            return quad_term + trace_term

        gp, gn = jax.grad(surrogate, argnums=(0, 1))(p, noise_pj)
        gp = jax.tree_util.tree_map(lambda x: g * x, gp)
        # Q may be a KronRoot pytree with integer leaves (mflat): integer
        # primals take float0 cotangents
        zq = jax.tree_util.tree_map(
            lambda a: (jnp.zeros_like(a)
                       if jnp.issubdtype(a.dtype, jnp.inexact)
                       else np.zeros(a.shape, jax.dtypes.float0)), Q)
        return (gp, g * gn, g * alpha, zq, jnp.zeros_like(lam_n))

    core.defvjp(_fwd, _bwd)
    if warm_start:
        # EXPERIMENTAL (VERDICT r3 item 2): carry the previous Adam step's
        # CG solutions (split space - the basis is fixed within a training
        # segment) as this step's init. The gradient estimator is
        # unchanged (it uses the converged solves, init-independent up to
        # CG tolerance); the SLQ logdet VALUE comes from the residual's
        # Lanczos process and is biased once X0 != 0, so the recorded loss
        # trace is approximate under warm start - measured consequences in
        # benchmarks/BASELINE_MEASURED.md before this ever becomes a
        # default.
        @partial(jax.custom_vjp, nondiff_argnums=())
        def core_ws(p, noise_pj, yc, Q, lam_n, X0):
            out, _ = _fwd_ws(p, noise_pj, yc, Q, lam_n, X0)
            return out

        def _fwd_ws(p, noise_pj, yc, Q, lam_n, X0):
            pisqrt, logdetP = split_apply(Q, lam_n, noise_pj,
                                          vec_axis=vec_axis)
            At = lambda v: pisqrt(mvm(p, noise_pj, pisqrt(v)))
            if bf:
                B = jnp.concatenate([pisqrt(yc[None, :]), g0], axis=0)
            else:
                B = jnp.concatenate([pisqrt(yc[:, None]), g0], axis=1)
            if constrain is not None:
                B = constrain(B)
                X0 = constrain(X0)
            rs_ref = jnp.sum(B * B, axis=vec_axis)
            X, t_diags, t_offs, k_real = batched_cg(
                At, B, cg_iters, vec_axis=vec_axis, return_iters=True,
                x0=X0, tol_ref=rs_ref)
            if bf:
                Xa, Xs = jax.lax.optimization_barrier((X[0], X[1:]))
            else:
                Xa, Xs = jax.lax.optimization_barrier((X[:, 0], X[:, 1:]))
            alpha = pisqrt(Xa)
            solves = pisqrt(Xs)
            w = jax.lax.optimization_barrier(pisqrt(g0))
            sqnorms = jnp.sum(g0 * g0, axis=vec_axis)
            td, to = jax.lax.optimization_barrier(
                (t_diags[:, 1:], t_offs[:, 1:]))
            logdet = logdetP + _slq_from_tridiag(td, to, sqnorms)
            quad = 0.5 * jnp.dot(yc, alpha)
            out = quad + 0.5 * logdet
            return ((out, (X, k_real.astype(out.dtype))),
                    (p, noise_pj, alpha, solves, w, Q, lam_n))

        def _bwd_ws(res, g):
            solves = res[3]
            if bf:
                z0 = jnp.zeros((solves.shape[0] + 1, solves.shape[1]),
                               solves.dtype)
            else:
                z0 = jnp.zeros((solves.shape[0], solves.shape[1] + 1),
                               solves.dtype)
            return _bwd(res, g[0]) + (z0,)

        core_ws.defvjp(_fwd_ws, _bwd_ws)
        return core_ws
    if not return_iters:
        return core

    @partial(jax.custom_vjp, nondiff_argnums=())
    def core_it(p, noise_pj, yc, Q, lam_n):
        out, _ = _fwd_full(p, noise_pj, yc, Q, lam_n)
        return out

    def _bwd_it(res, g):
        # g = (loss cotangent, iters cotangent); the trip count is
        # differentiation-inert instrumentation
        return _bwd(res, g[0])

    core_it.defvjp(_fwd_full, _bwd_it)
    return core_it


# --------------------------------------------------------------------------
# prediction: SKI mean + LOVE-style rank-r variance
# --------------------------------------------------------------------------

def lanczos(mvm, v0, rank):
    """Lanczos with full reorthogonalization; returns Q (rank, n), T (rank,
    rank). Static rank; breakdown handled by the maximum clamps."""
    n = v0.shape[0]
    q0 = v0 / jnp.maximum(jnp.linalg.norm(v0), 1e-30)

    def step(carry, k):
        Q, q_prev, q, beta_prev = carry
        w = mvm(q)
        alpha = jnp.dot(q, w)
        w = w - alpha * q - beta_prev * q_prev
        # full reorthogonalization against everything accumulated so far
        w = w - Q.T @ (Q @ w)
        beta = jnp.linalg.norm(w)
        q_next = w / jnp.maximum(beta, 1e-30)
        Q = Q.at[k].set(q)
        return (Q, q, q_next, beta), (alpha, beta)

    Q0 = jnp.zeros((rank, n), v0.dtype)
    (Q, _, _, _), (alphas, betas) = jax.lax.scan(
        step, (Q0, jnp.zeros_like(q0), q0, jnp.asarray(0.0, v0.dtype)),
        jnp.arange(rank))
    T = (jnp.diag(alphas)
         + jnp.diag(betas[:-1], 1)
         + jnp.diag(betas[:-1], -1))
    return Q, T


def make_ski_predictor(kernel, grids, grid_shape, idx, wgt, i0, w0, mask,
                       cg_iters, rank, precond_rank=0, mesh=None,
                       sorted_corners=False):
    """Returns predict(p, noise_pj, yc, test_idx, test_wgt, t_i0, t_w0,
    kss, key) -> (mean_correction-free mean, var) using cached SKI algebra:

    mean_* = w_*^T K_UU W^T alpha
    var_*  = k** - c_*^T T^-1 c_*,  c_* = C^T w_*,  C = K_UU W^T Q

    The alpha solve is Kronecker-eigen preconditioned (same machinery as
    training, see :func:`ski_mll`) - mean quality is gated directly by this
    CG's convergence. ``i0``/``w0``/``t_i0``/``t_w0`` are the separable
    interpolation tensors (:func:`build_interp_sep`) of the train and test
    points; the per-dim eigendecomposition is computed ONCE and shared by
    the train-side root Lp (preconditioner) and test-side root Lt (Nystrom
    variance).

    With a mesh, the per-test-row work (corner gathers for the mean, the
    test-side eigen-root Lt and its Nystrom gemm) shards over 'grid'; the
    train-side solve stays replicated (iteration-bound CG).
    """
    mvm_full = _make_mvm(kernel, grids, grid_shape, idx, wgt,
                         sorted_corners=sorted_corners)
    G = int(np.prod(grid_shape))
    c = _grid_sharder(mesh)

    def predict(p, noise_pj, yc, test_idx, test_wgt, t_i0, t_w0, kss, key):
        test_idx = c(test_idx, ("grid", None))
        test_wgt = c(test_wgt, ("grid", None))
        t_i0 = c(t_i0, ("grid", None))
        t_w0 = c(t_w0, ("grid", None))
        factors = grid_kernel_factors(kernel, p, grids)
        mvm = lambda v: mvm_full(p, noise_pj, v)
        Lt = None
        if precond_rank > 0:
            modes = _kron_top_modes(kernel, p, grids, precond_rank)
            Lp = kron_eig_root(kernel, p, grids, grid_shape, i0, w0,
                               precond_rank, mask=mask, modes=modes)
            Lt = kron_eig_root(kernel, p, grids, grid_shape, t_i0, t_w0,
                               precond_rank, modes=modes)
            # split solve (f32-stable, see split_root); the single eigh of
            # Lp^T Lp is shared with the Nystrom variance below
            Qs, lam_n, Un = split_root(Lp)
            pisqrt, _ = split_apply(Qs, lam_n, noise_pj)
            alpha, _, _ = split_pcg(mvm, pisqrt, yc[:, None], cg_iters)
        else:
            pinv = lambda v: v / noise_pj
            alpha, _, _ = batched_pcg(mvm, pinv, yc[:, None], cg_iters)
        alpha = alpha[:, 0]

        def WT(v):  # (n,) or (n,r) -> grid (G, .)
            if v.ndim == 1:
                v = v[:, None]
            u = jnp.zeros((G, v.shape[1]), v.dtype)
            if sorted_corners:
                for s in range(idx.shape[1]):
                    u = u.at[idx[:, s]].add(
                        wgt[:, s, None] * v, indices_are_sorted=True,
                        mode="promise_in_bounds")
                return u
            contrib = wgt[:, :, None] * v[:, None, :]
            return u.at[idx.reshape(-1)].add(
                contrib.reshape(-1, v.shape[1]))

        def KUU(u):  # (G, b)
            b = u.shape[1]
            return kron_mvm(factors, u.reshape(grid_shape + (b,))
                            ).reshape(G, b)

        # mean: t = K_UU W^T alpha, mean_* = w_*^T t
        t = KUU(WT(alpha))[:, 0]
        mean = jnp.sum(test_wgt * t[test_idx], axis=1)

        if precond_rank > 0:
            # Nystrom variance from the SAME Kronecker-eigen root that
            # preconditions the mean solve: with K_UU ~= U_r Lam_r U_r^T
            # (top-r grid eigenmodes, r = precond_rank >= the Lanczos
            # fallback's rank), K_* ~= Lt Lp^T and A ~= Lp Lp^T + noise I,
            # so  diag(K_* A^-1 K_*^T) = row-norms^2 of Lt S^1/2  with
            # S = N (N + noise I)^-1, N = Lp^T Lp  (push-through identity;
            # everything is gemms + the ONE r x r eigh already computed for
            # the split solve above - no sequential Lanczos chain, and
            # rank 512 >> LOVE's default 100).
            scale = jnp.sqrt(lam_n / (lam_n + noise_pj))
            # rotating back by Un^T preserves row norms - skip it
            H = jnp.dot(Lt, Un,
                        precision=jax.lax.Precision.HIGH) * scale[None, :]
            var = kss - jnp.sum(H * H, axis=1)
        else:
            # LOVE variance: Lanczos on A from a random start (rank caps
            # at ``maxroot``, reference skgpr.py:124-131 semantics)
            v0 = jax.random.rademacher(
                key, (yc.shape[0],)).astype(yc.dtype)
            Q, T = lanczos(mvm, v0, rank)
            C = KUU(WT(Q.T))                              # (G, r)
            c_star = jnp.sum(test_wgt[:, :, None] * C[test_idx], axis=1)
            # T^-1 via Cholesky with a safety jitter (T is SPD for SPD A)
            r = T.shape[0]
            LT = safe_cholesky(
                T + 1e-6 * jnp.trace(T) / r * jnp.eye(r, dtype=T.dtype))
            from jax.scipy.linalg import solve_triangular
            half = solve_triangular(LT, c_star.T, lower=True)  # (r, m)
            var = kss - jnp.sum(half * half, axis=0)
        return mean, jnp.maximum(var, 0.0)

    return predict


# --------------------------------------------------------------------------
# masked-grid operator: SKI for data ON the data lattice (the GPim headline
# regime - X always comes from get_sparse_grid, so observed points sit
# exactly on the Cartesian data grid). With the inducing grid EQUAL to the
# data grid, W is a masked identity and the whole operator is
#
#     A v = M . K_UU (M . v) + (noise + jitter) v
#
# pure Kronecker mode products + elementwise masks: no gather, no scatter.
# XLA's TPU scatter/gather lowering is the bottleneck of the generic
# interpolation operator at large n (measured ~0.9 s per mvm at n = 314k
# vs ~2 ms for the mode-product form at G = 1M), so on-lattice data gets
# this operator; off-lattice data keeps the interpolation path.
# --------------------------------------------------------------------------


def make_masked_grid_mvm(kernel, grids, grid_shape, mask_flat,
                         batch_first=False, mesh=None):
    """mvm(p, noise_pj, v) for the masked-grid operator above; v is (G,) or
    (G, b) - or batch-first (b, G) with ``batch_first`` (the fast CG
    layout, see :func:`batched_pcg`). ``mask_flat`` (G,) is 1 at observed
    grid cells. With a ``mesh`` whose 'grid' axis divides the two leading
    grid dims, the mode products run through the explicit
    :func:`kron_mvm_bf_sharded` all-to-all form (every intermediate stays
    shard-sized; plain GSPMD all-gathers the full block instead)."""
    if batch_first:
        sharded = kron_shardable(grid_shape, mesh)

        def mvm(p, noise_pj, v):
            factors = grid_kernel_factors(kernel, p, grids)
            squeeze = v.ndim == 1
            if squeeze:
                v = v[None, :]
            b = v.shape[0]
            vm = v * mask_flat[None, :]
            # kernel factors are symmetric: kron_mvm_bf applies K_k exactly
            tg = vm.reshape((b,) + tuple(grid_shape))
            t = (kron_mvm_bf_sharded(factors, tg, mesh) if sharded
                 else kron_mvm_bf(factors, tg))
            out = mask_flat[None, :] * t.reshape(b, -1) + noise_pj * v
            return out[0] if squeeze else out
        return mvm

    def mvm(p, noise_pj, v):
        factors = grid_kernel_factors(kernel, p, grids)
        squeeze = v.ndim == 1
        if squeeze:
            v = v[:, None]
        b = v.shape[1]
        vm = v * mask_flat[:, None]
        t = kron_mvm(factors, vm.reshape(grid_shape + (b,))).reshape(-1, b)
        out = mask_flat[:, None] * t + noise_pj * v
        return out[:, 0] if squeeze else out
    return mvm


def grid_kr_rows(sel, lam_top, mask_flat=None):
    """Materialize the (prod m_k, rank) Kronecker eigen-root on a grid:
    row (i_1..i_d) of column m is prod_k sel[k][i_k, m] * sqrt(lam_m).

    ``sel[k]``: (m_k, rank) per-dim mode tables (eigenvector tables with
    columns already gathered by mode index - possibly pre-interpolated to a
    different axis). The build runs as a lax.map over the leading dim so the
    transient stays at one (prod m_{2..d}, rank) block per step.
    """
    d = len(sel)
    root_lam = jnp.sqrt(lam_top)

    def one(row0):                                    # (rank,) leading row
        cols = row0[None, :]
        for k in range(1, d):
            cols = (cols[:, None, :] * sel[k][None, :, :]).reshape(
                -1, cols.shape[-1])
        return cols * root_lam[None, :]

    blocks = jax.lax.map(one, sel[0])                 # (m_1, rest, rank)
    out = blocks.reshape(-1, lam_top.shape[0])
    if mask_flat is not None:
        out = out * mask_flat[:, None]
    return out


def _grid_sharder(mesh):
    """Returns constrain(x, spec): with_sharding_constraint applier pinning
    test-row axes to the mesh 'grid' axis (semantics-preserving placement
    hints - prediction rows are embarrassingly parallel). No-op without a
    mesh."""
    if mesh is None:
        return lambda x, spec: x
    from jax.sharding import NamedSharding, PartitionSpec

    def constrain(x, spec):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PartitionSpec(*spec)))

    return constrain


def grid_nystrom_var(sel, Bmat, kss, shard=None):
    """Fused Nystrom predictive variance over a Cartesian test grid:
    var = kss - row_norms^2(Lt Bmat), Lt rows built per leading-dim slice
    (never materializing the full (M, rank) Lt). ``Bmat`` (rank, rank) must
    already include the sqrt(lam) column scaling and the Nystrom rotation
    (see make_grid_predictor). ``shard`` (a _grid_sharder applier) splits
    each slice's rows across chips - the lax.map stays sequential over the
    leading dim, each step's (rest, rank) gemm runs mesh-parallel."""
    d = len(sel)
    c = shard or (lambda x, spec: x)

    def one(row0):
        cols = row0[None, :]
        for k in range(1, d):
            cols = (cols[:, None, :] * sel[k][None, :, :]).reshape(
                -1, cols.shape[-1])
        cols = c(cols, ("grid", None))
        H = jnp.dot(cols, Bmat, precision=jax.lax.Precision.HIGH)
        return jnp.sum(H * H, axis=1)                 # (rest,)

    sq = jax.lax.map(one, sel[0]).reshape(-1)
    return jnp.maximum(kss - sq, 0.0)


def grid_cross_factors(kernel, p, grids, test_axes):
    """Per-dim 1D cross-covariance matrices C_k = k_1d(test_axis, grid_axis)
    of shape (m_k, g_k); the output variance multiplies C_0 (same convention
    as grid_kernel_factors). Because the grid kernel is a product of 1D
    kernels, (x)_k C_k is the EXACT train-test cross-covariance - Cartesian
    test grids need no interpolation at all."""
    from gpim_tpu.kernels.functional import get_kernel_fn
    kfn = get_kernel_fn(kernel)
    d = len(grids)
    ls = jnp.broadcast_to(p["lengthscale"], (d,))
    out = []
    for k, (t, g) in enumerate(zip(test_axes, grids)):
        pk = {"lengthscale": ls[k][None],
              "variance": p["variance"] if k == 0 else 1.0}
        if "alpha" in p:
            pk["alpha"] = p["alpha"]
        out.append(kfn(pk, t[:, None], g[:, None]))
    return out


def _nystrom_bmat(Lp, lam_top, noise_pj, eig=None):
    """Shared Nystrom rotation: with K_UU ~= U_r Lam U_r^T and
    A ~= Lp Lp^T + noise I (Lp = M U_r sqrt(Lam)), the predictive-variance
    correction diag(K_*,t A^-1 K_*,t^T) equals row_norms^2 of

        Lt Bmat,   Lt = C U_r Lam^{-1/2}  (Nystrom eigenfunction extension
                                           of the top modes to test points),
        Bmat = Lam^{-1/2}-scaled  Un sqrt(lam_n / (lam_n + noise)),

    where N = Lp^T Lp = Un lam_n Un^T (push-through identity). For
    test == train grid, C U_r = U_r Lam and Lt reduces to U_r sqrt(Lam).
    ``eig`` optionally supplies a precomputed (lam_n, Un) - e.g. the one
    :func:`split_root` already produced for the mean solve."""
    if eig is not None:
        lam_n, Un = eig
    else:
        N = jnp.dot(Lp.T, Lp, precision=jax.lax.Precision.HIGH)
        lam_n, Un, _ = _orth_eig(N)
    scale = jnp.sqrt(lam_n / (lam_n + noise_pj))
    inv_root = 1.0 / jnp.sqrt(
        jnp.maximum(lam_top, 1e-12 * jnp.max(lam_top)))
    return inv_root[:, None] * (Un * scale[None, :])


def make_grid_predictor(kernel, grids, grid_shape, cg_iters, precond_rank,
                        mesh=None):
    """Returns predict(p, noise_pj, mask_flat, yc_flat, t_axes, kss) ->
    (mean, var) for the masked-grid operator over a Cartesian test grid
    given by per-dim test axes ``t_axes``.

    mean = (x)C_k (M alpha) with EXACT per-dim cross-covariances C_k
    (alpha = A^-1 yc by preconditioned CG - zero interpolation error, the
    only approximations are CG tolerance and the rank-r Nystrom variance);
    var = Nystrom extension of the same Kronecker eigen-root that
    preconditions the solve, fused per leading-dim slice.

    With a mesh, the test-side expansion (where the output-sized work is)
    shards over the 'grid' axis: the mean's leading test mode and each
    variance slice's rows. The CG solve stays replicated - it is
    iteration-bound with G-sized state, and sharding the Kronecker mode
    products would turn every mvm into a cross-chip reduce.
    """
    from gpim_tpu.ops.kron_exact import modeprod
    c = _grid_sharder(mesh)

    def predict(p, noise_pj, mask_flat, yc_flat, t_axes, kss):
        am, Bmat, sel = mgrid_solve_core(
            kernel, p, grids, grid_shape, mask_flat, precond_rank,
            cg_iters, noise_pj, yc_flat)
        C_list = grid_cross_factors(kernel, p, grids, t_axes)
        # shard the mean's leading test mode only: sel_t[0] below must stay
        # replicated (it is the SEQUENTIAL lax.map axis of the variance)
        mean = modeprod([c(C_list[0], ("grid", None))] + C_list[1:],
                        am).reshape(-1)
        sel_t = [jnp.dot(C, s, precision=jax.lax.Precision.HIGHEST)
                 for C, s in zip(C_list, sel)]
        var = grid_nystrom_var(sel_t, Bmat, kss, shard=c if mesh else None)
        return mean, var

    return predict


def mgrid_exact_var_probe(kernel, p, grids, grid_shape, mask_flat,
                          noise_pj, cells, cg_iters=256, rank=1024):
    """EXACT posterior variance at a few probe cells of a masked grid, by
    CG - the scale-proof cross-check for the rank-truncated Nystrom
    variance (the Nystrom extension is prior-dominated when rank << n_obs,
    so its quality cannot be judged from itself).

    For lattice cell c: var_c = k(c,c) - (M k_c)^T A^-1 (M k_c), where
    k_c = K[:, c] is a Kronecker column (outer product of per-dim kernel
    columns - O(G) to build, no dense K) and A is the masked-grid
    operator; masked rows decouple exactly, so this equals the dense
    K_oo + noise I posterior variance at c. One batched split-PCG solve
    over all probe columns. Returns (n_cells,) variances WITHOUT the
    observation-noise term (add ``p['noise']`` for noiseless=False
    parity). ``cells``: int array (n_cells, d) of per-dim grid indices.
    """
    factors = grid_kernel_factors(kernel, p, grids)
    d = len(grids)
    cells = np.asarray(cells)
    n_c = cells.shape[0]
    G = int(np.prod(grid_shape))
    # Kronecker columns: k_c = outer_k factors[k][:, c_k], built via
    # broadcasting per dim; (n_c, G) batch-first for the CG layout
    cols = None
    for k in range(d):
        fk = factors[k][:, cells[:, k]].T          # (n_c, g_k)
        cols = fk if cols is None else (cols[:, :, None]
                                        * fk[:, None, :]).reshape(n_c, -1)
    kss = kernel_self_diag(kernel, p, n_c, cols.dtype)
    B = cols * mask_flat[None, :]
    mvm = make_masked_grid_mvm(kernel, grids, grid_shape, mask_flat,
                               batch_first=True)
    Qs, lam_n, _, _ = mgrid_split_root(
        kernel, p, grids, grid_shape, mask_flat, rank, dim_cap=None)
    pisqrt, _ = split_apply(Qs, lam_n, noise_pj, vec_axis=1)
    X, _, _ = split_pcg(lambda v: mvm(p, noise_pj, v), pisqrt, B,
                        cg_iters, vec_axis=1)
    quad = jnp.sum(B * X, axis=1)
    return jnp.maximum(kss - quad, 0.0)


def kernel_self_diag(kernel, p, n, dtype):
    """k(x, x) for the product-form grid kernels: the variance (the
    per-dim factors are 1 at zero distance for every supported family)."""
    del kernel
    return jnp.full((n,), 1.0, dtype) * p["variance"]


def mgrid_solve_core(kernel, p, grids, grid_shape, mask_flat, rank,
                     cg_iters, noise_pj, yc_flat):
    """Shared masked-grid predict-time solve: split-preconditioned CG for
    alpha = A^-1 yc on the FACTORED basis (f32-stable, batch-first - see
    split_root / batched_pcg) plus the Nystrom variance rotation. Returns
    (alpha masked and grid-shaped, Bmat, sel) for the two consumers
    (make_grid_predictor for Cartesian test grids, mgrid_model's
    scattered-point fallback) so their contracts cannot drift apart.
    dim_cap=None: the variance is a fixed-rank approximation on this
    eigenspace, so prediction uses UNCAPPED mode selection (the cap is a
    training-only economy - see mgrid_split_root)."""
    mvm = make_masked_grid_mvm(kernel, grids, grid_shape, mask_flat,
                               batch_first=True)
    Qs, lam_n, Un, (lam_top, _, _, sel) = mgrid_split_root(
        kernel, p, grids, grid_shape, mask_flat, rank, dim_cap=None)
    pisqrt, _ = split_apply(Qs, lam_n, noise_pj, vec_axis=1)
    alpha, _, _ = split_pcg(
        lambda v: mvm(p, noise_pj, v), pisqrt, yc_flat[None, :],
        cg_iters, vec_axis=1)
    am = (alpha[0] * mask_flat).reshape(grid_shape)
    Bmat = _nystrom_bmat(None, lam_top, noise_pj, eig=(lam_n, Un))
    return am, Bmat, sel
