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

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "choose_grid", "build_interp", "ski_mvm", "batched_cg",
    "lanczos", "ski_mll", "make_ski_predictor", "grid_kernel_factors",
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


# --------------------------------------------------------------------------
# parameter-dependent pieces (inside jit)
# --------------------------------------------------------------------------

def grid_kernel_factors(kernel, p, grids):
    """Dense 1D kernel factors K_d; the output variance multiplies the
    first factor. Product-form per dim (see module docstring)."""
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
    return factors


def kron_mvm(factors, v_grid):
    """(x)_d K_d applied to a grid-shaped tensor via mode products."""
    d = len(factors)
    out = v_grid
    for k in range(d):
        out = jnp.tensordot(factors[k], out, axes=([1], [k]))
        out = jnp.moveaxis(out, 0, k)
    return out


def ski_mvm(factors, idx, wgt, noise_plus_jitter, grid_shape, v):
    """A v = W K_UU W^T v + (noise + jitter) v, for v of shape (n,) or
    (n, b) batched."""
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    b = v.shape[1]
    G = int(np.prod(grid_shape))
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


def batched_cg(mvm, B, iters):
    """Conjugate gradients for A X = B, all columns at once.

    Also returns the Lanczos tridiagonal coefficients recovered from the CG
    alphas/betas (per column) for stochastic Lanczos quadrature. Converged
    columns are FROZEN: their state stops updating and their remaining
    tridiag entries become an identity block (t_diag = 1, t_off = 0) that is
    decoupled from e1 and therefore contributes exactly zero to the SLQ
    quadrature - without this, post-convergence round-off emits spurious
    Ritz values that wreck the logdet estimate.
    """
    X0 = jnp.zeros_like(B)
    R0 = B
    P0 = B
    rs0 = jnp.sum(R0 * R0, axis=0)
    eps = jnp.finfo(B.dtype).eps
    tol = jnp.maximum(rs0, 1e-30) * (100.0 * eps) ** 2

    def step(carry, _):
        X, R, P, rs_old, alpha_prev, beta_prev, done = carry
        AP = mvm(P)
        denom = jnp.sum(P * AP, axis=0)
        live = jnp.logical_not(done)
        alpha_raw = rs_old / jnp.where(denom > 0, denom, 1.0)
        alpha = jnp.where(live & (denom > 0), alpha_raw, 0.0)
        X = X + alpha[None, :] * P
        R = R - alpha[None, :] * AP
        rs_new = jnp.sum(R * R, axis=0)
        beta_raw = rs_new / jnp.where(rs_old > 0, rs_old, 1.0)
        beta = jnp.where(live, beta_raw, 0.0)
        P = jnp.where(live[None, :], R + beta[None, :] * P, P)
        # Lanczos T from CG coefficients:
        # diag_j = 1/alpha_j + beta_{j-1}/alpha_{j-1}; off_j = sqrt(beta_j)/alpha_j
        safe_alpha = jnp.where(alpha > 0, alpha, 1.0)
        safe_alpha_prev = jnp.where(alpha_prev > 0, alpha_prev, 1.0)
        t_diag = jnp.where(
            live, 1.0 / safe_alpha + beta_prev / safe_alpha_prev, 1.0)
        t_off = jnp.where(
            live, jnp.sqrt(jnp.maximum(beta, 0.0)) / safe_alpha, 0.0)
        done_new = done | (rs_new < tol) | (denom <= 0)
        # a converged column's off-diagonal must not couple into the
        # identity tail it just opened
        t_off = jnp.where(done_new & live, 0.0, t_off)
        return ((X, R, P, rs_new, alpha, beta, done_new),
                (t_diag, t_off))

    init = (X0, R0, P0, rs0,
            jnp.ones_like(rs0), jnp.zeros_like(rs0),
            jnp.zeros(rs0.shape, bool))
    (X, R, _, _, _, _, _), (t_diags, t_offs) = jax.lax.scan(
        step, init, None, length=iters)
    return X, t_diags, t_offs  # (n, b), (iters, b), (iters, b)


def _slq_from_tridiag(t_diags, t_offs, probe_sqnorms):
    """sum_i |z_i|^2 e1^T log(T_i) e1 / p  (Rademacher probes)."""
    m, p = t_diags.shape

    def one(diag, off, sq):
        T = (jnp.diag(diag)
             + jnp.diag(off[:-1], 1)
             + jnp.diag(off[:-1], -1))
        lam, U = jnp.linalg.eigh(T)
        lam = jnp.maximum(lam, 1e-30)
        return sq * jnp.sum(U[0, :] ** 2 * jnp.log(lam))

    vals = jax.vmap(one, in_axes=(1, 1, 0))(t_diags, t_offs, probe_sqnorms)
    return jnp.mean(vals)


# --------------------------------------------------------------------------
# MLL with custom VJP (BBMM-style trace-estimated gradients)
# --------------------------------------------------------------------------

def _make_mvm(kernel, grids, grid_shape, idx, wgt):
    def mvm(p, noise_pj, v):
        factors = grid_kernel_factors(kernel, p, grids)
        return ski_mvm(factors, idx, wgt, noise_pj, grid_shape, v)
    return mvm


def ski_mll(kernel, grids, grid_shape, idx, wgt, cg_iters, probes):
    """Returns loss_core(p, noise_pj, yc) = 0.5 yc^T A^-1 yc + 0.5 logdet A
    with trace-estimated custom gradients. ``probes`` is a fixed (n, p)
    Rademacher matrix; the caller adds constants and the padded-logdet
    correction outside."""
    mvm = _make_mvm(kernel, grids, grid_shape, idx, wgt)

    @jax.custom_vjp
    def core(p, noise_pj, yc):
        out, _ = _fwd(p, noise_pj, yc)
        return out

    def _fwd(p, noise_pj, yc):
        B = jnp.concatenate([yc[:, None], probes], axis=1)
        X, t_diags, t_offs = batched_cg(
            lambda v: mvm(p, noise_pj, v), B, cg_iters)
        alpha = X[:, 0]
        solves = X[:, 1:]
        sqnorms = jnp.sum(probes * probes, axis=0)
        logdet = _slq_from_tridiag(
            t_diags[:, 1:], t_offs[:, 1:], sqnorms)
        quad = 0.5 * jnp.dot(yc, alpha)
        out = quad + 0.5 * logdet
        return out, (p, noise_pj, alpha, solves)

    def _bwd(res, g):
        p, noise_pj, alpha, solves = res
        n_probes = solves.shape[1]

        def surrogate(p_, noise_pj_):
            # d quad = -0.5 a^T (dA) a ; d logdet = tr(A^-1 dA)
            #   ~= (1/p) sum s_i^T (dA) z_i  with s_i = A^-1 z_i
            quad_term = -0.5 * jnp.dot(alpha, mvm(p_, noise_pj_, alpha))
            probes_sg = jax.lax.stop_gradient(probes)
            solves_sg = jax.lax.stop_gradient(solves)
            trace_term = 0.5 * jnp.sum(
                solves_sg * mvm(p_, noise_pj_, probes_sg)) / n_probes
            return quad_term + trace_term

        gp, gn = jax.grad(surrogate, argnums=(0, 1))(p, noise_pj)
        gp = jax.tree_util.tree_map(lambda x: g * x, gp)
        return gp, g * gn, g * alpha

    core.defvjp(_fwd, _bwd)
    return core


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


def make_ski_predictor(kernel, grids, grid_shape, idx, wgt,
                       cg_iters, rank):
    """Returns predict(p, noise_pj, yc, test_idx, test_wgt, kss) ->
    (mean_correction-free mean, var) using cached SKI algebra:

    mean_* = w_*^T K_UU W^T alpha
    var_*  = k** - c_*^T T^-1 c_*,  c_* = C^T w_*,  C = K_UU W^T Q
    """
    mvm_full = _make_mvm(kernel, grids, grid_shape, idx, wgt)
    G = int(np.prod(grid_shape))

    def predict(p, noise_pj, yc, test_idx, test_wgt, kss, key):
        factors = grid_kernel_factors(kernel, p, grids)
        mvm = lambda v: mvm_full(p, noise_pj, v)
        alpha, _, _ = batched_cg(mvm, yc[:, None], cg_iters)
        alpha = alpha[:, 0]

        def WT(v):  # (n,) or (n,r) -> grid (G, .)
            if v.ndim == 1:
                v = v[:, None]
            contrib = wgt[:, :, None] * v[:, None, :]
            u = jnp.zeros((G, v.shape[1]), v.dtype)
            return u.at[idx.reshape(-1)].add(
                contrib.reshape(-1, v.shape[1]))

        def KUU(u):  # (G, b)
            b = u.shape[1]
            return kron_mvm(factors, u.reshape(grid_shape + (b,))
                            ).reshape(G, b)

        # mean: t = K_UU W^T alpha, mean_* = w_*^T t
        t = KUU(WT(alpha))[:, 0]
        mean = jnp.sum(test_wgt * t[test_idx], axis=1)

        # LOVE variance: Lanczos on A from a random start
        v0 = jax.random.rademacher(
            key, (yc.shape[0],)).astype(yc.dtype)
        Q, T = lanczos(mvm, v0, rank)
        C = KUU(WT(Q.T))                                  # (G, r)
        c_star = jnp.sum(test_wgt[:, :, None] * C[test_idx], axis=1)
        # T^-1 via Cholesky with a safety jitter (T is SPD for SPD A)
        r = T.shape[0]
        LT = jnp.linalg.cholesky(
            T + 1e-6 * jnp.trace(T) / r * jnp.eye(r, dtype=T.dtype))
        from jax.scipy.linalg import solve_triangular
        half = solve_triangular(LT, c_star.T, lower=True)  # (r, m)
        var = kss - jnp.sum(half * half, axis=0)
        return mean, jnp.maximum(var, 0.0)

    return predict
