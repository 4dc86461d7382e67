"""
Functional GP core: jit-compiled training and prediction programs.

This replaces the reference's Pyro engine (gpr.py:170-255 drives
pyro.contrib.gp models with a Python-side Adam loop) with single-compilation
XLA programs:

- the whole Adam training loop is ONE ``lax.scan`` over iterations, so a
  1000-step optimization is a single device program instead of 1000
  host-dispatched steps;
- observations are NaN-compacted on host and padded to a static bucket size;
  a 0/1 mask folds the padding out of the marginal likelihood *exactly*
  (padded rows/cols of the covariance are replaced by identity rows, padded
  targets by zeros - the Cholesky factorization then block-decouples and the
  padded entries contribute nothing to either the quadratic form or the
  log-determinant). Bucketing keeps XLA recompiles rare as data grows during
  Bayesian-optimization runs;
- prediction is chunk-batched with ``lax.map`` over fixed-size tiles
  (replacing the manual num_batches splitting of skgpr.py:309-326);
- the sparse path is the Titsias variational free energy (VFE) bound, the
  same approximation family as Pyro's SparseGPRegression default
  (reference gpr.py:146-155), with trainable inducing points.

Hyperparameters are optimized in unconstrained space; interval-transform
log-Jacobians are added to the objective, which is exactly the MAP objective
Pyro's Trace_ELBO produces for Uniform-prior sample sites
(pyro_kernels.py:77-94).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.scipy.linalg import solve_triangular

from gpim_tpu.kernels.functional import get_kernel_fn, kernel_diag
from gpim_tpu.ops.tri import tri_inverse
from gpim_tpu.kernels.transforms import (
    interval_forward, interval_log_jacobian, positive_forward)
from gpim_tpu.ops.linalg import safe_cholesky

__all__ = [
    "constrain", "exact_loss", "vfe_loss", "train",
    "predict_exact", "predict_vfe", "pad_rows", "chunk_rows",
]

_LOG_2PI = math.log(2.0 * math.pi)


# --------------------------------------------------------------------------
# Parameter handling
# --------------------------------------------------------------------------

def constrain(u, bounds):
    """Map unconstrained parameters to their constrained domains.

    Keys of ``u``: 'lengthscale', 'variance', 'noise', optional 'alpha'
    (RationalQuadratic), optional 'Xu' (inducing points, unconstrained).
    ``bounds``: 'ls_lo', 'ls_hi', 'var_lo', 'var_hi' arrays.
    """
    p = {
        "lengthscale": interval_forward(
            u["lengthscale"], bounds["ls_lo"], bounds["ls_hi"]),
        "variance": interval_forward(
            u["variance"], bounds["var_lo"], bounds["var_hi"]),
        "noise": positive_forward(u["noise"]),
    }
    if "alpha" in u:
        p["alpha"] = positive_forward(u["alpha"])
    if "Xu" in u:
        p["Xu"] = u["Xu"]
    return p


def _log_jacobian(u, bounds):
    """Interval-transform log-Jacobian (the MAP prior term)."""
    return (interval_log_jacobian(u["lengthscale"],
                                  bounds["ls_lo"], bounds["ls_hi"]) +
            interval_log_jacobian(u["variance"],
                                  bounds["var_lo"], bounds["var_hi"]))


def _record(p):
    """Per-iteration hyperparameter snapshot (public `hyperparams` contract,
    reference gpr.py:195-199)."""
    rec = {
        "lengthscale": p["lengthscale"],
        "variance": p["variance"],
        "noise": p["noise"],
    }
    if "Xu" in p:
        rec["inducing_points"] = p["Xu"]
    return rec


# --------------------------------------------------------------------------
# Masked marginal likelihoods
# --------------------------------------------------------------------------

def _masked_system(K, noise, mask, jitter):
    """Replace padded rows/cols of (K + noise I) with identity rows."""
    mm = mask[:, None] * mask[None, :]
    eye = jnp.eye(K.shape[0], dtype=K.dtype)
    diag_fix = (1.0 - mask) * eye
    return mm * (K + (noise + jitter) * eye) + diag_fix


_FAST_KERNELS = ("RBF", "Matern52", "RationalQuadratic")


def exact_loss(u, X, y, mask, bounds, jitter, *, kernel):
    """Masked negative log marginal likelihood + MAP prior terms."""
    p = constrain(u, bounds)
    if kernel in _FAST_KERNELS:
        nll = _nll_fast(kernel, p, X, y, mask, jitter)
    else:
        nll = _exact_nll_autodiff(p, X, y, mask, jitter, kernel)
    return nll - _log_jacobian(u, bounds)


def _exact_nll_autodiff(p, X, y, mask, jitter, kernel):
    kfn = get_kernel_fn(kernel)
    A = _masked_system(kfn(p, X, X), p["noise"], mask, jitter)
    L = safe_cholesky(A)
    ym = y * mask
    # quadratic form via one triangular solve: y^T A^-1 y = |L^-1 y|^2
    z = solve_triangular(L, ym, lower=True)
    n_eff = jnp.sum(mask)
    return (0.5 * jnp.dot(z, z)
            + jnp.sum(jnp.log(jnp.diagonal(L)) * mask)
            + 0.5 * n_eff * _LOG_2PI)


# --------------------------------------------------------------------------
# Fast path: closed-form MLL gradients (RBF / Matern52 / RationalQuadratic)
#
# Autodiff's backward through Cholesky solves two (n, n)-rhs triangular
# systems plus Phi-projection products - measured ~2.4x the forward cost on
# TPU. The marginal likelihood has the classic closed-form gradient
#     dNLL/dA = 0.5 (A^-1 - alpha alpha^T),   alpha = A^-1 y
# which needs one trsm (L^-1 against I) + one syrk, and every hyperparameter
# gradient is then a fused reduction against that matrix. With
# base = (A^-1 - aa^T) . mm  (mm the padding-mask outer product):
#     dNLL/dnoise = 0.5 (sum_i Ainv_ii m_i^2 - |alpha|^2)
#     dNLL/dv     = 0.5 sum(base . K) / v
#     dNLL/dl_k   = (sum_i x_ik^2 rowsum(W)_i - x_k^T W x_k) / l_k^3,
#                   W = base . G,  dK/dl_k = G . D_k / l_k^3
# where D_k = (x_ik - x_jk)^2 is the per-dim UNscaled squared distance; the
# identity D_k = x_i^2 + x_j^2 - 2 x_i x_j turns its contraction into one
# W @ X gemm, so no (n, n, d) tensor is ever formed. Per-kernel G:
#     RBF               G = K
#     Matern52          G = (5/3) v (1 + sqrt5 r) exp(-sqrt5 r)
#     RationalQuadratic G = v (1 + s/(2 alpha_rq))^(-alpha_rq - 1),
#                       plus dNLL/dalpha_rq = 0.5 sum(base . K .
#                           (-log u + s / (2 alpha_rq + s))),  u = 1+s/(2a)
# --------------------------------------------------------------------------

_SQRT5 = 5.0 ** 0.5


def _kernel_from_sqdist(kernel, p, s):
    """Kernel matrix from the *scaled* squared-distance matrix s, matching
    gpim_tpu.kernels.functional definitions exactly."""
    v = p["variance"]
    if kernel == "RBF":
        return v * jnp.exp(-0.5 * s)
    if kernel == "Matern52":
        r = jnp.sqrt(s + 1e-12)
        poly = 1.0 + _SQRT5 * r + (5.0 / 3.0) * r * r
        return v * poly * jnp.exp(-_SQRT5 * r)
    if kernel == "RationalQuadratic":
        a = p["alpha"]
        return v * (1.0 + s / (2.0 * a)) ** (-a)
    raise NotImplementedError(kernel)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _nll_fast(kernel, p, X, y, mask, jitter):
    nll, _ = _nll_fast_fwd(kernel, p, X, y, mask, jitter)
    return nll


def _nll_fast_fwd(kernel, p, X, y, mask, jitter):
    from gpim_tpu.ops import pallas_gram
    from gpim_tpu.ops.gram import pairwise_sq_dist
    n, d = X.shape
    Xs = X / p["lengthscale"]
    if pallas_gram.pallas_supported(n, n, d, jnp.float32) \
            and X.dtype == jnp.float32:
        # one fused HBM pass producing K and the masked system together
        Kt, A = pallas_gram.fused_masked_system_pallas(
            Xs, mask, p["variance"], p["noise"] + jitter,
            p.get("alpha"), kernel=kernel)
        s_res = None          # backward recomputes s when the kernel needs it
    else:
        s = pairwise_sq_dist(Xs, Xs)
        Kt = _kernel_from_sqdist(kernel, p, s)     # unmasked kernel matrix
        A = _masked_system(Kt, p["noise"], mask, jitter)
        s_res = None if kernel == "RBF" else s
    L = safe_cholesky(A)
    # V = L^-1 via the batched-bisection inverse (ops/tri.py). Computing it
    # here (rather than a 1-rhs trsm for z now and a trsm-vs-identity in the
    # backward) turns both solves into gemms: XLA's 1-rhs trsm alone is an
    # n/128-step latency chain. _nll_fast is only ever evaluated under
    # value_and_grad in the training scan, so the inverse is never wasted.
    V = tri_inverse(L)
    ym = y * mask
    z = V @ ym
    n_eff = jnp.sum(mask)
    nll = (0.5 * jnp.dot(z, z)
           + jnp.sum(jnp.log(jnp.diagonal(L)) * mask)
           + 0.5 * n_eff * _LOG_2PI)
    return nll, (p, X, mask, V, Kt, s_res, z, jitter)


def _nll_fast_bwd(kernel, res, g):
    p, X, mask, V, Kt, s, z, jitter = res
    n = X.shape[0]
    v = p["variance"]
    alpha = V.T @ z                                   # A^-1 (y . m)
    # bf16x3 keeps ~f32 fidelity for this inner-product accumulation and is
    # ~2x faster than the package-default 6-pass "highest"; Ainv only feeds
    # gradient reductions, where 1e-6-relative accuracy is ample for Adam
    Ainv = jnp.dot(V.T, V, precision=jax.lax.Precision.HIGH)
    from gpim_tpu.ops import pallas_gram
    if kernel == "RBF" and X.dtype == jnp.float32 \
            and pallas_gram.pallas_supported(n, n, X.shape[1], jnp.float32):
        # one fused pass over Ainv/Kt computes every matrix reduction
        s1, rw, WX, diagsum = pallas_gram.rbf_bwd_reductions_pallas(
            Ainv, Kt, alpha, mask, X)
        dv = 0.5 * g * s1 / v
        dn = 0.5 * g * (diagsum - jnp.dot(alpha, alpha))
        dp = {"variance": dv, "noise": dn}
        ls = p["lengthscale"]
        per_dim = g * (jnp.sum(X * X * rw[:, None], axis=0)
                       - jnp.sum(X * WX, axis=0))
        if ls.shape[0] == 1 and X.shape[1] > 1:
            dls = jnp.sum(per_dim)[None] / (ls ** 3)
        else:
            dls = per_dim / (ls ** 3)
        dp["lengthscale"] = dls
        dy = g * alpha
        return (dp, jnp.zeros_like(X), dy, jnp.zeros_like(mask),
                jnp.zeros_like(jitter))

    mm = mask[:, None] * mask[None, :]
    base = (Ainv - alpha[:, None] * alpha[None, :]) * mm

    dv = 0.5 * g * jnp.sum(base * Kt) / v
    dn = 0.5 * g * (jnp.dot(jnp.diagonal(Ainv), mask * mask)
                    - jnp.dot(alpha, alpha))
    dp = {"variance": dv, "noise": dn}

    if kernel != "RBF" and s is None:
        # forward used the fused pallas path, which does not emit s
        from gpim_tpu.ops.gram import pairwise_sq_dist
        s = pairwise_sq_dist(X / p["lengthscale"], X / p["lengthscale"])
    if kernel == "RBF":
        G = Kt
    elif kernel == "Matern52":
        r = jnp.sqrt(s + 1e-12)
        G = (5.0 / 3.0) * v * (1.0 + _SQRT5 * r) * jnp.exp(-_SQRT5 * r)
    else:  # RationalQuadratic
        a = p["alpha"]
        u_ = 1.0 + s / (2.0 * a)
        G = v * u_ ** (-a - 1.0)
        dp["alpha"] = 0.5 * g * jnp.sum(
            base * Kt * (-jnp.log(u_) + s / (2.0 * a + s)))

    W = base * G
    rw = jnp.sum(W, axis=1)
    WX = jnp.dot(W, X, precision=jax.lax.Precision.HIGHEST)
    ls = p["lengthscale"]
    per_dim = g * (jnp.sum(X * X * rw[:, None], axis=0)
                   - jnp.sum(X * WX, axis=0))
    if ls.shape[0] == 1 and X.shape[1] > 1:
        # isotropic: one lengthscale scales every dim -> sum the per-dim terms
        dls = jnp.sum(per_dim)[None] / (ls ** 3)
    else:
        dls = per_dim / (ls ** 3)
    dp["lengthscale"] = dls
    dy = g * alpha                                 # dNLL/dy = A^-1 (y.m) . m
    # X and mask are never trained in the exact path; jitter is a constant.
    return (dp, jnp.zeros_like(X), dy, jnp.zeros_like(mask),
            jnp.zeros_like(jitter))


_nll_fast.defvjp(_nll_fast_fwd, _nll_fast_bwd)


@jax.custom_vjp
def mll_from_gram(K, noise, ym, mask, jitter):
    """Masked exact NLL from a precomputed (unmasked) Gram matrix ``K``,
    with the closed-form gradient backward.

    The stationary-kernel families route through :func:`_nll_fast`, whose
    backward also collapses dK -> dtheta analytically; kernels whose
    dK/dtheta is plain elementwise (the spectral mixture: products of exp
    and cos factors per dim) only need dNLL/dK = 0.5 (A^-1 - alpha alpha^T)
    in closed form - autodiff then chains the elementwise kernel build for
    free, and the Cholesky VJP (two n-rhs trsms + Phi products, measured
    ~2.4x the forward, see the _nll_fast header) never runs.

    Returns the NLL core (quadratic + masked logdet + n_eff/2 log 2pi);
    ``ym`` must already be centered and masked. Only K, noise and ym
    receive cotangents (mask and jitter are constants of the training
    problem, same convention as _nll_fast).
    """
    nll, _ = _mll_from_gram_fwd(K, noise, ym, mask, jitter)
    return nll


def _mll_from_gram_fwd(K, noise, ym, mask, jitter):
    A = _masked_system(K, noise, mask, jitter)
    L = safe_cholesky(A)
    V = tri_inverse(L)          # both solves as gemms (see _nll_fast_fwd)
    z = V @ ym
    n_eff = jnp.sum(mask)
    nll = (0.5 * jnp.dot(z, z)
           + jnp.sum(jnp.log(jnp.diagonal(L)) * mask)
           + 0.5 * n_eff * _LOG_2PI)
    return nll, (V, z, mask, jitter)


def _mll_from_gram_bwd(res, g):
    V, z, mask, jitter = res
    alpha = V.T @ z                                   # A^-1 ym
    Ainv = jnp.dot(V.T, V, precision=jax.lax.Precision.HIGH)
    mm = mask[:, None] * mask[None, :]
    base = (0.5 * g) * (Ainv - alpha[:, None] * alpha[None, :])
    dK = base * mm
    dnoise = (0.5 * g) * (jnp.sum(jnp.diagonal(Ainv) * mask)
                          - jnp.dot(alpha, alpha))
    dym = g * alpha
    return (dK, dnoise, dym, jnp.zeros_like(mask),
            jnp.zeros_like(jnp.asarray(jitter)))


mll_from_gram.defvjp(_mll_from_gram_fwd, _mll_from_gram_bwd)


def vfe_loss(u, X, y, mask, bounds, jitter, *, kernel):
    """Masked Titsias VFE bound (negated) with trainable inducing points.

    Matches the approximation family of Pyro's SparseGPRegression
    (reference gpr.py:154-155; Xu initialization mirrored in gpr.py:151).
    """
    kfn = get_kernel_fn(kernel)
    p = constrain(u, bounds)
    Xu = p["Xu"]
    m = Xu.shape[0]
    noise = p["noise"]
    Kmm = kfn(p, Xu, Xu) + jitter * jnp.eye(m, dtype=X.dtype)
    Kmn = kfn(p, Xu, X) * mask[None, :]
    Lm = safe_cholesky(Kmm)
    # explicit Lm^-1 turns the wide (m, n) triangular solve into a gemm
    # (XLA trsm is an m/128-step latency chain and its VJP is another
    # trsm; the inverse's VJP is gemms too - measured 13.5 -> 9 ms/step
    # at n = 30k, m = 1k)
    Vm = tri_inverse(Lm)
    ym = y * mask
    B, a, t = _vfe_wide(Vm, Kmn, ym, noise, Lm)
    LB = safe_cholesky(B)
    c = solve_triangular(LB, a, lower=True) / jnp.sqrt(noise)
    n_eff = jnp.sum(mask)
    kdiag = kernel_diag(kernel, p, X) * mask
    trace_term = jnp.sum(kdiag) / noise - t
    nll = (0.5 * n_eff * (_LOG_2PI + jnp.log(noise))
           + jnp.sum(jnp.log(jnp.diagonal(LB)))
           + 0.5 * jnp.dot(ym, ym) / noise
           - 0.5 * jnp.dot(c, c)
           + 0.5 * trace_term)
    return nll - _log_jacobian(u, bounds)


@partial(jax.custom_vjp, nondiff_argnums=())
def _vfe_wide(Vm, Kmn, ym, noise, Lm):
    """The n-wide core of the VFE bound, with a closed-form backward.

    Returns (B, a, t): B = I + A A^T, a = A ym, t = sum(A^2), where
    A = Vm Kmn / sqrt(noise) is the whitened feature matrix. Whitening
    BEFORE squaring is essential in f32: collapsing to Q = Kmn Kmn^T first
    halves the gemm count again but squares the un-whitened conditioning,
    and B = I + Vm Q Vm^T / noise loses SPD to bf16 rounding (observed:
    training NaNs at iteration ~35 on the BEPFM VFE benchmark on TPU).

    The closed-form backward needs ONE n-wide gemm: autodiff of the same
    code emits four (cotangents of the A product and the B syrk), because
    it cannot use the algebraic identities A Kmn^T = sqrt(noise) (B-I) Lm^T
    and Kmn ym = sqrt(noise) Lm a that collapse dVm and the noise gradient
    to m^3 work. Measured 9.2 -> 6.5 ms/step at n = 30k, m = 1024 (the
    remaining cost: 3 wide bf16x3 gemms + the Kmn build's elementwise
    fwd+bwd). ``Lm`` must be Vm^{-1}; it only evaluates those identities,
    so no cotangent flows to it (its gradient arrives through Vm).
    """
    out, _ = _vfe_wide_fwd(Vm, Kmn, ym, noise, Lm)
    return out


def _vfe_wide_fwd(Vm, Kmn, ym, noise, Lm):
    m = Vm.shape[0]
    # bf16x3 ("high") keeps ~f32 fidelity for these plain O(1)-scaled row
    # products and is measurably faster than 6-pass "highest" (15.2 ->
    # 11.8 ms/step). Distance expansions elsewhere MUST stay "highest"
    # (see ops/gram.py) - these are not cancellation-prone.
    A = jnp.dot(Vm, Kmn,
                precision=jax.lax.Precision.HIGH) / jnp.sqrt(noise)
    B = (jnp.eye(m, dtype=A.dtype)
         + jnp.dot(A, A.T, precision=jax.lax.Precision.HIGH))
    a = jnp.dot(A, ym, precision=jax.lax.Precision.HIGH)
    t = jnp.sum(A * A)
    return (B, a, t), (A, B, a, noise, Lm, ym)


def _vfe_wide_bwd(res, cots):
    A, B, a, noise, Lm, ym = res
    dB, da, dt = cots
    m = A.shape[0]
    root_n = jnp.sqrt(noise)
    # dA = (dB + dB^T + 2 dt I) A + da ym^T =: S A + da ym^T
    S = dB + dB.T + 2.0 * dt * jnp.eye(m, dtype=A.dtype)
    BmI = B - jnp.eye(m, dtype=A.dtype)                  # = A A^T
    # dKmn = Vm^T dA / sqrt(noise): Vm^T = Lm^{-T}, so fold S through the
    # SAME whitened A - one wide gemm (M1 = Lm^{-T} S) plus a rank-1 term
    # fused into the elementwise kernel backward
    M1 = solve_triangular(Lm.T, S, lower=False)          # (m, m)
    dKmn = (jnp.dot(M1, A, precision=jax.lax.Precision.HIGH)
            + solve_triangular(Lm.T, da, lower=False)[:, None]
            * ym[None, :]) / root_n
    # dVm = dA Kmn^T / sqrt(noise), with A Kmn^T = sqrt(noise) (B-I) Lm^T
    # and Kmn ym = sqrt(noise) Lm a - all m^3
    dVm = (jnp.dot(S, jnp.dot(BmI, Lm.T))
           + jnp.outer(da, jnp.dot(Lm, a)))
    # dym = A^T da (wide matvec)
    dym = jnp.dot(A.T, da, precision=jax.lax.Precision.HIGH)
    # noise enters only through A's 1/sqrt(noise): d noise =
    # -(1/(2 noise)) sum(dA * A), with sum(dA * A) = sum(S * (A A^T)) +
    # da^T (A ym) - all m^2
    dnoise = -(jnp.sum(S * BmI) + jnp.dot(da, a)) / (2.0 * noise)
    # Lm is an evaluation shortcut for functions of (Vm, Kmn): zero cotangent
    return dVm, dKmn, dym, dnoise, jnp.zeros_like(Lm)


_vfe_wide.defvjp(_vfe_wide_fwd, _vfe_wide_bwd)


# --------------------------------------------------------------------------
# Training: the whole Adam loop is one lax.scan program
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("kernel", "iterations", "sparse"))
def train(u0, X, y, mask, bounds, lr, jitter, *,
          kernel, iterations, sparse):
    """Run ``iterations`` Adam steps; returns (final_u, trajectory dict).

    The trajectory holds the post-update constrained hyperparameters of every
    iteration plus the pre-update loss - the same time series the reference
    accumulates in Python lists (gpr.py:195-199).
    """
    loss_fn = vfe_loss if sparse else exact_loss
    opt = optax.adam(learning_rate=lr)
    opt_state = opt.init(u0)

    def step(carry, _):
        u, opt_state = carry
        loss, g = jax.value_and_grad(
            partial(loss_fn, kernel=kernel))(u, X, y, mask, bounds, jitter)
        updates, opt_state = opt.update(g, opt_state, u)
        u = optax.apply_updates(u, updates)
        # record the raw parameters only; the constrained trajectory is
        # reconstructed in ONE vmapped pass below - running constrain()
        # inside the scan body measurably slows small-n training (the
        # per-iteration transform ops dominate when the Cholesky is tiny,
        # e.g. inside Bayesian-optimization loops)
        return (u, opt_state), (u, loss)

    (u_final, _), (u_traj, losses) = jax.lax.scan(
        step, (u0, opt_state), None, length=iterations)
    traj = jax.vmap(lambda uu: _record(constrain(uu, bounds)))(u_traj)
    traj["loss"] = losses
    return u_final, traj


# --------------------------------------------------------------------------
# Prediction: chunk-batched over the test grid
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("kernel", "noiseless"))
def predict_exact(u, X, y, mask, bounds, jitter, Xtest_chunks, *,
                  kernel, noiseless=False):
    """Exact GP predictive mean/variance over chunked test points.

    ``Xtest_chunks`` has shape (n_chunks, chunk, d); chunks are processed
    sequentially by lax.map so peak memory stays at one (n, chunk) solve.
    Variance includes observation noise when ``noiseless=False``, matching
    ``model(Xtest, full_cov=False, noiseless=False)`` (reference gpr.py:248).
    """
    kfn = get_kernel_fn(kernel)
    p = constrain(u, bounds)
    A = _masked_system(kfn(p, X, X), p["noise"], mask, jitter)
    L = safe_cholesky(A)
    # one explicit L^-1 up front turns every per-chunk triangular solve
    # below into a plain gemm (XLA trsm is an n/128-step latency chain)
    V = tri_inverse(L)
    alpha = V.T @ (V @ (y * mask))

    def one(xc):
        Ks = kfn(p, xc, X) * mask[None, :]
        mean = Ks @ alpha
        # bf16x3: O(1)-scaled factor product feeding a variance reduction,
        # ~2x faster than the package-default 6-pass "highest" (the same
        # policy as the training path's syrk; distance expansions stay
        # "highest" inside kfn)
        W = jnp.dot(V, Ks.T, precision=jax.lax.Precision.HIGH)
        var = kernel_diag(kernel, p, xc) - jnp.sum(W * W, axis=0)
        if not noiseless:
            var = var + p["noise"]
        return mean, jnp.maximum(var, 0.0)

    means, variances = jax.lax.map(one, Xtest_chunks)
    return means.reshape(-1), variances.reshape(-1)


@partial(jax.jit, static_argnames=("kernel", "noiseless"))
def predict_vfe(u, X, y, mask, bounds, jitter, Xtest_chunks, *,
                kernel, noiseless=False):
    """Sparse (VFE) GP predictive mean/variance over chunked test points."""
    kfn = get_kernel_fn(kernel)
    p = constrain(u, bounds)
    Xu = p["Xu"]
    m = Xu.shape[0]
    noise = p["noise"]
    Kmm = kfn(p, Xu, Xu) + jitter * jnp.eye(m, dtype=X.dtype)
    Kmn = kfn(p, Xu, X) * mask[None, :]
    Lm = safe_cholesky(Kmm)
    # one explicit inverse each: every per-chunk triangular solve below
    # becomes a gemm (same rationale as vfe_loss / predict_exact)
    Vm = tri_inverse(Lm)
    A = jnp.dot(Vm, Kmn,
                precision=jax.lax.Precision.HIGH) / jnp.sqrt(noise)
    B = jnp.eye(m, dtype=X.dtype) + A @ A.T
    LB = safe_cholesky(B)
    VB = tri_inverse(LB)
    c = (VB @ (A @ (y * mask))) / jnp.sqrt(noise)

    def one(xc):
        Ks = kfn(p, xc, Xu)
        w1 = Vm @ Ks.T                                   # (m, chunk)
        w2 = VB @ w1                                     # (m, chunk)
        mean = w2.T @ c
        var = (kernel_diag(kernel, p, xc)
               - jnp.sum(w1 * w1, axis=0)
               + jnp.sum(w2 * w2, axis=0))
        if not noiseless:
            var = var + noise
        return mean, jnp.maximum(var, 0.0)

    means, variances = jax.lax.map(one, Xtest_chunks)
    return means.reshape(-1), variances.reshape(-1)


# --------------------------------------------------------------------------
# Host-side shape plumbing
# --------------------------------------------------------------------------

def pad_rows(arr, bucket):
    """Pad axis 0 up to the next multiple of ``bucket`` (with zeros).

    Returns (padded, original_length). Bucketing bounds the number of
    distinct jit shapes as the training set grows one point at a time
    during Bayesian-optimization runs.
    """
    import numpy as np
    n = arr.shape[0]
    n_pad = int(-(-max(n, 1) // bucket) * bucket)
    if n_pad == n:
        return arr, n
    pad = [(0, n_pad - n)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad), n


def chunk_rows(arr, chunk):
    """Zero-pad axis 0 to a multiple of ``chunk`` and reshape to
    (n_chunks, chunk, ...). Returns (chunked, original_length)."""
    padded, n = pad_rows(arr, chunk)
    return padded.reshape((-1, chunk) + arr.shape[1:]), n
