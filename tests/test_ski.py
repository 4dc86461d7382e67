"""
SKI operator tests: MVM correctness against the dense W K_UU W^T matrix,
CG solve accuracy, SLQ logdet accuracy, and end-to-end parity of the SKI
model with the dense exact GP on on-grid data (where interpolation is exact
and the product-RBF equals the RBF).
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from gpim_tpu.ops import ski


def _dense_operator(kernel, p, grids, idx, wgt, noise_pj):
    """Explicit dense A = W K_UU W^T + noise_pj I for verification."""
    factors = [np.asarray(f) for f in
               ski.grid_kernel_factors(kernel, p, [jnp.asarray(g)
                                                   for g in grids])]
    K = factors[0]
    for f in factors[1:]:
        K = np.kron(K, f)
    n, S = idx.shape
    G = K.shape[0]
    W = np.zeros((n, G))
    for i in range(n):
        for s in range(S):
            W[i, idx[i, s]] += wgt[i, s]
    return W @ K @ W.T + noise_pj * np.eye(n)


def _setup(d=2, n=40, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.rand(n, d) * 10
    grids = ski.choose_grid(X, ratio=3.0)
    idx, wgt = ski.build_interp(X, grids)
    p = {"lengthscale": jnp.asarray(np.full(d, 2.0)),
         "variance": jnp.asarray(1.5)}
    return X, grids, idx, wgt, p


@pytest.mark.parametrize("d", [1, 2, 3])
def test_ski_mvm_matches_dense(d):
    X, grids, idx, wgt, p = _setup(d=d)
    n = X.shape[0]
    noise_pj = 0.3
    A = _dense_operator("RBF", p, grids, idx, wgt, noise_pj)
    factors = ski.grid_kernel_factors(
        "RBF", p, [jnp.asarray(g) for g in grids])
    v = np.random.RandomState(1).rand(n, 3)
    out = ski.ski_mvm(factors, jnp.asarray(idx), jnp.asarray(wgt),
                      noise_pj, tuple(len(g) for g in grids),
                      jnp.asarray(v))
    assert_allclose(np.asarray(out), A @ v, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("d", [1, 2, 3])
def test_ski_mvm_sorted_corners_matches_dense(d):
    """The sorted-scatter fast path (points pre-sorted by lower-corner flat
    index, indices_are_sorted promises) must agree with the dense operator.
    Also checks the structural fact the promise rests on: sorting by
    idx[:, 0] sorts EVERY corner column (constant per-corner offsets)."""
    X, grids, idx, wgt, p = _setup(d=d)
    n = X.shape[0]
    noise_pj = 0.3
    A = _dense_operator("RBF", p, grids, idx, wgt, noise_pj)
    perm = np.argsort(idx[:, 0], kind="stable")
    idx_s, wgt_s = idx[perm], wgt[perm]
    assert (np.diff(idx_s, axis=0) >= 0).all()   # all columns sorted
    factors = ski.grid_kernel_factors(
        "RBF", p, [jnp.asarray(g) for g in grids])
    v = np.random.RandomState(1).rand(n, 3)
    out = ski.ski_mvm(factors, jnp.asarray(idx_s), jnp.asarray(wgt_s),
                      noise_pj, tuple(len(g) for g in grids),
                      jnp.asarray(v[perm]), sorted_corners=True)
    assert_allclose(np.asarray(out), (A @ v)[perm], rtol=1e-6, atol=1e-8)


def test_ski_engine_sorted_internally():
    """SKIEngine sorts its points by lower-corner flat index at build time
    (the promise behind its sorted-scatter mvm) and hides the permutation:
    train trajectories and predictions are invariant to the order the
    caller supplies the points in."""
    from gpim_tpu.gpreg.ski_model import SKIEngine

    rng = np.random.RandomState(3)
    n, d = 96, 2
    X = rng.rand(n, d).astype(np.float32) * 5
    yv = np.sin(X[:, 0]) * np.cos(X[:, 1]) + 0.05 * rng.randn(n)
    yv = yv.astype(np.float32)
    mask = np.ones(n, np.float32)
    grids = ski.choose_grid(X, ratio=2.0)

    u = {"lengthscale": jnp.zeros((d,), jnp.float32),
         "noise": jnp.asarray(0.0, jnp.float32),
         "mean": jnp.asarray(0.0, jnp.float32),
         "outputscale": jnp.asarray(0.0, jnp.float32)}
    bounds = {"ls_lo": jnp.asarray(0.05, jnp.float32),
              "ls_hi": jnp.asarray(10.0, jnp.float32)}
    jit_ = jnp.asarray(1e-6, jnp.float32)

    def run(Xo, yo):
        eng = SKIEngine("RBF", Xo, mask, grids, cg_iters=96,
                        precond_rank=32, seed=0)
        assert (np.diff(np.asarray(eng._idx), axis=0) >= 0).all()
        # prediction is deterministic (converged PCG mean + Nystrom
        # variance), so it must be order-invariant up to solver tolerance
        mean, var = eng.predict(u, jnp.asarray(yo), jnp.asarray(mask),
                                bounds, jit_, X[:8])
        return eng, np.asarray(mean), np.asarray(var)

    eng, m1, v1 = run(X, yv)
    sh = np.random.RandomState(7).permutation(n)
    _, m2, v2 = run(X[sh], yv[sh])
    assert_allclose(m1, m2, rtol=1e-4, atol=1e-5)
    assert_allclose(v1, v2, rtol=1e-3, atol=1e-5)

    # training through the sorted-scatter loss stays finite and improves
    u2, traj = eng.train(u, jnp.asarray(yv), jnp.asarray(mask), bounds,
                         jnp.asarray(0.05, jnp.float32), jit_,
                         iterations=6)
    assert np.isfinite(traj["loss"]).all()
    assert traj["loss"][-1] < traj["loss"][0]


def test_batched_cg_solves():
    X, grids, idx, wgt, p = _setup()
    n = X.shape[0]
    noise_pj = 0.5
    A = _dense_operator("RBF", p, grids, idx, wgt, noise_pj)
    factors = ski.grid_kernel_factors(
        "RBF", p, [jnp.asarray(g) for g in grids])
    mvm = lambda v: ski.ski_mvm(
        factors, jnp.asarray(idx), jnp.asarray(wgt), noise_pj,
        tuple(len(g) for g in grids), v)
    B = np.random.RandomState(2).rand(n, 2)
    Xsol, t_diags, t_offs = ski.batched_cg(mvm, jnp.asarray(B), iters=n)
    assert_allclose(np.asarray(Xsol), np.linalg.solve(A, B),
                    rtol=1e-5, atol=1e-7)


def test_slq_logdet_accuracy():
    """SLQ is an unbiased Hutchinson estimator: per-probe quadrature must be
    machine-exact (verified against logm), and the probe average must sit
    within its own statistical error bar of the true logdet."""
    import scipy.linalg as sla

    X, grids, idx, wgt, p = _setup(n=60)
    n = X.shape[0]
    noise_pj = 0.5
    A = _dense_operator("RBF", p, grids, idx, wgt, noise_pj)
    true_logdet = np.linalg.slogdet(A)[1]
    n_probes = 16
    probes = np.random.default_rng(0).choice(
        [-1.0, 1.0], size=(n, n_probes))
    factors = ski.grid_kernel_factors(
        "RBF", p, [jnp.asarray(g) for g in grids])
    mvm = lambda v: ski.ski_mvm(
        factors, jnp.asarray(idx), jnp.asarray(wgt), noise_pj,
        tuple(len(g) for g in grids), v)
    _, t_diags, t_offs = ski.batched_cg(mvm, jnp.asarray(probes), iters=60)
    est = ski._slq_from_tridiag(
        t_diags, t_offs, jnp.sum(jnp.asarray(probes) ** 2, axis=0))

    # per-probe quadrature exactness (converged Lanczos == z^T log(A) z)
    M = sla.logm(A)
    td, to = np.asarray(t_diags), np.asarray(t_offs)
    for i in range(4):
        T = (np.diag(td[:, i]) + np.diag(to[:-1, i], 1)
             + np.diag(to[:-1, i], -1))
        lamT, U = np.linalg.eigh(T)
        est_i = n * np.sum(U[0] ** 2 * np.log(np.maximum(lamT, 1e-300)))
        assert abs(est_i - probes[:, i] @ M @ probes[:, i]) < 1e-6

    # statistical error bar of the probe mean
    offdiag = M - np.diag(np.diag(M))
    sigma = np.sqrt(2.0 * (offdiag ** 2).sum() / n_probes)
    assert abs(float(est) - true_logdet) < 4.0 * sigma


@pytest.mark.parametrize("d", [1, 2, 3])
def test_kron_eig_root_matches_dense(d):
    """The separable-interpolation eigen-root must equal the brute-force
    W U_r sqrt(Lam_r) (same eigenspace, same column order) for any grid
    size - this ONE path now covers what used to be the small-grid
    materialized root AND the giant-grid fallback. Masked rows must be
    exactly zero."""
    X, grids, idx, wgt, p = _setup(d=d, n=30)
    n = X.shape[0]
    gshape = tuple(len(g) for g in grids)
    G = int(np.prod(gshape))
    rank = min(10, G)
    grids_j = [jnp.asarray(g) for g in grids]
    mask = np.ones(n)
    mask[-5:] = 0.0

    i0, w0 = ski.build_interp_sep(X, grids)
    L = np.asarray(ski.kron_eig_root(
        "RBF", p, grids_j, gshape, jnp.asarray(i0), jnp.asarray(w0),
        rank, mask=jnp.asarray(mask)))

    # brute force: dense Kronecker K_UU, dense eigh, dense W
    factors = [np.asarray(f) for f in
               ski.grid_kernel_factors("RBF", p, grids_j)]
    K = factors[0]
    for f in factors[1:]:
        K = np.kron(K, f)
    lam, U = np.linalg.eigh(K)
    order = np.argsort(lam)[::-1][:rank]
    W = np.zeros((n, G))
    for i in range(n):
        for s in range(idx.shape[1]):
            W[i, idx[i, s]] += wgt[i, s]
    Lref = mask[:, None] * (W @ (U[:, order] *
                                 np.sqrt(np.maximum(lam[order], 0.0))))
    # eigenvector sign/degenerate-block freedom: compare the Gram products
    assert_allclose(L @ L.T, Lref @ Lref.T, rtol=1e-6, atol=1e-8)
    assert np.abs(L[-5:]).max() == 0.0


def test_kron_eig_root_scales_past_old_grid_limit():
    """A grid with G * rank far beyond the old 32M-entry materialization
    limit must build its root without materializing anything G-sized
    (O(n r d) memory). 220^3 grid: G*rank ~ 1.4e9."""
    rng = np.random.RandomState(0)
    n, d, rank = 64, 3, 128
    X = rng.rand(n, d) * 100
    grids = [np.linspace(-1.0, 101.0, 220) for _ in range(d)]
    gshape = (220, 220, 220)
    p = {"lengthscale": jnp.asarray(np.full(d, 25.0)),
         "variance": jnp.asarray(1.0)}
    i0, w0 = ski.build_interp_sep(X, grids)
    L = np.asarray(ski.kron_eig_root(
        "RBF", p, [jnp.asarray(g) for g in grids], gshape,
        jnp.asarray(i0), jnp.asarray(w0), rank))
    assert L.shape == (n, rank)
    assert np.isfinite(L).all()
    # L L^T must approximate the true SKI kernel W K_UU W^T from above
    # spectral truncation only removes energy: diag(LL^T) <= k(x,x)
    diag = np.einsum("ij,ij->i", L, L)
    assert (diag <= 1.0 + 1e-5).all()
    assert diag.mean() > 0.5          # and it's not degenerately small


@pytest.mark.parametrize("precond_rank", [0, 12])
def test_ski_mll_value_and_grad(precond_rank):
    """Loss value matches the dense MLL; trace-estimated gradients point
    the same way as exact gradients (sign + rough magnitude). Run both
    unpreconditioned and with the pivoted-Cholesky preconditioner (N(0, P)
    probes + exact logdet P split)."""
    X, grids, idx, wgt, p = _setup(n=50)
    n = X.shape[0]
    noise_pj = jnp.asarray(0.4)
    y = np.random.RandomState(3).rand(n)
    rng = np.random.default_rng(1)
    g0 = jnp.asarray(rng.choice([-1.0, 1.0], size=(n, 16)))
    grids_j = [jnp.asarray(g) for g in grids]
    gshape = tuple(len(g) for g in grids)
    core = ski.ski_mll("RBF", grids_j, gshape,
                       jnp.asarray(idx), jnp.asarray(wgt),
                       n, g0)
    if precond_rank:
        i0, w0 = ski.build_interp_sep(X, grids)
        Lp = ski.kron_eig_root("RBF", p, grids_j, gshape,
                               jnp.asarray(i0), jnp.asarray(w0),
                               precond_rank)
    else:
        Lp = jnp.zeros((n, 0))
    Qp, lam_n, _ = ski.split_root(Lp)
    val = float(core(p, noise_pj, jnp.asarray(y), Qp, lam_n))
    A = _dense_operator("RBF", p, grids, idx, wgt, float(noise_pj))
    expected = 0.5 * y @ np.linalg.solve(A, y) + \
        0.5 * np.linalg.slogdet(A)[1]
    # the value embeds a 16-probe SLQ logdet estimate; compare within its
    # statistical error bar. Gaussian probes z ~ N(0, P): the estimated term
    # is tr(logm(P^-1/2 A P^-1/2)) with variance 2 ||logm(.)||_F^2 / p; the
    # unpreconditioned bound (P = noise I) also bounds the preconditioned
    # run, whose residual spectrum is strictly flatter.
    import scipy.linalg as sla
    M = sla.logm(A / float(noise_pj))
    sigma_val = 0.5 * np.sqrt(2.0 * (M ** 2).sum() / 16)
    assert abs(val - expected) < 4.0 * sigma_val

    def dense_loss(p_, noise_):
        factors = ski.grid_kernel_factors(
            "RBF", p_, [jnp.asarray(g) for g in grids])
        K = factors[0]
        for f in factors[1:]:
            K = jnp.kron(K, f)
        W = np.zeros((n, K.shape[0]))
        for i in range(idx.shape[0]):
            for s in range(idx.shape[1]):
                W[i, idx[i, s]] += wgt[i, s]
        A_ = jnp.asarray(W) @ K @ jnp.asarray(W.T) + \
            noise_ * jnp.eye(n)
        L = jnp.linalg.cholesky(A_)
        alpha = jax.scipy.linalg.cho_solve((L, True), jnp.asarray(y))
        return 0.5 * jnp.dot(jnp.asarray(y), alpha) + \
            jnp.sum(jnp.log(jnp.diagonal(L)))

    g_exact = jax.grad(dense_loss, argnums=(0, 1))(p, noise_pj)
    # statistically-calibrated gradient bound: resample the Rademacher
    # probe bases, bound |mean - exact| by the MEASURED standard error of
    # the estimator itself (same philosophy as the sigma_val value bound
    # above, no hand-picked constant). Measured single-draw relative sd
    # on this problem with the split-space Rademacher probes: ~10% at 48
    # probes preconditioned, ~9% at 96 unpreconditioned, scaling as
    # 1/sqrt(p); the z-test pins unbiasedness at any probe count. The
    # UNpreconditioned estimator needs ~2x the probes for the same error
    # - itself the measured argument for the default preconditioning.
    S = 6
    PROBES = 96 if precond_rank == 0 else 48
    ests = []
    for s_i in range(S):
        rng_s = np.random.default_rng(100 + s_i)
        g0s = jnp.asarray(rng_s.choice([-1.0, 1.0], size=(n, PROBES)))
        core_s = ski.ski_mll("RBF", grids_j, gshape,
                             jnp.asarray(idx), jnp.asarray(wgt),
                             n, g0s)
        ests.append(jax.grad(
            lambda pp, nn: core_s(pp, nn, jnp.asarray(y), Qp, lam_n),
            argnums=(0, 1))(p, noise_pj))
    exact_leaves = [np.atleast_1d(np.asarray(a))
                    for a in jax.tree_util.tree_leaves(g_exact)]
    per_seed = [list(map(np.asarray, jax.tree_util.tree_leaves(e)))
                for e in ests]                     # [seed][leaf]
    for li, a in enumerate(exact_leaves):
        stack = np.stack([np.atleast_1d(per_seed[s_i][li])
                          for s_i in range(S)])    # (S, ...)
        mean_est = stack.mean(axis=0)
        std_est = stack.std(axis=0, ddof=1)
        big = np.abs(a) > 1e-2
        if not big.any():
            continue
        # unbiasedness: the seed-mean must sit within 4 standard errors
        z = np.abs(mean_est - a) / (std_est / np.sqrt(S) + 1e-12)
        assert (z[big] < 4.0).all(), (z, a, mean_est)
        # precision: one 48/96-probe draw resolves the gradient to ~10%
        # (measured 10.1% worst leaf; margin for seed-to-seed spread of
        # the S=6 sd estimate itself, chi^2_5: ~1.3x at the 95% tail)
        rel_sd = std_est[big] / np.abs(a[big])
        assert rel_sd.max() < 0.13, rel_sd


def test_ski_model_end_to_end_on_grid():
    """On-grid data with a node-aligned grid: W is one-hot, product-RBF is
    the RBF, so SKI prediction must match the dense exact GP closely."""
    from gpim_tpu.gpreg.ski_model import SKIEngine
    from gpim_tpu.gpreg import engine as dense_engine
    from gpim_tpu.kernels.transforms import positive_inverse, interval_inverse

    rng = np.random.RandomState(0)
    g1, g2 = 16, 16
    xx, yy = np.meshgrid(np.arange(g1, dtype=np.float64),
                         np.arange(g2, dtype=np.float64), indexing="ij")
    Xfull = np.stack([xx.ravel(), yy.ravel()], -1)
    keep = rng.rand(len(Xfull)) < 0.7
    X = Xfull[keep]
    y = np.sin(X[:, 0] / 3) + np.cos(X[:, 1] / 4) + 0.05 * rng.randn(len(X))
    n = len(X)
    n_pad = 256
    Xp = np.zeros((n_pad, 2)); Xp[:n] = X
    yp = np.zeros(n_pad); yp[:n] = y
    mask = np.zeros(n_pad); mask[:n] = 1.0

    grids = [np.arange(-1.0, g1 + 1), np.arange(-1.0, g2 + 1)]
    eng = SKIEngine("RBF", Xp, mask, grids,
                    cg_iters=128, n_probes=8, rank=128, seed=0)
    bounds = {"ls_lo": jnp.zeros(2), "ls_hi": jnp.full(2, 10.0)}
    u = {
        "lengthscale": interval_inverse(jnp.full(2, 2.5),
                                        bounds["ls_lo"], bounds["ls_hi"]),
        "outputscale": positive_inverse(jnp.asarray(1.0)),
        "noise": positive_inverse(jnp.asarray(0.05)),
        "mean": jnp.asarray(0.1),
    }
    mean_ski, var_ski = eng.predict(
        u, jnp.asarray(yp), jnp.asarray(mask), bounds, 1e-6, Xfull)

    # dense exact GP with identical parameters (variance = outputscale,
    # mean handled by centering)
    from gpim_tpu.kernels.transforms import positive_forward
    u_dense = {
        "lengthscale": u["lengthscale"],
        "variance": jnp.log(jnp.exp(jnp.asarray(1.0)) - 1.0),  # inv softplus
        "noise": u["noise"],
    }
    bounds_d = dict(bounds, var_lo=jnp.asarray(1e-4),
                    var_hi=jnp.asarray(10.0))
    # variance interval transform differs; compute dense manually instead
    ls = np.asarray(2.5); var = 1.0
    noise = float(positive_forward(u["noise"]))
    mu = 0.1

    def k(a, b):
        d2 = (((a[:, None, :] - b[None, :, :]) / 2.5) ** 2).sum(-1)
        return var * np.exp(-0.5 * d2)

    K = k(X, X) + (noise + 1e-6) * np.eye(n)
    alpha = np.linalg.solve(K, y - mu)
    Ks = k(Xfull, X)
    mean_ref = Ks @ alpha + mu
    var_ref = var - np.einsum("ij,ji->i", Ks, np.linalg.solve(K, Ks.T)) \
        + noise

    assert_allclose(np.asarray(mean_ski), mean_ref, rtol=0, atol=5e-3)
    # LOVE rank-128 variance: a few percent accuracy is the contract
    assert_allclose(np.asarray(var_ski), var_ref, rtol=0.1, atol=5e-3)


def test_skreconstructor_masked_ski_end_to_end():
    """NaN-masked off-grid workload trained END-TO-END through the SKI
    CG+SLQ engine (forced small via ski_min_points) - reconstruction must
    agree with the dense exact path and track the ground truth. This is the
    regime of reference skgpr.py:436-440 (GridInterpolationKernel on masked
    cubes); the preconditioned train path is SKIEngine.train."""
    from scipy.ndimage import gaussian_filter
    from gpim_tpu import utils
    from gpim_tpu.gpreg.skgpr import skreconstructor

    rng = np.random.RandomState(1)
    shape = (14, 14, 6)
    f = gaussian_filter(rng.randn(*shape), sigma=(2.5, 2.5, 1.2))
    f = (f - f.min()) / (f.max() - f.min())
    R = f + 0.02 * rng.randn(*shape)
    sites = rng.choice(shape[0] * shape[1],
                       int(0.5 * shape[0] * shape[1]), replace=False)
    R.reshape(-1, shape[2])[sites] = np.nan
    X = utils.get_sparse_grid(R)
    Xf = utils.get_full_grid(R)
    common = dict(kernel="RBF", iterations=40, learning_rate=0.1, verbose=0)

    m_ski_model = skreconstructor(X, R, Xf, ski=True, ski_min_points=1,
                                  lattice=False, **common)
    assert m_ski_model._ski_engine is not None       # really the SKI path
    m_ski, s_ski, hp_ski = m_ski_model.run()
    m_d, s_d, _ = skreconstructor(X, R, Xf, ski=False, **common).run()

    assert np.isfinite(m_ski).all() and np.isfinite(s_ski).all()
    ls = np.asarray(hp_ski["lengthscale"])[-1].ravel()
    assert np.isfinite(ls).all() and (ls > 0).all()
    rmse_ski = float(np.sqrt(np.mean((m_ski.reshape(shape) - f) ** 2)))
    rmse_d = float(np.sqrt(np.mean((m_d.reshape(shape) - f) ** 2)))
    # tracks the truth and stays within striking distance of dense exact
    assert rmse_ski < 0.08, rmse_ski
    assert rmse_ski < rmse_d + 0.03, (rmse_ski, rmse_d)
    # the two engines reconstruct the same surface
    dis = float(np.sqrt(np.mean((m_ski - m_d) ** 2)))
    assert dis < 0.05, dis

    # the same data is lattice-aligned, so the DEFAULT routing picks the
    # masked-grid Kronecker engine - it must agree at least as well
    m_g_model = skreconstructor(X, R, Xf, ski=True, ski_min_points=1,
                                **common)
    assert m_g_model._mgrid_engine is not None
    m_g, s_g, hp_g = m_g_model.run()
    assert np.isfinite(m_g).all() and np.isfinite(s_g).all()
    rmse_g = float(np.sqrt(np.mean((m_g.reshape(shape) - f) ** 2)))
    assert rmse_g < 0.08, rmse_g
    dis_g = float(np.sqrt(np.mean((m_g - m_d) ** 2)))
    assert dis_g < 0.05, dis_g


def test_masked_grid_mvm_matches_dense():
    """The masked-grid operator A = M K_UU M + noise I (no gather/scatter)
    must equal the dense masked Kronecker matrix."""
    rng = np.random.RandomState(0)
    gshape = (6, 5, 4)
    axes = [np.arange(s, dtype=np.float64) for s in gshape]
    G = int(np.prod(gshape))
    mask = (rng.rand(G) < 0.6).astype(np.float64)
    p = {"lengthscale": jnp.asarray(np.array([1.5, 2.0, 1.0])),
         "variance": jnp.asarray(1.3)}
    noise_pj = 0.4
    factors = [np.asarray(f) for f in ski.grid_kernel_factors(
        "RBF", p, [jnp.asarray(a) for a in axes])]
    K = factors[0]
    for f in factors[1:]:
        K = np.kron(K, f)
    A = np.diag(mask) @ K @ np.diag(mask) + noise_pj * np.eye(G)
    mvm = ski.make_masked_grid_mvm(
        "RBF", [jnp.asarray(a) for a in axes], gshape, jnp.asarray(mask))
    v = rng.rand(G, 3)
    out = mvm(p, noise_pj, jnp.asarray(v))
    assert_allclose(np.asarray(out), A @ v, rtol=1e-8, atol=1e-10)


def test_masked_grid_engine_matches_dense_exact():
    """On a masked lattice the masked-grid engine is EXACT in W, so its
    posterior must match the dense exact GP (same product-RBF kernel) up to
    CG tolerance and Nystrom variance rank - including prediction on a 2x
    DENSER Cartesian grid (the dense_x super-resolution flow)."""
    from gpim_tpu.gpreg.mgrid_model import MaskedGridEngine
    from gpim_tpu.kernels.transforms import positive_inverse, \
        positive_forward, interval_inverse

    rng = np.random.RandomState(0)
    g1, g2 = 16, 14
    axes = [np.arange(g1, dtype=np.float64), np.arange(g2, dtype=np.float64)]
    xx, yy = np.meshgrid(axes[0], axes[1], indexing="ij")
    Y = np.sin(xx / 3.0) + np.cos(yy / 4.0) + 0.05 * rng.randn(g1, g2)
    Ymask = Y.copy()
    drop = rng.rand(g1, g2) < 0.4
    Ymask[drop] = np.nan
    mask_grid = ~np.isnan(Ymask)

    eng = MaskedGridEngine("RBF", axes, mask_grid, Ymask, np.float64,
                           cg_iters=256, precond_rank=g1 * g2, seed=0)
    bounds = {"ls_lo": jnp.zeros(2), "ls_hi": jnp.full(2, 10.0)}
    ls_val, var_val, noise_val, mu = 2.5, 1.0, 0.05, 0.1
    u = {"lengthscale": interval_inverse(jnp.full(2, ls_val),
                                         bounds["ls_lo"], bounds["ls_hi"]),
         "outputscale": positive_inverse(jnp.asarray(var_val)),
         "noise": positive_inverse(jnp.asarray(noise_val)),
         "mean": jnp.asarray(mu)}
    noise_act = float(positive_forward(u["noise"]))

    # dense exact twin on the observed points
    X = np.stack([xx[mask_grid], yy[mask_grid]], -1)
    yobs = Ymask[mask_grid]

    def k(a, b):
        d2 = (((a[:, None, :] - b[None, :, :]) / ls_val) ** 2).sum(-1)
        return var_val * np.exp(-0.5 * d2)

    Kd = k(X, X) + (noise_act + 1e-6) * np.eye(len(X))
    alpha = np.linalg.solve(Kd, yobs - mu)

    for dense_x in (1.0, 0.5):
        ta = [np.arange(0, g1 - 1 + 1e-9, dense_x),
              np.arange(0, g2 - 1 + 1e-9, dense_x)]
        tx, ty = np.meshgrid(ta[0], ta[1], indexing="ij")
        Xt = np.stack([tx.ravel(), ty.ravel()], -1)
        mean, var = eng.predict(u, bounds, 1e-6, Xt,
                                (len(ta[0]), len(ta[1])))
        Ks = k(Xt, X)
        mean_ref = Ks @ alpha + mu
        var_ref = var_val - np.einsum(
            "ij,ji->i", Ks, np.linalg.solve(Kd, Ks.T)) + noise_act
        assert_allclose(np.asarray(mean), mean_ref, rtol=0, atol=2e-3)
        assert_allclose(np.asarray(var), var_ref, rtol=0.05, atol=2e-3)

    # scattered (non-Cartesian) test points take the fallback path
    Xs = rng.rand(40, 2) * [[g1 - 1, g2 - 1]]
    mean_s, var_s = eng.predict(u, bounds, 1e-6, Xs, None)
    Ks = k(Xs, X)
    mean_ref = Ks @ alpha + mu
    # interpolation error of W_* at off-lattice points bounds the tolerance
    assert np.max(np.abs(np.asarray(mean_s) - mean_ref)) < 0.05
    assert (np.asarray(var_s) > 0).all()


def test_masked_grid_engine_128_padding_exact():
    """Axes whose length is a multiple of 128 are padded away from the TPU
    backend's miscompile trigger (see MaskedGridEngine.__init__). Padding
    must be applied - and must leave the posterior identical to an
    unpadded engine of the same data, because the padded cells are masked
    exact-noise rows that decouple from the observed block."""
    from gpim_tpu.gpreg.mgrid_model import MaskedGridEngine
    from gpim_tpu.kernels.transforms import positive_inverse, interval_inverse

    rng = np.random.RandomState(0)
    g1, g2 = 128, 6
    axes = [np.arange(g1, dtype=np.float64), np.arange(g2, dtype=np.float64)]
    Y = np.sin(axes[0][:, None] / 9.0) + np.cos(axes[1][None, :] / 2.0)
    Y = Y + 0.03 * rng.randn(g1, g2)
    Ymask = Y.copy()
    Ymask[rng.rand(g1, g2) < 0.5] = np.nan
    mask_grid = ~np.isnan(Ymask)

    # full-rank Nystrom (capped to G inside) so the variance comparison is
    # not confounded by the slightly different padded/unpadded eigenbases
    kw = dict(cg_iters=512, precond_rank=4096, seed=0, pad_dodge=True)
    eng = MaskedGridEngine("RBF", axes, mask_grid, Ymask, np.float64, **kw)
    assert eng._pads == [4, 0]
    assert eng.grid_shape == (132, 6)
    assert eng.n_eff == int(mask_grid.sum())

    # unpadded twin: same data on a 127-cell axis (drop the last grid line)
    eng_ref = MaskedGridEngine("RBF", [axes[0][:-1], axes[1]],
                               mask_grid[:-1], Ymask[:-1], np.float64, **kw)
    assert eng_ref._pads == [0, 0]

    bounds = {"ls_lo": jnp.zeros(2), "ls_hi": jnp.full(2, 20.0)}
    u = {"lengthscale": interval_inverse(jnp.full(2, 3.0),
                                         bounds["ls_lo"], bounds["ls_hi"]),
         "outputscale": positive_inverse(jnp.asarray(1.0)),
         "noise": positive_inverse(jnp.asarray(0.05)),
         "mean": jnp.zeros(())}
    # compare on the shared 127x6 lattice (Cartesian fast path)
    tx, ty = np.meshgrid(axes[0][:-1], axes[1], indexing="ij")
    Xt = np.stack([tx.ravel(), ty.ravel()], -1)
    mean_p, var_p = eng.predict(u, bounds, 1e-6, Xt, (g1 - 1, g2))
    mean_r, var_r = eng_ref.predict(u, bounds, 1e-6, Xt, (g1 - 1, g2))
    # the dropped 128th grid line has observed cells in the padded engine,
    # so only the mean at cells far from it should agree tightly; instead
    # make the twin exact: mask out that line in the padded engine too
    Ymask2 = Ymask.copy()
    Ymask2[-1] = np.nan
    eng2 = MaskedGridEngine("RBF", axes, ~np.isnan(Ymask2), Ymask2,
                            np.float64, **kw)
    mean_2, var_2 = eng2.predict(u, bounds, 1e-6, Xt, (g1 - 1, g2))
    assert_allclose(np.asarray(mean_2), np.asarray(mean_r), atol=5e-6)
    assert_allclose(np.asarray(var_2), np.asarray(var_r), atol=5e-4)
    # training runs and stays finite through the padded path
    u_t, traj = eng.train(u, bounds, 0.1, 1e-6, iterations=3)
    assert np.isfinite(traj["loss"]).all()


def test_masked_grid_engine_training_converges():
    """End-to-end training through the masked-grid engine must recover a
    reasonable lengthscale and reduce the loss."""
    from gpim_tpu.gpreg.mgrid_model import MaskedGridEngine
    from gpim_tpu.kernels.transforms import positive_inverse, interval_inverse

    rng = np.random.RandomState(1)
    g1, g2 = 20, 20
    axes = [np.arange(g1, dtype=np.float64), np.arange(g2, dtype=np.float64)]
    xx, yy = np.meshgrid(axes[0], axes[1], indexing="ij")
    Y = np.exp(-((xx - 10) ** 2 + (yy - 10) ** 2) / 50.0)
    Ymask = Y + 0.02 * rng.randn(g1, g2)
    Ymask[rng.rand(g1, g2) < 0.4] = np.nan

    eng = MaskedGridEngine("RBF", axes, ~np.isnan(Ymask), Ymask, np.float64,
                           cg_iters=128, precond_rank=256, seed=0)
    bounds = {"ls_lo": jnp.zeros(2), "ls_hi": jnp.full(2, 10.0)}
    u0 = {"lengthscale": interval_inverse(jnp.full(2, 1.0),
                                          bounds["ls_lo"], bounds["ls_hi"]),
          "outputscale": positive_inverse(jnp.asarray(1.0)),
          "noise": positive_inverse(jnp.asarray(1.0)),
          "mean": jnp.zeros(())}
    u, traj = eng.train(u0, bounds, 0.1, 1e-6, iterations=40)
    assert traj["loss"][-1] < traj["loss"][0]
    assert np.isfinite(traj["loss"]).all()
    ls = np.asarray(traj["lengthscale"][-1])
    assert (ls > 0.5).all() and (ls < 10.0).all()


def test_batched_pcg_return_iters_and_split_solve():
    """batched_pcg(return_iters=True) reports the while_loop trip count
    (below the cap when every column converges early); the split solve
    (split_root + split_apply + split_pcg) matches the dense solution and
    the hoisted-LtL form of split_root is exactly equivalent to the
    internal product."""
    X, grids, idx, wgt, p = _setup(n=50)
    n = X.shape[0]
    noise_pj = jnp.asarray(0.4)
    A = _dense_operator("RBF", p, grids, idx, wgt, float(noise_pj))
    factors = ski.grid_kernel_factors(
        "RBF", p, [jnp.asarray(g) for g in grids])
    mvm = lambda v: ski.ski_mvm(
        factors, jnp.asarray(idx), jnp.asarray(wgt), noise_pj,
        tuple(len(g) for g in grids), v)

    i0, w0 = ski.build_interp_sep(X, grids)
    gshape = tuple(len(g) for g in grids)
    Lp = ski.kron_eig_root("RBF", p, [jnp.asarray(g) for g in grids],
                           gshape, jnp.asarray(i0), jnp.asarray(w0), 16)
    LtL = Lp.T @ Lp
    Qp, lam_n, Un = ski.split_root(Lp)
    Qp2, lam_n2, _ = ski.split_root(Lp, LtL)
    assert_allclose(np.asarray(Qp2), np.asarray(Qp), rtol=0, atol=0)
    assert_allclose(np.asarray(lam_n2), np.asarray(lam_n), rtol=0, atol=0)
    # orthonormal basis + exact reconstruction of Lp Lp^T
    QtQ = np.asarray(Qp.T @ Qp)
    live = np.asarray(lam_n) > 0
    assert_allclose(QtQ[np.ix_(live, live)], np.eye(int(live.sum())),
                    atol=1e-5)
    lam_max = float(np.max(np.asarray(lam_n)))
    assert_allclose(np.asarray(Qp) * np.asarray(lam_n) @ np.asarray(Qp.T),
                    np.asarray(Lp @ Lp.T), atol=1e-5 * max(1.0, lam_max))

    pisqrt, logdetP = ski.split_apply(Qp, lam_n, noise_pj)
    # P^-1/2 really is the inverse square root of P = noise I + Lp Lp^T
    P = np.asarray(Lp @ Lp.T) + float(noise_pj) * np.eye(n)
    V = np.random.RandomState(5).rand(n, 2)
    PiV = np.asarray(pisqrt(pisqrt(jnp.asarray(V))))
    assert_allclose(PiV, np.linalg.solve(P, V), rtol=1e-4, atol=1e-6)
    assert_allclose(float(logdetP), float(np.linalg.slogdet(P)[1]),
                    rtol=1e-5)

    B = jnp.asarray(np.random.RandomState(2).rand(n, 3))
    Xs, _, _, k = ski.split_pcg(mvm, pisqrt, B, n, return_iters=True)
    k = int(k)
    assert 0 < k < n            # preconditioned solve converges early
    assert_allclose(np.asarray(Xs), np.linalg.solve(A, np.asarray(B)),
                    rtol=1e-5, atol=1e-6)
    # the 3-tuple contract is unchanged
    Xs2, td, to = ski.split_pcg(mvm, pisqrt, B, n)
    assert_allclose(np.asarray(Xs2), np.asarray(Xs), rtol=0, atol=0)


def test_split_pcg_survives_extreme_conditioning():
    """The regression the split form fixes: at lam_max/noise ~ 1e6 in f32
    the plain Woodbury-PCG quadratic form r^T P^-1 r goes NEGATIVE, its
    breakdown guard fires on iteration 1, and the returned 'solution'
    carries an O(1) residual (the round-3 1M-point TPU failure, here
    reproduced small). The split solve must converge to a small residual
    at the same conditioning."""
    rng = np.random.RandomState(0)
    g1d = np.arange(48.0)
    axes = [g1d, g1d]
    p = {"lengthscale": jnp.asarray([20.0, 20.0]),
         "variance": jnp.asarray(1.0)}
    noise_pj = jnp.asarray(2e-4)   # kappa ~ lam_max/noise ~ 3e6
    gshape = (48, 48)
    mask = (rng.rand(48 * 48) < 0.5).astype(np.float32)
    mvm_raw = ski.make_masked_grid_mvm(
        "RBF", [jnp.asarray(a, jnp.float32) for a in axes], gshape,
        jnp.asarray(mask))
    kp = dict(p)
    mvm = lambda v: mvm_raw(kp, noise_pj, v)
    lam_top, Us, mdim = ski._kron_top_modes(
        "RBF", p, [jnp.asarray(a, jnp.float32) for a in axes], 96)
    sel = [Us[k][:, mdim[k]] for k in range(2)]
    Lp = ski.grid_kr_rows(sel, lam_top, jnp.asarray(mask))
    y = jnp.asarray((mask * rng.randn(48 * 48)).astype(np.float32))

    Qp, lam_n, _ = ski.split_root(Lp)
    pisqrt, _ = ski.split_apply(Qp, lam_n, noise_pj)
    Xs, _, _, k = ski.split_pcg(mvm, pisqrt, y[:, None], 300,
                                return_iters=True)
    r = y[:, None] - mvm(Xs)
    rel = float(jnp.sqrt(jnp.sum(r * r) / jnp.sum(y * y)))
    assert rel < 1e-3, (rel, int(k))


def _mgrid_setup(seed=0):
    rng = np.random.RandomState(seed)
    axes = [jnp.asarray(np.arange(12.0)), jnp.asarray(np.arange(10.0)),
            jnp.asarray(np.arange(7.0))]
    gshape = (12, 10, 7)
    G = int(np.prod(gshape))
    p = {"lengthscale": jnp.asarray([3.0, 2.5, 2.0]),
         "variance": jnp.asarray(1.3)}
    mask = jnp.asarray((rng.rand(G) < 0.6).astype(np.float32))
    return rng, axes, gshape, G, p, mask


def test_mgrid_split_root_matches_dense():
    """The factored KronRoot basis (mode products + sorted mode
    gather/scatter + r x r rotation, ski.mgrid_split_root) is the SAME
    operator as the dense split_root of the materialized grid root: same
    preconditioner spectrum, same P^-1/2 action, same exact logdet - the
    (G, r) matrix is an implementation detail, not part of the math."""
    rng, axes, gshape, G, p, mask = _mgrid_setup()
    noise = jnp.asarray(0.05)
    rank = 40

    lam_top, Us, mdim = ski._kron_top_modes("RBF", p, axes, rank)
    sel = [Us[k][:, mdim[k]] for k in range(3)]
    Lp = ski.grid_kr_rows(sel, lam_top, mask)
    Qd, lam_d, _ = ski.split_root(Lp)
    pis_d, ld_d = ski.split_apply(Qd, lam_d, noise)

    q, lam_s, Un, (lt_s, Us_s, mdim_s, sel_s) = ski.mgrid_split_root(
        "RBF", p, axes, gshape, mask, rank)
    assert isinstance(q, ski.KronRoot)
    pis_s, ld_s = ski.split_apply(q, lam_s, noise)

    assert_allclose(np.sort(np.asarray(lam_s)), np.sort(np.asarray(lam_d)),
                    rtol=1e-4, atol=1e-5)
    assert_allclose(float(ld_s), float(ld_d), rtol=1e-6)
    V = jnp.asarray(rng.randn(G, 3))
    a, b = np.asarray(pis_d(V)), np.asarray(pis_s(V))
    assert_allclose(b, a, rtol=1e-5, atol=1e-6 * np.abs(a).max())
    # P^-1 action against a dense solve of the true P
    P = np.asarray(Lp @ Lp.T) + float(noise) * np.eye(G)
    PiV = np.asarray(pis_s(pis_s(V)))
    assert_allclose(PiV, np.linalg.solve(P, np.asarray(V)),
                    rtol=1e-4, atol=1e-6)


def test_batch_first_layout_equivalence():
    """vec_axis=1 (batch-first - the TPU-tiling-friendly CG layout) is
    numerically the same algorithm as the column layout: same pisqrt
    action, same masked-grid mvm, same solves, and the same MLL
    value+gradient through the custom-VJP core."""
    rng, axes, gshape, G, p, mask = _mgrid_setup()
    noise = jnp.asarray(0.05)

    q, lam_s, _, _ = ski.mgrid_split_root("RBF", p, axes, gshape, mask, 40)
    pis0, ld0 = ski.split_apply(q, lam_s, noise)
    pis1, ld1 = ski.split_apply(q, lam_s, noise, vec_axis=1)
    V = jnp.asarray(rng.randn(G, 3))
    a = np.asarray(pis0(V))
    assert_allclose(np.asarray(pis1(V.T)).T, a,
                    rtol=1e-5, atol=1e-6 * np.abs(a).max())
    assert float(ld0) == float(ld1)

    mvm0 = ski.make_masked_grid_mvm("RBF", axes, gshape, mask)
    mvm1 = ski.make_masked_grid_mvm("RBF", axes, gshape, mask,
                                    batch_first=True)
    m0 = np.asarray(mvm0(p, noise, V))
    assert_allclose(np.asarray(mvm1(p, noise, V.T)).T, m0,
                    rtol=1e-6, atol=1e-7 * np.abs(m0).max())

    s0 = ski.split_pcg(lambda v: mvm0(p, noise, v), pis0, V, G)[0]
    s1 = ski.split_pcg(lambda v: mvm1(p, noise, v), pis1, V.T, G,
                       vec_axis=1)[0]
    assert_allclose(np.asarray(s1).T, np.asarray(s0), rtol=1e-4,
                    atol=1e-5 * np.abs(np.asarray(s0)).max())

    g0c = jnp.asarray(rng.choice([-1.0, 1.0], size=(G, 8)))
    y = jnp.asarray(rng.randn(G) * np.asarray(mask))
    core0 = ski.ski_mll_from_mvm(mvm0, 60, g0c)
    core1 = ski.ski_mll_from_mvm(mvm1, 60, jnp.asarray(np.asarray(g0c).T),
                                 vec_axis=1)
    v0, gr0 = jax.jit(jax.value_and_grad(
        lambda pp, nn: core0(pp, nn, y, q, lam_s),
        argnums=(0, 1)))(p, noise)
    v1, gr1 = jax.jit(jax.value_and_grad(
        lambda pp, nn: core1(pp, nn, y, q, lam_s),
        argnums=(0, 1)))(p, noise)
    assert_allclose(float(v1), float(v0), rtol=1e-5)
    for a_, b_ in zip(jax.tree_util.tree_leaves(gr0),
                      jax.tree_util.tree_leaves(gr1)):
        assert_allclose(np.asarray(b_), np.asarray(a_), rtol=1e-4,
                        atol=1e-6 * max(1.0, float(np.abs(a_).max())))


def test_masked_grid_engine_4d_end_to_end():
    """The masked-lattice engine is dimension-generic: a 4D NaN-masked
    cube (the reference's cKPFM-style regime with missing spectra, which
    the full-grid Kronecker-exact path cannot take) trains and predicts
    through skreconstructor with finite outputs and a sane fit."""
    from gpim_tpu import skreconstructor, utils

    rng = np.random.RandomState(0)
    shape = (8, 8, 6, 10)
    gs = [np.arange(s, dtype=np.float64) for s in shape]
    aa, bb, cc, dd = np.meshgrid(*gs, indexing="ij")
    truth = (np.sin(aa / 3.0) * np.cos(bb / 3.5)
             + 0.5 * np.sin(cc / 2.0) + 0.2 * np.cos(dd / 4.0))
    truth = (truth - truth.min()) / np.ptp(truth)
    R = truth + 0.02 * rng.randn(*shape)
    sites = rng.choice(shape[0] * shape[1],
                       int(0.5 * shape[0] * shape[1]), replace=False)
    R.reshape(shape[0] * shape[1], -1)[sites] = np.nan
    X = utils.get_sparse_grid(R)
    Xf = utils.get_full_grid(R)
    m = skreconstructor(X, R, Xf, kernel="RBF", iterations=40,
                        learning_rate=0.1, verbose=0, ski_min_points=1)
    mean, sd, hp = m.run()
    assert m._mgrid_engine is not None          # routed to the 4D lattice
    assert np.isfinite(mean).all() and np.isfinite(sd).all()
    rmse = float(np.sqrt(np.mean((mean.reshape(shape) - truth) ** 2)))
    assert rmse < 0.5 * float(np.nanstd(R)), rmse


def test_mgrid_split_root_dim_cap_plumbs_through():
    """dim_cap=None (the prediction-path setting) reproduces the dense
    uncapped selection; an artificially tiny explicit cap produces a
    STRICTLY worse eigenspace (less captured spectrum mass) - i.e. the
    knob really restricts the candidate rectangle, which is why predict
    paths pass None (ski.mgrid_split_root docstring)."""
    rng, axes, gshape, G, p, mask = _mgrid_setup()
    # anisotropic lengthscales: slow per-dim decay along dim 0
    p = {"lengthscale": jnp.asarray([0.6, 3.0, 2.5]),
         "variance": jnp.asarray(1.3)}
    rank = 24
    _, lam_none, _, (lt_none, _, _, _) = ski.mgrid_split_root(
        "RBF", p, axes, gshape, mask, rank, dim_cap=None)
    _, lam_tiny, _, (lt_tiny, _, _, _) = ski.mgrid_split_root(
        "RBF", p, axes, gshape, mask, rank, dim_cap=4)
    # same rank, strictly less captured kernel-spectrum mass under the cap
    assert lt_tiny.shape == lt_none.shape
    assert float(jnp.sum(lt_tiny)) < 0.999 * float(jnp.sum(lt_none))


@pytest.mark.parametrize("kernel", ["Matern52"])
def test_masked_grid_engine_nonrbf_kernels(kernel):
    """The masked-grid CG/SLQ path with non-RBF product kernels: the
    per-dim factor build, eigen preconditioner and split solves are
    kernel-agnostic, but only RBF exercised them end to end before. A
    masked lattice forced through the engine must train to a finite,
    sane fit (reference skgpr supports Matern52 on its SKI path,
    gpytorch_kernels.py:60-73; RationalQuadratic is Pyro-side only and
    is correctly rejected by skreconstructor - parity surface)."""
    from gpim_tpu import skreconstructor, utils

    rng = np.random.RandomState(0)
    shape = (24, 20, 6)
    gx, gy, gz = np.meshgrid(*[np.arange(s, dtype=np.float64)
                               for s in shape], indexing="ij")
    truth = np.sin(gx / 4.0) * np.cos(gy / 5.0) + 0.3 * np.sin(gz / 2.0)
    truth = (truth - truth.min()) / np.ptp(truth)
    R = truth + 0.02 * rng.randn(*shape)
    sites = rng.choice(shape[0] * shape[1],
                       int(0.5 * shape[0] * shape[1]), replace=False)
    R.reshape(-1, shape[2])[sites] = np.nan
    X = utils.get_sparse_grid(R)
    Xf = utils.get_full_grid(R)
    m = skreconstructor(X, R, Xf, kernel=kernel, iterations=30,
                        learning_rate=0.1, verbose=0, ski_min_points=1)
    mean, sd, hp = m.run()
    assert m._mgrid_engine is not None
    assert np.isfinite(mean).all() and np.isfinite(sd).all()
    rmse = float(np.sqrt(np.mean((mean.reshape(shape) - truth) ** 2)))
    assert rmse < 0.5 * float(np.nanstd(R)), (kernel, rmse)
