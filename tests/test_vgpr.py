"""
Multi-output GP tests: shapes, NaN handling, and closed-form correctness of
both independent (vmapped) and correlated (Kronecker) modes. The reference
never tested vgpr at all (SURVEY.md section 4).
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from gpim_tpu.gpreg import vgpr
from gpim_tpu import utils as gprutils


def get_vector_data(seed=0, n1=12, n2=12, d=3, nan_frac=0.3):
    """Small 2D grid with d output channels and NaN-ed out pixels."""
    rng = np.random.RandomState(seed)
    xx, yy = np.meshgrid(np.arange(n1, dtype=float),
                         np.arange(n2, dtype=float), indexing="ij")
    base = np.exp(-((xx - 5) ** 2 + (yy - 7) ** 2) / 8.0)
    Y = np.stack([base * (k + 1) * 0.3 + 0.05 * rng.rand(n1, n2)
                  for k in range(d)], axis=-1)
    drop = rng.rand(n1, n2) < nan_frac
    Y[drop] = np.nan
    X = gprutils.get_full_grid(Y[..., 0])
    X = X.copy()
    X[:, drop] = np.nan
    return X, Y


@pytest.mark.parametrize("independent", [True, False])
def test_vgpr_shapes(independent):
    X, Y = get_vector_data()
    Xtest = gprutils.get_full_grid(Y[..., 0])
    mean, sd, hp = vgpr.vreconstructor(
        X, Y, Xtest, kernel='RBF', independent=independent,
        iterations=3, verbose=0).run()
    assert mean.shape == sd.shape == (12, 12, 3)
    assert not np.isnan(mean).any()
    assert not np.isnan(sd).any()
    assert len(hp["lengthscale"]) == 3


def test_independent_matches_single_gpr():
    """Each channel of the independent multi-output GP must equal a
    single-output GP trained on that channel alone (same init/optimizer)."""
    from gpim_tpu.gpreg import multi, engine
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    n, d_in, T = 30, 2, 2
    X = rng.rand(n, d_in) * 8
    Y = np.stack([np.sin(X[:, 0]) + 0.1 * rng.rand(n),
                  np.cos(X[:, 1]) + 0.1 * rng.rand(n)], axis=-1)
    Xt = rng.rand(9, d_in) * 8

    bounds = {"ls_lo": jnp.zeros(d_in), "ls_hi": jnp.full(d_in, 6.0)}
    from gpim_tpu.kernels.transforms import interval_inverse, positive_inverse
    u_ls = interval_inverse(jnp.full(d_in, 0.6), bounds["ls_lo"],
                            bounds["ls_hi"])
    one = jnp.asarray(1.0, jnp.float64)
    u_joint = {
        "lengthscale": jnp.tile(u_ls, (T, 1)),
        "outputscale": jnp.full((T,), positive_inverse(one)),
        "noise": jnp.full((T,), positive_inverse(one)),
        "mean": jnp.zeros((T,)),
    }
    mask = jnp.ones(n)
    u_fit, _ = multi.train_independent(
        u_joint, jnp.asarray(X), jnp.asarray(Y), mask, bounds,
        jnp.asarray(0.1), jnp.asarray(1e-6), kernel="RBF", iterations=20)
    chunks, nt = engine.chunk_rows(Xt, 9)
    mean_joint, var_joint = multi.predict_independent(
        u_fit, jnp.asarray(X), jnp.asarray(Y), mask, bounds,
        jnp.asarray(1e-6), jnp.asarray(chunks), kernel="RBF")

    # channel-by-channel training with the same machinery
    for t in range(T):
        u_t = {
            "lengthscale": u_joint["lengthscale"][t][None].reshape(1, d_in),
            "outputscale": u_joint["outputscale"][t][None],
            "noise": u_joint["noise"][t][None],
            "mean": u_joint["mean"][t][None],
        }
        u_t_fit, _ = multi.train_independent(
            u_t, jnp.asarray(X), jnp.asarray(Y[:, t:t + 1]), mask, bounds,
            jnp.asarray(0.1), jnp.asarray(1e-6), kernel="RBF", iterations=20)
        m_t, v_t = multi.predict_independent(
            u_t_fit, jnp.asarray(X), jnp.asarray(Y[:, t:t + 1]), mask,
            bounds, jnp.asarray(1e-6), jnp.asarray(chunks), kernel="RBF")
        assert_allclose(np.asarray(mean_joint)[:, t], np.asarray(m_t)[:, 0],
                        rtol=1e-8, atol=1e-10)
        assert_allclose(np.asarray(var_joint)[:, t], np.asarray(v_t)[:, 0],
                        rtol=1e-8, atol=1e-10)


def test_correlated_matches_dense_kronecker():
    """The rotated-basis Kronecker solver must equal the dense nT x nT GP."""
    from gpim_tpu.gpreg import multi, engine
    import jax.numpy as jnp

    rng = np.random.RandomState(4)
    n, d_in, T = 18, 2, 3
    X = rng.rand(n, d_in) * 5
    Y = rng.rand(n, T)
    Xt = rng.rand(7, d_in) * 5
    bounds = {"ls_lo": jnp.zeros(d_in), "ls_hi": jnp.full(d_in, 6.0)}

    from gpim_tpu.kernels.transforms import (
        interval_inverse, positive_inverse, interval_forward,
        positive_forward)
    u = {
        "lengthscale": interval_inverse(
            jnp.full(d_in, 1.2), bounds["ls_lo"], bounds["ls_hi"]),
        "noise": positive_inverse(jnp.asarray(0.3)),
        "mean": jnp.asarray(rng.rand(T) * 0.1),
        "F": jnp.asarray(rng.rand(T, 1)),
        "task_var": positive_inverse(jnp.asarray(rng.rand(T) + 0.5)),
    }
    jitter = 1e-8
    chunks, nt = engine.chunk_rows(Xt, 7)
    mean, var = multi.predict_correlated(
        u, jnp.asarray(X), jnp.asarray(Y), bounds, jnp.asarray(jitter),
        jnp.asarray(chunks), kernel="RBF")
    mean, var = np.asarray(mean)[:nt], np.asarray(var)[:nt]

    # dense reference: K = Kx (x) B + noise I  (task-major ordering mapped
    # to our (n, T) layout by kron(Kx, B) with y flattened row-major)
    ls = np.asarray(interval_forward(
        u["lengthscale"], bounds["ls_lo"], bounds["ls_hi"]))
    noise = float(positive_forward(u["noise"]))
    F = np.asarray(u["F"])
    tv = np.asarray(positive_forward(u["task_var"]))
    B = F @ F.T + np.diag(tv)
    mu = np.asarray(u["mean"])

    def k(a, b):
        d2 = (((a[:, None, :] - b[None, :, :]) / ls) ** 2).sum(-1)
        return np.exp(-0.5 * d2)

    Kbig = np.kron(k(X, X), B) + (noise + jitter * 1.0) * np.eye(n * T)
    # our jitter multiplies lam_t inside A_t = lam Kx + (noise+jit) I; the
    # dense equivalent of that jitter placement is noise+jitter on the diag
    yc = (Y - mu[None, :]).reshape(-1)
    alpha = np.linalg.solve(Kbig, yc)
    Ks = np.kron(k(Xt, X), B)
    mean_ref = (Ks @ alpha).reshape(-1, T) + mu[None, :]
    cov_ref = np.kron(k(Xt, Xt), B) - Ks @ np.linalg.solve(Kbig, Ks.T)
    var_ref = np.diag(cov_ref).reshape(-1, T) + noise
    assert_allclose(mean, mean_ref, rtol=1e-6, atol=1e-8)
    assert_allclose(var, var_ref, rtol=1e-6, atol=1e-8)


def test_corr_loss_gradients_match_dense():
    """The O(T n^3) custom-VJP training loss must match value AND gradients
    of the dense (nT x nT) Cholesky loss - including at a task covariance
    with exactly repeated eigenvalues (rank-1 F + equal diagonal), the case
    where autodiff through eigh(B) is singular."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from gpim_tpu.gpreg import multi
    from gpim_tpu.kernels.functional import get_kernel_fn
    from gpim_tpu.kernels.transforms import (
        interval_inverse, positive_inverse, interval_log_jacobian)

    rng = np.random.RandomState(7)
    n, d_in, T = 20, 2, 4
    X = jnp.asarray(rng.rand(n, d_in) * 4)
    Y = jnp.asarray(rng.rand(n, T))
    bounds = {"ls_lo": jnp.zeros(d_in), "ls_hi": jnp.full(d_in, 6.0)}
    jitter = jnp.asarray(1e-8)

    def dense_loss(u, X, Y, bounds, jitter, *, kernel):
        import math
        kfn = get_kernel_fn(kernel)
        p = multi._constrain_corr(u, bounds)
        n_, T_ = Y.shape
        B = multi._task_cov(p)
        Kx = kfn(p, X, X)
        Kbig = (Kx[:, None, :, None] * B[None, :, None, :]
                ).reshape(n_ * T_, n_ * T_)
        A = Kbig + (p["noise"] + jitter) * jnp.eye(n_ * T_, dtype=X.dtype)
        L = jnp.linalg.cholesky(A)
        yc = (Y - p["mean"][None, :]).reshape(-1)
        from jax.scipy.linalg import solve_triangular
        z = solve_triangular(L, yc, lower=True)
        nll = (0.5 * jnp.dot(z, z)
               + jnp.sum(jnp.log(jnp.diagonal(L)))
               + 0.5 * n_ * T_ * math.log(2.0 * math.pi))
        return nll - interval_log_jacobian(
            u["lengthscale"], bounds["ls_lo"], bounds["ls_hi"])

    # rank-1 F and EQUAL task_var: B has T-1 exactly repeated eigenvalues
    u = {
        "lengthscale": interval_inverse(
            jnp.full(d_in, 1.5), bounds["ls_lo"], bounds["ls_hi"]),
        "noise": positive_inverse(jnp.asarray(0.2)),
        "mean": jnp.asarray(rng.rand(T) * 0.1),
        "F": jnp.asarray(rng.rand(T, 1)),
        "task_var": jnp.full((T,), positive_inverse(jnp.asarray(0.7))),
    }
    v1, g1 = jax.value_and_grad(
        partial(multi._corr_loss, kernel="RBF"))(u, X, Y, bounds, jitter)
    v2, g2 = jax.value_and_grad(
        partial(dense_loss, kernel="RBF"))(u, X, Y, bounds, jitter)
    assert_allclose(float(v1), float(v2), rtol=1e-8)
    for k in u:
        assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                        rtol=1e-6, atol=1e-8, err_msg=k)


def test_corr_train_moderate_scale():
    """The decoupled loss trains at n*T sizes where the dense (nT)^2 system
    would be prohibitive (50k x 50k = 20 GB); memory here is T n^2."""
    import jax.numpy as jnp
    from gpim_tpu.gpreg import multi
    from gpim_tpu.kernels.transforms import interval_inverse, positive_inverse

    rng = np.random.RandomState(0)
    n, d_in, T = 2000, 2, 5                      # nT = 10k on CPU tests
    X = jnp.asarray(rng.rand(n, d_in) * 10, jnp.float32)
    Y = jnp.asarray(rng.rand(n, T), jnp.float32)
    bounds = {"ls_lo": jnp.zeros(d_in, jnp.float32),
              "ls_hi": jnp.full(d_in, 6.0, jnp.float32)}
    one = jnp.asarray(1.0, jnp.float32)
    u = {
        "lengthscale": interval_inverse(
            jnp.full(d_in, 1.5, jnp.float32),
            bounds["ls_lo"], bounds["ls_hi"]),
        "noise": positive_inverse(one),
        "mean": jnp.zeros(T, jnp.float32),
        "F": jnp.asarray(0.1 * rng.rand(T, 1), jnp.float32),
        "task_var": jnp.full((T,), positive_inverse(one)),
    }
    u2, traj = multi.train_correlated(
        u, X, Y, bounds, jnp.asarray(0.05, jnp.float32),
        jnp.asarray(1e-4, jnp.float32), kernel="RBF", iterations=2)
    losses = np.asarray(traj["loss"])
    assert np.isfinite(losses).all()
    assert losses[1] <= losses[0]


def test_vgpr_nan_row_dropping():
    """Rows with any NaN channel are dropped (gprutils.py:53-55 parity)."""
    X, Y = get_vector_data(nan_frac=0.5)
    m = vgpr.vreconstructor(X, Y, None, iterations=1, verbose=0,
                            independent=True)
    complete = ~np.isnan(Y).any(-1)
    assert m.y.shape == (complete.sum(), 3)


def test_independent_predict_closed_form_padded_grid():
    """Regression for an XLA:CPU whole-graph miscompilation (jax 0.9.0):
    with a zero-padded masked grid, long lengthscales relative to the grid
    span, and the vmapped Gram -> batched Cholesky -> solves pipeline fused
    into one jit, the predictive mean was off by ~0.29 relative and the
    variance clamped to zero at observed pixels, while the eager (op-by-op)
    result was exact. Fixed by pinning the Cholesky operand
    (ops/linalg.safe_cholesky); this pins the jitted predict against a
    numpy closed form in exactly that regime."""
    import scipy.linalg as sla
    import jax.numpy as jnp
    from gpim_tpu.gpreg import multi, engine
    from gpim_tpu.kernels.transforms import interval_inverse, positive_inverse

    rng = np.random.RandomState(0)
    size, T = 32, 4
    g = np.mgrid[0:size:1.0, 0:size:1.0]
    X_all = np.stack([g[0], g[1]], -1).reshape(-1, 2)
    obs = rng.rand(size * size) < 0.5
    Xn = X_all[obs]
    Yn = np.stack([np.sin(Xn[:, 0] / (4 + t)) * np.cos(Xn[:, 1] / 5.0)
                   for t in range(T)], -1) * 0.2 + 0.1

    Xp, n = engine.pad_rows(Xn, 128)
    Yp, _ = engine.pad_rows(Yn, 128)
    mask = np.zeros(len(Xp)); mask[:n] = 1.0

    lo, hi = np.full(2, 0.01), np.full(2, 40.0)
    bounds = {"ls_lo": jnp.asarray(lo), "ls_hi": jnp.asarray(hi)}
    # the triggering regime: lengthscale ~ 1/3 of the grid span, small
    # variance/noise (converged BEPFM-band values)
    ls = np.array([[11.7, 12.0], [10.5, 11.2], [12.3, 9.8], [11.0, 10.1]])
    outs = np.array([0.042, 0.05, 0.03, 0.045])
    noise = np.array([0.0028, 0.004, 0.002, 0.003])
    cmean = np.array([0.063, 0.05, 0.07, 0.04])
    u = {
        "lengthscale": interval_inverse(
            jnp.asarray(ls), bounds["ls_lo"], bounds["ls_hi"]),
        "outputscale": positive_inverse(jnp.asarray(outs)),
        "noise": positive_inverse(jnp.asarray(noise)),
        "mean": jnp.asarray(cmean),
    }
    jitter = 1e-5
    chunks, nt = engine.chunk_rows(X_all, 512)
    mean, var = multi.predict_independent(
        u, jnp.asarray(Xp), jnp.asarray(Yp), jnp.asarray(mask), bounds,
        jnp.asarray(jitter), jnp.asarray(chunks), kernel="RBF")
    mean = np.asarray(mean)[:nt]
    var = np.asarray(var)[:nt]

    for t in range(T):
        K = outs[t] * np.exp(
            -0.5 * (((Xn[:, None, :] - Xn[None, :, :]) / ls[t]) ** 2).sum(-1)
        ) + (noise[t] + jitter) * np.eye(n)
        L = np.linalg.cholesky(K)
        alpha = sla.cho_solve((L, True), Yn[:, t] - cmean[t])
        Ks = outs[t] * np.exp(
            -0.5 * (((X_all[:, None, :] - Xn[None, :, :]) / ls[t]) ** 2
                    ).sum(-1))
        m_ref = Ks @ alpha + cmean[t]
        V = sla.solve_triangular(L, Ks.T, lower=True)
        v_ref = outs[t] - (V * V).sum(0) + noise[t]
        assert_allclose(mean[:, t], m_ref, rtol=1e-7, atol=1e-9)
        assert_allclose(var[:, t], v_ref, rtol=1e-6, atol=1e-9)
