"""
Pallas TPU kernel: fused tiled pairwise squared distances.

This is the native-kernel equivalent of the reference's torch broadcasting
distance computations (inside Pyro/GPyTorch kernels). Compared to the XLA
norm-trick path (ops/gram.py):

- ONE pass over the n x m output: the per-dimension (a - b)^2 accumulation
  happens in VMEM registers, no |a|^2/|b|^2 temporaries, no cross-term
  matmul, no extra HBM round-trips;
- exact numerics by construction: coincident points give exactly 0 (the
  norm-trick path needs full-f32 matmuls plus a round-off snap to achieve
  this, see ops/gram.py);
- inputs are laid out (d, n) so tiles are (d_pad<=8, 128k) - sublane x lane
  friendly; the feature loop is unrolled at trace time (d <= 8).

The kernel carries a custom VJP (closed form:
dA = 2 (A * rowsum(G) - G @ B), symmetric for B), so lengthscale gradients
flow through the scaled inputs; the backward matmuls map onto the MXU.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pairwise_sq_dist_pallas", "pallas_supported"]

# 128 matches the engine's padding bucket (engine.pad_rows) and prediction
# chunk rounding, so bucketed training shapes qualify for the fused path.
_TILE_M = 128
_TILE_N = 128
_MAX_D = 8


def pallas_supported(n, m, d, dtype):
    """Shapes the fused kernel handles: f32, small feature dim, tile-aligned
    point counts (callers pad to 128 already). Set GPIM_TPU_NO_PALLAS=1 to
    force the pure-XLA path (fallback knob / A-B benchmarking)."""
    import os
    if os.environ.get("GPIM_TPU_NO_PALLAS"):
        return False
    return (dtype == jnp.float32
            and d <= _MAX_D
            and n % _TILE_M == 0
            and m % _TILE_N == 0)


def _sqdist_kernel(d, a_ref, b_ref, out_ref):
    # a_ref: (d_pad, TILE_M), b_ref: (d_pad, TILE_N); feature loop unrolled
    acc = jnp.zeros((_TILE_M, _TILE_N), jnp.float32)
    for k in range(d):
        diff = a_ref[k, :][:, None] - b_ref[k, :][None, :]
        acc = acc + diff * diff
    out_ref[:] = acc


def _sqdist_raw(At, Bt, d):
    """At: (d_pad, n), Bt: (d_pad, m) -> (n, m) squared distances.

    Traced with x64 disabled: under the package's global jax_enable_x64 the
    grid index maps otherwise trace to i64, which Mosaic fails to legalize
    ("failed to legalize operation 'func.return'") on the TPU AOT compiler.
    All operands are explicitly float32, so the context changes no dtypes.
    """
    n, m = At.shape[1], Bt.shape[1]
    grid = (n // _TILE_M, m // _TILE_N)
    with jax.enable_x64(False):
        return _pallas_call(At, Bt, d, n, m, grid)


def _pallas_call(At, Bt, d, n, m, grid):
    return pl.pallas_call(
        partial(_sqdist_kernel, d),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((At.shape[0], _TILE_M), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt.shape[0], _TILE_N), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_M, _TILE_N), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )(At, Bt)


@jax.custom_vjp
def pairwise_sq_dist_pallas(A, B):
    """Fused pairwise squared Euclidean distances, (n, d) x (m, d) -> (n, m).

    Requires pallas_supported(...); callers dispatch (ops/gram.py).
    """
    d = A.shape[1]
    d_pad = _MAX_D
    At = jnp.zeros((d_pad, A.shape[0]), jnp.float32).at[:d].set(A.T)
    Bt = jnp.zeros((d_pad, B.shape[0]), jnp.float32).at[:d].set(B.T)
    return _sqdist_raw(At, Bt, d)


def _fwd(A, B):
    return pairwise_sq_dist_pallas(A, B), (A, B)


def _bwd(res, g):
    A, B = res
    # d(d2_ij)/dA_ik = 2 (A_ik - B_jk)
    gsum_rows = jnp.sum(g, axis=1, keepdims=True)     # (n, 1)
    gsum_cols = jnp.sum(g, axis=0, keepdims=True)     # (1, m)
    gB = jnp.dot(g, B, precision=jax.lax.Precision.HIGHEST)
    gA_T = jnp.dot(g.T, A, precision=jax.lax.Precision.HIGHEST)
    dA = 2.0 * (A * gsum_rows - gB)
    dB = 2.0 * (B * gsum_cols.T - gA_T)
    return dA, dB


pairwise_sq_dist_pallas.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------
# Fused masked GP system: one HBM pass producing BOTH the unmasked kernel
# matrix K and the masked training system
#     A = (m m^T) . (K + (noise + jitter) I) + (I - diag(m)) I
# from scaled inputs. Used by the closed-form-gradient MLL forward
# (gpim_tpu/gpreg/engine._nll_fast_fwd) which is never itself
# differentiated, so no VJP plumbing is needed here.
# --------------------------------------------------------------------------

def _system_kernel(d, kernel, a_ref, b_ref, ma_ref, mb_ref, sc_ref,
                   k_ref, A_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    acc = jnp.zeros((_TILE_M, _TILE_N), jnp.float32)
    for k in range(d):
        diff = a_ref[k, :][:, None] - b_ref[k, :][None, :]
        acc = acc + diff * diff
    v = sc_ref[0, 0]
    s = sc_ref[0, 1]          # noise + jitter
    if kernel == "RBF":
        K = v * jnp.exp(-0.5 * acc)
    elif kernel == "Matern52":
        r = jnp.sqrt(acc + 1e-12)
        sq5 = 5.0 ** 0.5
        K = v * (1.0 + sq5 * r + (5.0 / 3.0) * r * r) * jnp.exp(-sq5 * r)
    else:  # RationalQuadratic
        alpha = sc_ref[0, 2]
        K = v * jnp.exp(-alpha * jnp.log1p(acc / (2.0 * alpha)))
    # exact diagonal: coincident scaled points have acc == 0 by construction
    # (same tile row/col of the same input), detected via global ids
    row = i * _TILE_M + jax.lax.broadcasted_iota(jnp.int32,
                                                 (_TILE_M, _TILE_N), 0)
    col = j * _TILE_N + jax.lax.broadcasted_iota(jnp.int32,
                                                 (_TILE_M, _TILE_N), 1)
    eye = (row == col).astype(jnp.float32)
    # snap round-off distances on the diagonal: K(x,x) must be exactly v
    K = jnp.where(eye > 0, v, K)
    ma = ma_ref[0, :][:, None]
    mb = mb_ref[0, :][None, :]
    k_ref[:] = K
    A_ref[:] = ma * mb * (K + s * eye) + (1.0 - ma) * eye


def fused_masked_system_pallas(Xs, mask, variance, noise_plus_jitter,
                               alpha=None, *, kernel):
    """(Kt, A) from scaled inputs Xs (n, d) in one fused pass.

    Requires pallas_supported(n, n, d, f32). ``alpha`` only for
    RationalQuadratic. Not differentiable - callers own the gradients.
    """
    n, d = Xs.shape
    Xs = Xs.astype(jnp.float32)
    At = jnp.zeros((_MAX_D, n), jnp.float32).at[:d].set(Xs.T)
    m2 = mask.astype(jnp.float32).reshape(1, n)
    sc = jnp.stack([
        jnp.asarray(variance, jnp.float32),
        jnp.asarray(noise_plus_jitter, jnp.float32),
        jnp.asarray(0.0 if alpha is None else alpha, jnp.float32),
    ]).reshape(1, 3)
    grid = (n // _TILE_M, n // _TILE_N)
    with jax.enable_x64(False):
        return pl.pallas_call(
            partial(_system_kernel, d, kernel),
            out_shape=(jax.ShapeDtypeStruct((n, n), jnp.float32),
                       jax.ShapeDtypeStruct((n, n), jnp.float32)),
            grid=grid,
            in_specs=[
                pl.BlockSpec((_MAX_D, _TILE_M), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_MAX_D, _TILE_N), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _TILE_M), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _TILE_N), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((_TILE_M, _TILE_N), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_TILE_M, _TILE_N), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
            ),
            interpret=jax.default_backend() == "cpu",
        )(At, At, m2, m2, sc)


# --------------------------------------------------------------------------
# Fused backward reductions for the closed-form RBF MLL gradient.
#
# The backward pass needs, with base = (Ainv - a a^T) . (m m^T) and
# W = base . K:
#     S1      = sum(W)                  (-> dvariance)
#     rw_i    = sum_j W_ij              (-> dlengthscale, x^2 term)
#     WX      = W @ X                   (-> dlengthscale, cross term)
#     diagsum = sum_i Ainv_ii m_i^2     (-> dnoise)
# XLA materializes W (n^2) and re-reads the operands once per consumer;
# this kernel computes all four in ONE pass over the Ainv/K tiles, with the
# W @ X per-tile contraction on the MXU. Only used inside the custom-VJP
# backward (never differentiated).
# --------------------------------------------------------------------------

def _bwd_red_kernel(a_ref, k_ref, ai_ref, aj_ref, mi_ref, mj_ref, x_ref,
                    rw_ref, wx_ref, s1_ref, dg_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    Ainv = a_ref[...]
    K = k_ref[...]
    ai = ai_ref[0, :][:, None]
    aj = aj_ref[0, :][None, :]
    mi = mi_ref[0, :][:, None]
    mj = mj_ref[0, :][None, :]
    W = (Ainv - ai * aj) * (mi * mj) * K

    rw_part = jnp.sum(W, axis=1, keepdims=True)          # (TM, 1)
    wx_part = jax.lax.dot_general(
        W, x_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TM, d_pad)
    s1_part = jnp.sum(W)

    @pl.when(j == 0)
    def _init_rows():
        rw_ref[...] = jnp.zeros_like(rw_ref)
        wx_ref[...] = jnp.zeros_like(wx_ref)

    # every lane accumulates the same row sum; the host reads lane 0
    rw_ref[...] += jnp.broadcast_to(rw_part, rw_ref.shape)
    wx_ref[...] += wx_part

    @pl.when((i == 0) & (j == 0))
    def _init_scalars():
        s1_ref[0, 0] = 0.0
        dg_ref[0, 0] = 0.0

    s1_ref[0, 0] += s1_part

    @pl.when(i == j)
    def _diag():
        row = jax.lax.broadcasted_iota(jnp.int32, Ainv.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, Ainv.shape, 1)
        eye = (row == col).astype(jnp.float32)
        dg_ref[0, 0] += jnp.sum(Ainv * eye * (mi * mi))


def rbf_bwd_reductions_pallas(Ainv, Kt, alpha, mask, X):
    """One-pass (S1, rw, WX, diagsum) for the RBF closed-form backward.

    Requires pallas_supported(n, n, d, f32). Returns
    (s1 scalar, rw (n,), WX (n, d), diagsum scalar).
    """
    n, d = X.shape
    Xp = jnp.zeros((n, _MAX_D), jnp.float32).at[:, :d].set(
        X.astype(jnp.float32))
    a2 = alpha.astype(jnp.float32).reshape(1, n)
    m2 = mask.astype(jnp.float32).reshape(1, n)
    grid = (n // _TILE_M, n // _TILE_N)
    with jax.enable_x64(False):
        rw, wx, s1, dg = pl.pallas_call(
            _bwd_red_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((n, 128), jnp.float32),
                jax.ShapeDtypeStruct((n, _MAX_D), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((_TILE_M, _TILE_N), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_TILE_M, _TILE_N), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _TILE_M), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _TILE_N), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _TILE_M), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _TILE_N), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_TILE_N, _MAX_D), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((_TILE_M, 128), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_TILE_M, _MAX_D), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
            ),
            interpret=jax.default_backend() == "cpu",
        )(Ainv.astype(jnp.float32), Kt.astype(jnp.float32),
          a2, a2, m2, m2, Xp)
    return s1[0, 0], rw[:, 0], wx[:, :d], dg[0, 0]
