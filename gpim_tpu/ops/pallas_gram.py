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
