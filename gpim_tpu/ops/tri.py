"""
Batched-bisection triangular inverse: the MLL backward's hottest op.

The closed-form exact-MLL gradient (gpreg/engine.py) needs
``Ainv = L^-T L^-1`` from the Cholesky factor every training step - the
reference pays the same cost inside torch autograd's cholesky backward
(its Pyro engine, reference gpr.py:190-208). XLA lowers a triangular solve
against the identity as a *sequential* chain of n/128 block-row solves, so
at the sizes GP training uses the op is chain-latency-bound, not
flop-bound: measured 5.9 ms at n=4224 on TPU v5e (~7 TFLOP/s effective)
while the same chip's gemms run at 50-125 TFLOP/s.

The fix is algebraic. Split L into 2^depth diagonal blocks:

    L = [[L11,   0],        L^-1 = [[V11,        0 ],
         [L21, L22]]                [-V22 L21 V11, V22]]

- every *diagonal* block inverse is independent -> ONE batched trsm over
  the stacked blocks (chain length b/128 instead of n/128);
- every *off-diagonal* block of the inverse is two big gemms, batched per
  bisection level (MXU-fast, bf16x3).

Measured at n=4224 (TPU v5e): 2.4 ms vs 5.9 ms for XLA's trsm-vs-identity,
max error 3e-7 (same as XLA); the full ``inv_from_cholesky`` pipeline drops
8.3 ms -> 4.7 ms. The win grows with n (n=8448: XLA 38 ms).

An earlier non-batched recursive version (git history: ops/blocked_chol.py)
lost to XLA because its per-level ``concatenate`` assembly added O(n^2) HBM
copies per level; this version batches the diagonal solves (the actual
latency bottleneck) and assembles once into a preallocated buffer.
"""

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

__all__ = ["tri_inverse", "inv_from_cholesky"]

# Bisect until diagonal blocks are ~this size: big enough that the batched
# trsm's per-step gemms fill the MXU, small enough to cut the chain.
_TARGET_BLOCK = 512
# Below this, XLA's direct solve latency is already minimal.
_MIN_BISECT = 2048


def _choose_depth(n):
    depth = 0
    while n % (2 ** (depth + 1)) == 0 and n // (2 ** (depth + 1)) >= _TARGET_BLOCK:
        depth += 1
    return depth


def tri_inverse(L):
    """Inverse of a lower-triangular matrix.

    Equivalent to ``solve_triangular(L, I, lower=True)`` but restructured so
    the sequential-solve chain is short and all O(n^3) work lands in large
    batched gemms (see module docstring). Differentiable (composed of
    differentiable primitives); works under vmap (all block indexing is
    static slicing on the last two axes).
    """
    n = L.shape[-1]
    eye = jnp.eye(n, dtype=L.dtype)
    if n < _MIN_BISECT:
        return solve_triangular(L, eye, lower=True)
    depth = _choose_depth(n)
    if depth == 0:
        return solve_triangular(L, eye, lower=True)

    nb = 2 ** depth
    b = n // nb
    # one batched solve for every diagonal block (chain length b/128)
    diag = jnp.stack([L[..., i * b:(i + 1) * b, i * b:(i + 1) * b]
                      for i in range(nb)], axis=-3)
    beye = jnp.broadcast_to(jnp.eye(b, dtype=L.dtype), diag.shape)
    Vd = solve_triangular(diag, beye, lower=True)

    V = jnp.zeros_like(L)
    for i in range(nb):
        V = V.at[..., i * b:(i + 1) * b, i * b:(i + 1) * b].set(
            Vd[..., i, :, :])

    # combine upward: the off-diagonal block of each pair is
    # V21 = -V22 L21 V11, batched over all pairs at this level
    w = b
    while w < n:
        npairs = n // (2 * w)
        L21 = jnp.stack(
            [L[..., (2 * k + 1) * w:(2 * k + 2) * w, 2 * k * w:(2 * k + 1) * w]
             for k in range(npairs)], axis=-3)
        V11 = jnp.stack(
            [V[..., 2 * k * w:(2 * k + 1) * w, 2 * k * w:(2 * k + 1) * w]
             for k in range(npairs)], axis=-3)
        V22 = jnp.stack(
            [V[..., (2 * k + 1) * w:(2 * k + 2) * w,
               (2 * k + 1) * w:(2 * k + 2) * w]
             for k in range(npairs)], axis=-3)
        # bf16x3: these are O(1)-scaled triangular-factor products feeding
        # gradient reductions, not cancellation-prone distance expansions
        T = jnp.matmul(L21, V11, precision=jax.lax.Precision.HIGH)
        V21 = -jnp.matmul(V22, T, precision=jax.lax.Precision.HIGH)
        for k in range(npairs):
            V = V.at[..., (2 * k + 1) * w:(2 * k + 2) * w,
                     2 * k * w:(2 * k + 1) * w].set(V21[..., k, :, :])
        w *= 2
    return V


def inv_from_cholesky(L):
    """``A^-1 = L^-T L^-1`` from the lower Cholesky factor (potri analog)."""
    V = tri_inverse(L)
    VT = jnp.swapaxes(V, -1, -2)
    return jnp.matmul(VT, V, precision=jax.lax.Precision.HIGH)
