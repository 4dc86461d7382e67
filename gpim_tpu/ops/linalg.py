"""
Small shared linear-algebra helpers.

``safe_cholesky`` works around a whole-graph XLA:CPU miscompilation hit by
the multi-output engine (gpim_tpu/gpreg/multi.py): when a *vmapped* masked
Gram construction (pairwise distances -> where-floor -> mask fixup) is fused
directly into the operand of a batched Cholesky and the intermediates are
otherwise dead, XLA:CPU produces numerically wrong factors (observed: 0.23
relative error in the predictive mean, clamped-to-zero variances, jax 0.9.0,
f64). Returning the intermediates - or placing an optimization barrier on
the operand - restores exact agreement with the op-by-op (eager) result.

The barrier is effectively free: Cholesky lowers to a custom call (CPU
LAPACK) or the XLA expander (TPU), and either way its operand must be fully
materialized in a buffer - there is no producer fusion to lose.
"""

import jax
import jax.numpy as jnp

__all__ = ["safe_cholesky", "sym_syrk"]


def safe_cholesky(A):
    """``jnp.linalg.cholesky`` with the operand pinned by an optimization
    barrier. Use for batched/vmapped factorizations whose operand is built
    by a fused elementwise pipeline (see module docstring)."""
    return jnp.linalg.cholesky(jax.lax.optimization_barrier(A))


@jax.custom_vjp
def sym_syrk(M):
    """``M @ M.T`` (bf16x3) with a one-gemm backward.

    Autodiff of ``dot(M, M.T)`` emits TWO (m, n) x (n, m)-sized cotangent
    gemms (``dQ @ M`` and ``dQ.T @ M``); the exact VJP is their sum
    ``(dQ + dQ.T) @ M`` - symmetrize the tiny (m, m) cotangent first and
    pay ONE wide gemm. On the n*m^2-dominated VFE training step this is
    the difference between 3 and 2 structural wide gemms per iteration.
    """
    return jnp.dot(M, M.T, precision=jax.lax.Precision.HIGH)


def _sym_syrk_fwd(M):
    return jnp.dot(M, M.T, precision=jax.lax.Precision.HIGH), M


def _sym_syrk_bwd(M, dQ):
    return (jnp.dot(dQ + dQ.T, M, precision=jax.lax.Precision.HIGH),)


sym_syrk.defvjp(_sym_syrk_fwd, _sym_syrk_bwd)
