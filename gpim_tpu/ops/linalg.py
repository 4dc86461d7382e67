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

__all__ = ["safe_cholesky"]


def safe_cholesky(A):
    """``jnp.linalg.cholesky`` with the operand pinned by an optimization
    barrier. Use for batched/vmapped factorizations whose operand is built
    by a fused elementwise pipeline (see module docstring)."""
    return jnp.linalg.cholesky(jax.lax.optimization_barrier(A))
