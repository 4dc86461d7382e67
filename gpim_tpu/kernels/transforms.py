"""
Constraint bijectors for GP hyperparameters.

The reference constrains hyperparameters two ways:
- Pyro path: Uniform priors on variance/lengthscale, optimized by MAP in the
  unconstrained space of a sigmoid interval transform
  (pyro_kernels.py:77-94);
- GPyTorch path: explicit Interval lengthscale constraints
  (gpytorch_kernels.py:55-57) and softplus-positive noise/outputscale.

Both reduce to the two bijectors below. Training always happens in
unconstrained space; the interval transform's log-Jacobian is added to the
MAP objective exactly as Pyro's Trace_ELBO does for transformed sample sites,
which keeps parameters off the interval boundaries.
"""

import jax
import jax.numpy as jnp

__all__ = [
    "interval_forward", "interval_inverse", "interval_log_jacobian",
    "positive_forward", "positive_inverse",
]


def interval_forward(u, lo, hi):
    """Unconstrained -> (lo, hi) via scaled sigmoid."""
    return lo + (hi - lo) * jax.nn.sigmoid(u)


def interval_inverse(x, lo, hi, eps=1e-12):
    """(lo, hi) -> unconstrained (logit), clipping to the open interval."""
    t = (x - lo) / (hi - lo)
    t = jnp.clip(t, eps, 1.0 - 1e-7)
    return jnp.log(t) - jnp.log1p(-t)


def interval_log_jacobian(u, lo, hi):
    """log |d interval_forward / du| summed over elements."""
    # log sigmoid(u) + log sigmoid(-u) is the stable log s(u)(1-s(u)).
    return jnp.sum(
        jnp.log(hi - lo) + jax.nn.log_sigmoid(u) + jax.nn.log_sigmoid(-u))


def positive_forward(u):
    """Unconstrained -> (0, inf) via softplus."""
    return jax.nn.softplus(u)


def positive_inverse(x):
    """Stable inverse softplus: log(exp(x) - 1)."""
    x = jnp.asarray(x)
    return x + jnp.log(-jnp.expm1(-x))
