"""GP-based Bayesian optimization: acquisition functions and the driver."""

from gpim_tpu.gpbayes import acqfunc, boptim  # noqa: F401
