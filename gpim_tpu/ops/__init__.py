"""Low-level TPU compute ops: Gram-matrix builders and structured linalg."""

from gpim_tpu.ops.gram import pairwise_dist, pairwise_sq_dist  # noqa: F401
