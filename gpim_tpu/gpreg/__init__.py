"""GP reconstruction models (exact, sparse VFE, structured, multi-output)."""

from gpim_tpu.gpreg import gpr, skgpr, vgpr  # noqa: F401
