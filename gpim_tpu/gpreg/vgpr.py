"""
Multi-output ("vector-valued" / parallel per-channel) GP reconstruction.

Placeholder module - full implementation lands in a following milestone:
independent mode as a vmapped batch of exact GPs (sharded over a TPU mesh),
correlated mode as a Kronecker multitask covariance
(reference gpim/gpreg/vgpr.py:19-354).
"""

__all__ = ["vreconstructor"]


class vreconstructor:
    """Not yet implemented; see module docstring."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "vreconstructor is under construction in this build")
