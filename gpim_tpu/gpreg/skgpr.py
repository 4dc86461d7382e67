"""
Structured-kernel / spectral-mixture GP reconstruction (skreconstructor).

Placeholder module - full implementation lands in a following milestone:
dense exact-MLL path with ScaleKernel+ConstantMean semantics, SKI
(grid-interpolation) structured path via Kronecker/Toeplitz MVMs + CG/SLQ,
and the spectral mixture kernel (reference gpim/gpreg/skgpr.py:21-448).
"""

__all__ = ["skreconstructor"]


class skreconstructor:
    """Not yet implemented; see module docstring."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "skreconstructor is under construction in this build")
