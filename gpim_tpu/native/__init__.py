"""
Native (C++) host-side helpers with pure-numpy fallbacks.

The reference has no native components of its own (it rides torch's CUDA
kernels); here the device-side compute is XLA/Pallas, and the only host-side
hot loops - the greedy distance-suppression query-point selection of the
Bayesian optimizer (reference boptim.py:357-365 uses scipy's cKDTree in a
Python while-loop) - have a compiled C++ implementation, loaded via ctypes
when built (see gpim_tpu/native/build.sh) and transparently falling back to
numpy otherwise.
"""

from gpim_tpu.native.spatial import spaced_batch, suppress_within  # noqa: F401
