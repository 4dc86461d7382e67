"""
Device-mesh helpers for multi-chip scaling.

The reference is single-process/single-GPU (SURVEY.md section 2: `.cuda()`
transfers only, gpr.py:104-113). The TPU-native design scales through
`jax.sharding`:

- prediction grids shard over a 'grid' mesh axis (pure data parallel - each
  chip solves its own test-point tiles against the replicated factorization);
- multi-output channels (the EELS "parallel GP") shard over a 'task' axis;
- Gram/Cholesky work for a single model stays chip-local (XLA's distributed
  cholesky would ride DCN and lose), so model parallelism enters through the
  batched/multi-output paths where it is embarrassingly efficient.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["get_mesh", "shard_batch", "local_device_count"]


def local_device_count():
    return jax.local_device_count()


def get_mesh(n_devices=None, axis_name="grid"):
    """A 1D device mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_batch(arr, mesh, axis_name="grid"):
    """Place ``arr`` with its leading axis sharded over ``axis_name``."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(arr, sharding)
