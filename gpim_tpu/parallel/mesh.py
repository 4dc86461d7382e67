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

import warnings

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpim_tpu.parallel.distributed import put_with

__all__ = ["get_mesh", "resolve_mesh", "shard_batch", "replicate",
           "shard_chunk_rows", "local_device_count"]


def local_device_count():
    return jax.local_device_count()


def get_mesh(n_devices=None, axis_name="grid"):
    """A 1D device mesh over the first ``n_devices`` devices.

    ``jax.devices()`` is the GLOBAL device list, so after
    ``parallel.distributed.initialize`` this mesh spans every process of a
    multi-host job; all placement below routes through
    ``distributed.put_with``, which handles non-addressable devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def resolve_mesh(mesh_arg, axis_name="grid"):
    """Normalize the public ``mesh=`` kwarg of the reconstructors.

    True -> all devices on a 1D ``axis_name`` mesh; an int -> the first n
    devices; an existing Mesh (which must carry ``axis_name``) -> as-is.
    """
    if isinstance(mesh_arg, Mesh):
        if axis_name not in mesh_arg.shape:
            raise ValueError(
                "mesh must have a %r axis; got axes %r"
                % (axis_name, tuple(mesh_arg.shape)))
        return mesh_arg
    n = None if mesh_arg is True else int(mesh_arg)
    return get_mesh(n, axis_name)


def shard_batch(arr, mesh, axis_name="grid"):
    """Place ``arr`` with its leading axis sharded over ``axis_name``."""
    return put_with(arr, NamedSharding(mesh, P(axis_name)))


def replicate(tree, mesh):
    """Replicate every array of a pytree on the mesh. Needed to co-locate
    replicated operands (factorizations, hyperparameters) with sharded ones
    in a single jitted program - a committed single-device array mixed with
    mesh-sharded arguments is a placement error."""
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: put_with(a, repl), tree)


def shard_chunk_rows(chunks, mesh, axis_name="grid"):
    """Shard the row axis of (n_chunks, chunk, ...) prediction tiles over the
    mesh - the embarrassingly-parallel layout for GP prediction. Returns the
    array replicated instead (with a one-time warning: the user asked for a
    mesh and would otherwise get no signal the sharding was dropped) when
    the chunk size does not divide the mesh axis (e.g. 3- or 6-device
    meshes)."""
    n_dev = mesh.shape[axis_name]
    if chunks.shape[1] % n_dev:
        _warn_replicated_once(
            "prediction tiles of %d rows do not divide the %d-device %r "
            "mesh axis - prediction runs REPLICATED (every device computes "
            "all rows). Use a device count that divides the chunk size "
            "(e.g. a power of two) to shard it."
            % (chunks.shape[1], n_dev, axis_name))
        return put_with(chunks, NamedSharding(mesh, P()))
    spec = [None] * chunks.ndim
    spec[1] = axis_name
    return put_with(chunks, NamedSharding(mesh, P(*spec)))


_warned_replicated = set()


def _warn_replicated_once(msg):
    if msg not in _warned_replicated:
        _warned_replicated.add(msg)
        warnings.warn(msg, UserWarning, stacklevel=3)
