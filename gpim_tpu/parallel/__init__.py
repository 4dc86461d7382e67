"""Multi-chip scaling: device meshes, sharded prediction/training helpers."""

from gpim_tpu.parallel.mesh import (  # noqa: F401
    get_mesh, shard_batch, local_device_count)
