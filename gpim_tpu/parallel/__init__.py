"""Multi-chip scaling: device meshes, sharded prediction/training helpers,
multi-process (multi-host) runtime (see gpim_tpu.parallel.distributed)."""

from gpim_tpu.parallel.mesh import (  # noqa: F401
    get_mesh, shard_batch, local_device_count)
from gpim_tpu.parallel import distributed  # noqa: F401
