"""
Test configuration: run everything on a virtual 8-device CPU mesh.

Must execute before jax is imported anywhere: JAX_PLATFORMS=cpu keeps CI
deterministic and fast, and xla_force_host_platform_device_count=8 gives the
multi-chip sharding tests a mesh to run on without TPU hardware (the same
mechanism the driver's dryrun uses).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
