"""
Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax at interpreter startup to register
the axon TPU plugin, so JAX_PLATFORMS in os.environ is read before this file
runs; the platform must be forced through jax.config instead. XLA_FLAGS is
still unread at this point (backends initialize lazily), so the virtual
8-CPU-device flag works from here - it gives the multi-chip sharding tests a
mesh without TPU hardware (the same mechanism the driver's dryrun uses).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
