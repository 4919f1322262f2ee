"""Test configuration: force an 8-device virtual CPU mesh.

All unit/integration tests run on CPU with 8 virtual devices so the
multi-chip sharding paths (parallel/) are exercised without TPU hardware.
Note: the 'axon' TPU plugin in this image ignores the JAX_PLATFORMS env
var, so we must force the platform through jax.config before any backend
initialization.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
