"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a host-platform device mesh
(xla_force_host_platform_device_count) since real multi-chip TPU hardware
is not available in CI.

Note: this environment pre-imports jax via sitecustomize with
JAX_PLATFORMS=axon, so plain env vars are ignored; jax.config.update is
the only reliable switch. XLA_FLAGS still applies because the CPU backend
initializes lazily on first device access.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
