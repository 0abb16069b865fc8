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

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Persistent compilation cache: the suite's wall time is dominated by
# XLA:CPU compiles — both jitted trainer/attack programs and the
# op-by-op executables behind every eager primitive dispatch (~40 ms
# each, thousands per run). min_compile_time=0 persists the eager
# mini-programs too, which is most of the win on this 1-CPU machine.
# A separate directory from the TPU .cache_jax keeps eviction pressure
# off the expensive tunnel-compiled TPU executables.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".cache_jax_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, _REPO)
