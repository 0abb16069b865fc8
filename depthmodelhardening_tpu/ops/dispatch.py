"""Central Pallas-dispatch switch.

jax.default_backend() is frozen at the first backend resolution, so a
computation explicitly placed on a virtual CPU mesh (multi-chip dryruns,
tests) would still take the TPU Pallas path if a TPU was ever visible in
the process. Entry points that run on a non-default platform call
set_pallas_enabled(False) to force the jnp fallbacks.
"""

from __future__ import annotations

import contextlib

import jax

_pallas_enabled = True


def set_pallas_enabled(on: bool) -> None:
    global _pallas_enabled
    _pallas_enabled = bool(on)


def pallas_enabled() -> bool:
    """Current state of the switch (for save/restore around code that
    temporarily runs on a non-default platform)."""
    return _pallas_enabled


def pallas_available() -> bool:
    """True when pallas TPU kernels may be emitted into the current
    computation: the switch is on and the default backend is TPU."""
    return _pallas_enabled and jax.default_backend() == "tpu"


@contextlib.contextmanager
def pallas_disabled():
    """Scope the jnp-fallback switch to a block.

    For computations explicitly placed on a virtual CPU mesh inside a
    process whose frozen default backend is TPU (multi-chip dryruns,
    ad-hoc tests): TPU pallas kernels must not be emitted into the CPU
    program, but the switch must be restored afterwards so later
    same-process TPU work is not silently degraded to the fallbacks.
    """
    prev = pallas_enabled()
    set_pallas_enabled(False)
    try:
        yield
    finally:
        set_pallas_enabled(prev)
