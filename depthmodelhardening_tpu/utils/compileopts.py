"""Env-gated XLA compiler options for the jitted train steps.

Set DMH_COMPILER_OPTIONS="xla_tpu_enable_latency_hiding_scheduler=true,
xla_foo=bar" to pass per-jit compiler options (jax.jit compiler_options)
to the trainers' fused steps — an A/B knob for scheduler experiments
without code edits. Unset (the default) returns None, which keeps the
jit cache keys and compiled artifacts byte-identical to a build without
this hook.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

_ENV = "DMH_COMPILER_OPTIONS"


def compiler_options() -> Optional[Dict[str, str]]:
    raw = os.environ.get(_ENV, "").strip()
    if not raw:
        return None
    opts: Dict[str, str] = {}
    for item in raw.split(","):
        item = item.strip()
        if not item:
            continue
        if "=" not in item:
            raise ValueError(
                f"{_ENV} entries must be key=value, got {item!r}")
        k, v = item.split("=", 1)
        opts[k.strip()] = v.strip()
    return opts or None
