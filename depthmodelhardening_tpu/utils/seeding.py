"""Determinism helpers.

The reference seeds torch/cuda/numpy/random and sets
cudnn.deterministic (simple_adv_training.py:31-36,
evaluate_depth.py:48-55). The JAX equivalent: host RNGs seeded here;
device randomness is explicit via the returned PRNGKey, which callers
thread through every attack/trainer call (XLA is deterministic for a
fixed key and program).
"""

from __future__ import annotations

import random

import jax
import numpy as np


def setup_seed(seed: int = 17) -> jax.Array:
    """Seed numpy + python RNGs; return the root jax PRNGKey."""
    np.random.seed(seed)
    random.seed(seed)
    return jax.random.PRNGKey(seed)
