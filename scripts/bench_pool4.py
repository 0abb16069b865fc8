"""Microbench: packed stem pool (f=4 -> f=2) jnp chain vs pallas.

Shapes are the bench step's stem activations: full frame 1024x320
(stem out H=160, M=128) and the 320x256 attack crop (H=128, M=40),
batch 32, bf16 — the pool runs 20x at the crop (PGD fwd+bwd) and ~3x
at full frame per step, ~35 ms total via the jnp chain
(scripts/trace_summary.py round 4).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_pool4.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from depthmodelhardening_tpu.ops.pallas_pool import (
    wpack4_maxpool3x3s2_hybrid,
    wpack4_maxpool3x3s2_pallas,
)
from depthmodelhardening_tpu.ops.wpack_encoder import wpack4_maxpool3x3s2

B, C = 32, 64


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    for tag, H, M in [("crop 320x256", 128, 40), ("full 1024x320", 160, 128)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, M, 4 * C),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1),
                              (B, H // 2, M, 2 * C), jnp.bfloat16)

        def loss(fn, t):
            return jnp.sum((fn(t, C) * w).astype(jnp.float32))

        for name, fn in [("jnp   ", wpack4_maxpool3x3s2),
                         ("pallas", wpack4_maxpool3x3s2_pallas),
                         ("hybrid", wpack4_maxpool3x3s2_hybrid)]:
            fwd = jax.jit(lambda t, fn=fn: fn(t, C))
            gd = jax.jit(jax.grad(lambda t, fn=fn: loss(fn, t)))
            tf = timeit(fwd, x)
            tg = timeit(gd, x)
            print(f"{tag}  {name}  fwd {tf:7.3f} ms   fwd+bwd {tg:7.3f} ms")


if __name__ == "__main__":
    main()
