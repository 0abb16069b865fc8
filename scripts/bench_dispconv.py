"""A/B the disparity-head formulations at bench shapes (VERDICT r4 #1a:
disp0 executes 8.05 GFLOP per full pass for 0.09 useful on the
phase-blocked MXU path — the roofline's worst layer).

  a. wpack_conv3x3_reflect  — phase-blocked 3x2 conv, Cout=1 pads
     f=8 -> 128 output lanes (16x waste on top of the 2f/3 factor)
  b. wpack_dispconv         — tap-split: one 1x1 matmul producing all
     nine per-tap channel contractions (72 lanes) + 9 shifted adds

Run: PYTHONPATH=/root/repo python scripts/bench_dispconv.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from depthmodelhardening_tpu.ops.wpack_decoder import (
    wpack, wpack_conv3x3_reflect, wpack_dispconv,
)

B = 32


def _sync(r):
    # block_until_ready does not reliably sync through the axon
    # tunnel; a scalar host transfer does (see bench.py)
    return float(jnp.sum(jax.tree_util.tree_leaves(r)[0]
                         .astype(jnp.float32)))


def timeit(f, *args, n=20):
    _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n * 1000


def main():
    rng = np.random.RandomState(0)
    for nm, (H, W, C, f) in (
            ("disp0 full 320x1024", (320, 1024, 16, 8)),
            ("disp0 crop 256x320", (256, 320, 16, 8)),
            ("disp1 full", (160, 512, 32, 4)),
            ("disp2 full (f=2 transient)", (80, 256, 64, 2))):
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32),
                        jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, C, 1).astype(np.float32),
                        jnp.bfloat16)
        b = jnp.asarray(rng.randn(1).astype(np.float32), jnp.bfloat16)
        xp = wpack(x, f)

        conv = jax.jit(lambda xp, k, b, _f=f:
                       wpack_conv3x3_reflect(xp, k, b, f=_f))
        taps = jax.jit(lambda xp, k, b, _f=f:
                       wpack_dispconv(xp, k, b, f=_f))
        err = float(jax.jit(lambda xp, k, b, _f=f: jnp.max(jnp.abs(
            wpack_conv3x3_reflect(xp, k, b, f=_f).astype(jnp.float32)
            - wpack_dispconv(xp, k, b, f=_f).astype(jnp.float32))))(
                xp, k, b))

        def g(fn):
            def loss(xp, k, b):
                return jnp.sum(jnp.asarray(fn(xp, k, b), jnp.float32))
            return jax.jit(jax.grad(loss, argnums=(0, 1)))

        def ig(fn):
            def loss(xp, k, b):
                return jnp.sum(jnp.asarray(fn(xp, k, b), jnp.float32))
            return jax.jit(jax.grad(loss, argnums=0))

        gc, gt = g(lambda *a, _f=f: wpack_conv3x3_reflect(*a, f=_f)), \
            g(lambda *a, _f=f: wpack_dispconv(*a, f=_f))
        ic, it = ig(lambda *a, _f=f: wpack_conv3x3_reflect(*a, f=_f)), \
            ig(lambda *a, _f=f: wpack_dispconv(*a, f=_f))
        print(f"{nm}: fwd conv {timeit(conv, xp, k, b):6.3f} ms  "
              f"taps {timeit(taps, xp, k, b):6.3f} ms | "
              f"grad conv {timeit(gc, xp, k, b):6.3f} ms  "
              f"taps {timeit(gt, xp, k, b):6.3f} ms | "
              f"igrad conv {timeit(ic, xp, k, b):6.3f} ms  "
              f"taps {timeit(it, xp, k, b):6.3f} ms | maxerr {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
