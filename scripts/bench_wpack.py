"""Width-packed conv vs naive at decoder stage shapes (b32 bf16).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_wpack.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")

from depthmodelhardening_tpu.ops.padding import conv3x3_reflect_same
from depthmodelhardening_tpu.ops.wpack_decoder import (
    wpack, wpack_conv3x3_reflect, wunpack,
)

B = 32
DT = jnp.bfloat16


def _sync(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                         .astype(jnp.float32)))


def timeit(fn, *args, n=20):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000


def run(H, W, Cin, Cout, f, label):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, Cin), DT)
    xw = jax.random.normal(key, (B, H, W // f, f * Cin), DT)
    k = jax.random.normal(key, (3, 3, Cin, Cout), DT)

    naive = jax.jit(lambda x, k: conv3x3_reflect_same(x, k))
    t0 = timeit(naive, x, k)

    # steady-state: input/output stay width-packed
    wp = jax.jit(lambda xw, k: wpack_conv3x3_reflect(xw, k, f=f))
    t1 = timeit(wp, xw, k)

    # including the (reshape-only) pack/unpack boundary
    wpb = jax.jit(lambda x, k: wunpack(
        wpack_conv3x3_reflect(wpack(x, f), k, f=f), f))
    t2 = timeit(wpb, x, k)

    def loss_naive(x, k):
        return jnp.sum(conv3x3_reflect_same(x, k).astype(jnp.float32))

    def loss_wp(xw, k):
        return jnp.sum(wpack_conv3x3_reflect(xw, k, f=f)
                       .astype(jnp.float32))

    g0 = timeit(jax.jit(jax.grad(loss_naive, (0, 1))), x, k)
    g1 = timeit(jax.jit(jax.grad(loss_wp, (0, 1))), xw, k)
    print(f"{label} f={f}: naive fwd {t0:6.2f} wp {t1:6.2f} "
          f"(w/ reshape {t2:6.2f})   naive f+b {g0:6.2f} wp f+b "
          f"{g1:6.2f} ms", flush=True)


def main():
    run(320, 1024, 16, 16, 8, "16->16 @320x1024")
    run(160, 512, 32, 16, 4, "32->16 @160x512 ")
    run(160, 512, 96, 32, 4, "96->32 @160x512 ")
    run(320, 1024, 16, 1, 8, "16->1  @320x1024")
    run(256, 384, 16, 16, 8, "16->16 @256x384 (crop)")


if __name__ == "__main__":
    main()
