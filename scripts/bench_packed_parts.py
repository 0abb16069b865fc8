"""Attribute the packed-conv cost: dispatch floor, raw 2x2 conv, pad,
shifted slices, pack/tile relayouts — each as an isolated jitted
program at the upconv0_1 full-frame shape (b32 bf16, 160x512 packed
repr of 320x1024x16).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_packed_parts.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")

from depthmodelhardening_tpu.ops.packed_decoder import (
    pack2, pack_conv3x3_kernel, packed_conv3x3_reflect,
    reflect_pad_packed, tile4, unpack2,
)

B = 32
DT = jnp.bfloat16
N, M, C = 160, 512, 16  # packed spatial, orig channels


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def timeit(f, *args, n=20):
    _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, M, 4 * C), DT)        # packed
    xp = jax.random.normal(key, (B, N + 2, M + 2, 4 * C), DT)
    xo = jax.random.normal(key, (B, 2 * N, 2 * M, C), DT)   # original
    k = jax.random.normal(key, (3, 3, C, C), DT)
    kp = jax.random.normal(key, (2, 2, 4 * C, 4 * C), DT)

    t = timeit(jax.jit(lambda a: a + 1.0), x)
    print(f"dispatch floor (x+1 on packed): {t:7.2f} ms", flush=True)

    conv = jax.jit(lambda xp, kp: jax.lax.conv_general_dilated(
        xp, kp, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    print(f"raw 2x2 VALID conv 64->64:      "
          f"{timeit(conv, xp, kp):7.2f} ms", flush=True)

    conv_same = jax.jit(lambda x, kp: jax.lax.conv_general_dilated(
        x, kp, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    print(f"2x2 conv w/ ((1,0),(1,0)) pad:  "
          f"{timeit(conv_same, x, kp):7.2f} ms", flush=True)

    print(f"reflect_pad_packed:             "
          f"{timeit(jax.jit(reflect_pad_packed), x):7.2f} ms", flush=True)

    def slices(y):
        n, m = N, M
        parts = [y[:, a:a + n, b:b + m,
                   (a * 2 + b) * C:(a * 2 + b + 1) * C]
                 for a in range(2) for b in range(2)]
        return jnp.concatenate(parts, axis=-1)

    y = jax.random.normal(key, (B, N + 1, M + 1, 4 * C), DT)
    print(f"4 shifted slices + concat:      "
          f"{timeit(jax.jit(slices), y):7.2f} ms", flush=True)

    print(f"pack2 (orig->packed relayout):  "
          f"{timeit(jax.jit(pack2), xo):7.2f} ms", flush=True)
    print(f"unpack2:                        "
          f"{timeit(jax.jit(unpack2), x):7.2f} ms", flush=True)
    print(f"tile4:                          "
          f"{timeit(jax.jit(lambda a: tile4(a)), xo):7.2f} ms", flush=True)

    full = jax.jit(lambda x, k: packed_conv3x3_reflect(x, k))
    print(f"full packed_conv3x3_reflect:    "
          f"{timeit(full, x, k):7.2f} ms", flush=True)

    # reference: naive 3x3 SAME conv at original shape 16->16
    ref = jax.jit(lambda xo, k: jax.lax.conv_general_dilated(
        xo, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    print(f"naive 3x3 SAME 16->16 @2Nx2M:   "
          f"{timeit(ref, xo, k):7.2f} ms", flush=True)

    # bigger-lane reference: 3x3 SAME conv 64->64 at packed spatial
    k64 = jax.random.normal(key, (3, 3, 64, 64), DT)
    ref64 = jax.jit(lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    print(f"3x3 SAME 64->64 @NxM:           "
          f"{timeit(ref64, x, k64):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
