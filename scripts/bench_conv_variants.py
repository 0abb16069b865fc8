"""Formulation shoot-out for the decoder's 16-channel 3x3 conv at
full-frame shape (b32 bf16, 320x1024, 16->16): XLA SAME conv vs packed
im2col matmul vs original-layout im2col. Perf-only (zero padding
everywhere; exactness is handled separately in ops/packed_decoder.py).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_conv_variants.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")

B = 32
DT = jnp.bfloat16
H, W, C = 320, 1024, 16
N, M = H // 2, W // 2


def _sync(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                         .astype(jnp.float32)))


def timeit(f, *args, n=20):
    _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000


def conv_same(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def im2col_orig(x, k):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + H, dx:dx + W, :]
            for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1)          # (B,H,W,9C)
    return patches @ k.reshape(9 * C, C)


def im2col_packed(xh, kp):
    """Packed input (B,N,M,4C) -> packed output via a 2x2-block im2col
    matmul: patches (B,N,M,16C) @ (16C, 4C)."""
    xp = jnp.pad(xh, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + N, dx:dx + M, :]
            for dy in range(2) for dx in range(2)]
    patches = jnp.concatenate(cols, axis=-1)          # (B,N,M,16C)
    return patches @ kp


def conv2x2_packed(xh, k22):
    return jax.lax.conv_general_dilated(
        xh, k22, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), DT)
    xh = jax.random.normal(key, (B, N, M, 4 * C), DT)
    k = jax.random.normal(key, (3, 3, C, C), DT)
    kp = jax.random.normal(key, (16 * C, 4 * C), DT)
    k22 = jax.random.normal(key, (2, 2, 4 * C, 4 * C), DT)

    for name, f, args in (
            ("3x3 SAME naive        ", conv_same, (x, k)),
            ("im2col original layout", im2col_orig, (x, k)),
            ("im2col packed layout  ", im2col_packed, (xh, kp)),
            ("2x2 conv packed       ", conv2x2_packed, (xh, k22)),
    ):
        jf = jax.jit(f)
        t_f = timeit(jf, *args)

        def loss(*a, f=f):
            return jnp.sum(f(*a).astype(jnp.float32))

        jg = jax.jit(jax.grad(loss, argnums=tuple(range(len(args)))))
        t_b = timeit(jg, *args)
        print(f"{name} fwd {t_f:7.2f} ms   fwd+bwd {t_b:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
