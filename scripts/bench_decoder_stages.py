"""Decoder hot-stage diagnosis (b32 bf16, attack-crop shapes 320x512).

Times each expensive decoder stage shape as isolated XLA programs to
attribute the measured ~24 ms fwd / ~52 ms fwd+bwd decoder cost:
  * conv3x3 with reflection pad (the decoder's ConvBlock) vs zero-SAME
    pad vs an explicit im2col matmul formulation;
  * the nearest-upsample -> reflect-pad -> conv chain of upconv0.
Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_decoder_stages.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")

B = 32
DT = jnp.bfloat16

STAGES = [
    # (name, H, W, Cin, Cout)
    ("upconv1b 160x256 96->32", 160, 256, 96, 32),
    ("upconv0a 160x256 32->16", 160, 256, 32, 16),
    ("upconv0b 320x512 16->16", 320, 512, 16, 16),
    ("dispconv 320x512 16->1", 320, 512, 16, 1),
]


def _sync(out):
    """block_until_ready does not reliably sync through the axon
    tunnel; a host transfer does (cf. bench.py)."""
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def timeit(f, *args, n=20):
    _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000


def conv_reflect(x, k):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_reflect_custom(x, k):
    from depthmodelhardening_tpu.ops.padding import reflect_pad1

    return jax.lax.conv_general_dilated(
        reflect_pad1(x), k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_reflect_same_decomp(x, k):
    from depthmodelhardening_tpu.ops.padding import conv3x3_reflect_same

    return conv3x3_reflect_same(x, k)


def conv_same(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_im2col(x, k):
    Bn, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    cols = [xp[:, dy:dy + H, dx:dx + W, :]
            for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1)  # (B,H,W,9C)
    km = k.reshape(9 * C, -1)
    return jnp.einsum("bhwk,kc->bhwc", patches, km)


def main():
    key = jax.random.PRNGKey(0)
    for name, H, W, Cin, Cout in STAGES:
        x = jax.random.normal(key, (B, H, W, Cin), DT)
        k = jax.random.normal(key, (3, 3, Cin, Cout), DT)
        for label, fn in (("reflect-cvjp", conv_reflect_custom),
                          ("reflect-decomp", conv_reflect_same_decomp),
                          ("same-zero", conv_same)):
            f = jax.jit(fn)
            fwd = timeit(f, x, k)

            def loss(x, k, fn=fn):
                return jnp.sum(fn(x, k).astype(jnp.float32))

            g = jax.jit(jax.grad(loss, argnums=(0, 1)))
            bwd = timeit(g, x, k)
            print(f"{name:28s} {label:10s} fwd {fwd:7.2f} ms   "
                  f"fwd+bwd {bwd:7.2f} ms", flush=True)

    # the upsample chain of upconv0: nearest x2 then conv
    x = jax.random.normal(key, (B, 160, 256, 16), DT)
    k = jax.random.normal(key, (3, 3, 16, 16), DT)

    def up_chain(x, k):
        Bn, H, W, C = x.shape
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return conv_reflect(up, k)

    f = jax.jit(up_chain)
    print(f"upsample2x+conv 160->320     chain      fwd "
          f"{timeit(f, x, k):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
