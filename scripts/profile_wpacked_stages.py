"""Per-stage timing of the wpacked decoder at full-frame (320x1024)
and attack-crop (256x384) feature shapes, fwd and fwd+igrad, with the
~2.5 ms tunnel dispatch floor measured and subtracted.

Mirrors DepthDecoder._call_wpacked stage by stage (b32 bf16).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_wpacked_stages.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")

from depthmodelhardening_tpu.ops.padding import conv3x3_reflect_same
from depthmodelhardening_tpu.ops.resize import nearest_upsample2
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


def pick_f(cout, W):
    f = max(1, min(8, 128 // max(cout, 1)))
    while f > 1 and (W % f or W // f < 2):
        f //= 2
    return f


def measure(name, fn, *args, base=0.0):
    jfn = jax.jit(fn)
    t_f = timeit(jfn, *args) - base

    def loss(*a):
        return jnp.sum(fn(*a).astype(jnp.float32))

    g = jax.jit(jax.grad(loss, argnums=0))
    t_g = timeit(g, *args) - base
    print(f"{name:34s} fwd {t_f:6.2f} | fwd+igrad {t_g:6.2f} ms",
          flush=True)
    return t_f, t_g


def run(H, W, label):
    print(f"=== {label} ({H}x{W} model frame) ===", flush=True)
    key = jax.random.PRNGKey(0)

    # dispatch floor: a trivial program on a small array
    small = jnp.ones((8, 128), DT)
    base = timeit(jax.jit(lambda x: x + 1), small)
    print(f"dispatch floor: {base:.2f} ms", flush=True)

    def conv_stage(name, h, w, cin, cout):
        x = jax.random.normal(key, (B, h, w, cin), DT)
        k = jax.random.normal(key, (3, 3, cin, cout), DT) * 0.1
        measure(f"{name} {cin}->{cout} @{h}x{w}",
                lambda x, k=k: jax.nn.elu(conv3x3_reflect_same(x, k)),
                x, base=base)

    def wconv_stage(name, h, w, cin, cout, f):
        xw = jax.random.normal(key, (B, h, w // f, f * cin), DT)
        k = jax.random.normal(key, (3, 3, cin, cout), DT) * 0.1
        measure(f"{name} {cin}->{cout} f={f} @{h}x{w}",
                lambda xw, k=k: jax.nn.elu(
                    wpack_conv3x3_reflect(xw, k, f=f)),
                xw, base=base)

    h4, w4 = H // 32, W // 32
    conv_stage("upconv4_0", h4, w4, 512, 256)
    conv_stage("upconv4_1", h4 * 2, w4 * 2, 512, 256)
    conv_stage("upconv3_0", h4 * 2, w4 * 2, 256, 128)
    conv_stage("upconv3_1", h4 * 4, w4 * 4, 256, 128)
    conv_stage("upconv2_0", h4 * 4, w4 * 4, 128, 64)
    conv_stage("upconv2_1", h4 * 8, w4 * 8, 128, 64)

    h1, w1 = H // 8, W // 8
    f = pick_f(32, w1)
    wconv_stage("upconv1_0", h1, w1, 64, 32, f)
    f1 = pick_f(32, w1 * 2)
    wconv_stage("upconv1_1", h1 * 2, w1 * 2, 96, 32, f1)
    f0a = pick_f(16, w1 * 2)
    wconv_stage("upconv0_0", h1 * 2, w1 * 2, 32, 16, f0a)
    f0 = pick_f(16, w1 * 4)
    wconv_stage("upconv0_1", h1 * 4, w1 * 4, 16, 16, f0)
    wconv_stage("dispconv0", h1 * 4, w1 * 4, 16, 1, f0)

    # the upsamples + concats between stages
    x = jax.random.normal(key, (B, h1 * 2, w1 * 2, 32), DT)
    measure("up2x 32ch @%dx%d" % (h1 * 2, w1 * 2),
            lambda x: nearest_upsample2(x), x, base=base)


def main():
    run(320, 1024, "full")
    run(256, 384, "crop")


if __name__ == "__main__":
    main()
