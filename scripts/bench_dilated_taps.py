"""A/B the zero-row tap in the lhs-dilated packed convs.

The shipped row-interleaving convs carry one all-zero kernel row:

- wpack_up2conv3x3_reflect: K5 = [ka0[0], ka1[0], ka0[1], ka1[1], 0]
  with padding (0, 1). The even output phase executes 3 row taps where
  2 suffice (the third is the zero row) — 25% wasted phase FLOPs.
- s2d8_stem_conv_dilated: K7 = [ka1[0], ka0[0], ..., ka0[2], 0] with
  padding (3, 4). The odd phase runs 4 taps where 3 suffice.

Candidate: drop the zero row and shrink the high padding by one —
identical window algebra (out[o] = sum_s K[s] Xz[o+s-pad_lo]; the
removed row only ever multiplied implicit zeros / the pad row).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_dilated_taps.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")

from depthmodelhardening_tpu.ops.wpack_decoder import (
    wpack_up2_kernels, wpack_up2conv3x3_reflect,
)
from depthmodelhardening_tpu.ops.wpack_encoder import (
    pack_stem_kernel8, s2d8_stem_conv_dilated,
)


def up2conv_k4(x, kernel, bias=None, f=4):
    dt = x.dtype
    B, H, M, FC = x.shape
    Cin, Cout = kernel.shape[2], kernel.shape[3]
    F = 2 * f
    ka0, ka1 = wpack_up2_kernels(kernel, f)
    ka0 = ka0.astype(dt)
    ka1 = ka1.astype(dt)
    K4 = jnp.concatenate([ka0[0:1], ka1[0:1], ka0[1:2], ka1[1:2]],
                         axis=0)
    z = jnp.zeros((B, H, 1, (f - 1) * Cin), dt)
    left = jnp.concatenate([z, x[:, :, 0:1, 0:Cin]], axis=-1)
    right = jnp.concatenate(
        [x[:, :, M - 1:M, (f - 1) * Cin:f * Cin], z], axis=-1)
    xe = jnp.concatenate([left, x, right], axis=2)
    xe = jnp.concatenate([xe[:, 0:1], xe, xe[:, H - 1:H]], axis=1)
    y = jax.lax.conv_general_dilated(
        xe, K4, window_strides=(1, 1), padding=((0, 0), (0, 0)),
        lhs_dilation=(2, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + jnp.tile(bias, F).astype(dt)
    return y


def stem_k6(x, kernel, normalize=True):
    B, H, W, C = x.shape
    if normalize:
        x = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
        C += 1
    x = jnp.pad(x, ((0, 0), (0, 0), (3, 5), (0, 0)))
    Wb = W // 8 + 1
    xb = x.reshape(B, H // 4, 4, Wb, 8, C)
    xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 4, Wb, 32 * C)
    ka0, ka1 = pack_stem_kernel8(kernel, normalize=normalize)
    ka0 = ka0.astype(x.dtype)
    ka1 = ka1.astype(x.dtype)
    K6 = jnp.concatenate([ka1[0:1], ka0[0:1], ka1[1:2], ka0[1:2],
                          ka1[2:3], ka0[2:3]], axis=0)
    return jax.lax.conv_general_dilated(
        xb, K6, window_strides=(1, 1), padding=((3, 3), (0, 0)),
        lhs_dilation=(2, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(f, *a, n=20):
    _sync(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def bench_pair(name, ref_fn, alt_fn, x):
    r, a = ref_fn(x), alt_fn(x)
    d = jnp.max(jnp.abs(r.astype(jnp.float32) - a.astype(jnp.float32)))
    print(f"{name}: max|diff| {float(d):.3e}  shapes {r.shape}")
    for nm, fn in (("ref", ref_fn), ("alt", alt_fn)):
        fwd = timeit(fn, x)
        g = jax.jit(jax.grad(lambda x: jnp.sum(
            fn(x).astype(jnp.float32))))
        fb = timeit(g, x)
        print(f"  {nm}: fwd {fwd:.2f} ms   grad {fb:.2f} ms")


def main():
    key = jax.random.PRNGKey(0)

    # up0_1 @ full frame: f=4 in, 16->16
    B, H, M, f, Cin, Cout = 32, 160, 128, 4, 16, 16
    x = jax.random.normal(key, (B, H, M, f * Cin), jnp.bfloat16)
    k = jax.random.normal(key, (3, 3, Cin, Cout), jnp.bfloat16)
    b = jnp.zeros((Cout,), jnp.bfloat16)
    bench_pair(
        "up2 f=4 16->16 @160x512",
        jax.jit(lambda x: wpack_up2conv3x3_reflect(x, k, b, f=f)),
        jax.jit(lambda x: up2conv_k4(x, k, b, f=f)), x)

    # up1_1-entry shape: f=2 in, 32->32 @80x512 (packed M=256)
    B, H, M, f, Cin, Cout = 32, 80, 256, 2, 32, 32
    x = jax.random.normal(key, (B, H, M, f * Cin), jnp.bfloat16)
    k = jax.random.normal(key, (3, 3, Cin, Cout), jnp.bfloat16)
    b = jnp.zeros((Cout,), jnp.bfloat16)
    bench_pair(
        "up2 f=2 32->32 @80x512",
        jax.jit(lambda x: wpack_up2conv3x3_reflect(x, k, b, f=f)),
        jax.jit(lambda x: up2conv_k4(x, k, b, f=f)), x)

    # stem @ full frame and @ attack crop
    k7 = jax.random.normal(key, (7, 7, 3, 64), jnp.bfloat16)
    for nm, (H, W) in (("full 320x1024", (320, 1024)),
                       ("crop 256x320", (256, 320))):
        x = jax.random.uniform(key, (32, H, W, 3), jnp.bfloat16)
        bench_pair(
            f"stem8 {nm}",
            jax.jit(lambda x: s2d8_stem_conv_dilated(x, k7)),
            jax.jit(lambda x: stem_k6(x, k7)), x)


if __name__ == "__main__":
    main()
