"""A/B the row-interleave formulations of the fused up2conv
(ops/wpack_decoder.py:wpack_up2conv3x3_reflect).

Current: two (2,3) phase convs + jnp.stack + reshape — the stack/reshape
lowers to ~3 HBM relayout passes (copy -> reshape -> copy,
scripts/trace_summary.py on the step trace).

Candidate: ONE lhs_dilation=(2,1) conv with a (5,3) kernel whose odd/even
row taps carry the two phase kernels — the exact transposed-conv
identity (out[2i] = k0 X[i-1] + (k1+k2) X[i]; out[2i+1] = (k0+k1) X[i]
+ k2 X[i+1]), emitting interleaved rows directly with no relayout.
Whether it wins depends on how XLA lowers lhs dilation on TPU.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_interleave.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")

from depthmodelhardening_tpu.ops.wpack_decoder import (
    wpack_up2_kernels, wpack_up2conv3x3_reflect,
)


def up2conv_dilated(x, kernel, bias=None, f=4):
    """wpack_up2conv3x3_reflect as ONE lhs-dilated conv."""
    dt = x.dtype
    B, H, M, FC = x.shape
    Cin, Cout = kernel.shape[2], kernel.shape[3]
    F = 2 * f
    ka0, ka1 = wpack_up2_kernels(kernel, f)  # (2,3,fCin,FCout) each
    ka0 = ka0.astype(dt)
    ka1 = ka1.astype(dt)
    # K5 rows over zero-dilated X: out[2i] uses even taps s=0,2,4 ->
    # ka0 row taps (i-1+r); out[2i+1] uses odd taps s=1,3 -> ka1.
    # ka0 has 2 row taps (i-1, i) -> K5[0]=ka0[0], K5[2]=ka0[1], K5[4]=0
    # ka1 has taps (i, i+1)      -> K5[1]=ka1[0], K5[3]=ka1[1]
    z = jnp.zeros_like(ka0[0])
    K5 = jnp.stack([ka0[0], ka1[0], ka0[1], ka1[1], z], axis=0)
    # same nearest pads as the reference path
    left = x[:, :, 0:1, 0:Cin]
    zl = jnp.zeros((B, H, 1, (f - 1) * Cin), dt)
    right = x[:, :, M - 1:M, (f - 1) * Cin:f * Cin]
    xe = jnp.concatenate(
        [jnp.concatenate([zl, left], -1), x,
         jnp.concatenate([right, zl], -1)], axis=2)
    xe = jnp.concatenate([xe[:, 0:1], xe, xe[:, H - 1:H]], axis=1)
    # zero-dilated rows: Xz[2j] = xe[j], length 2H+3. out[o] =
    # sum_s K5[s] Xz[o+s]: even o=2i taps Xz[2i]=xe[i] (ka0[0]) and
    # Xz[2i+2]=xe[i+1] (ka0[1]); odd o=2i+1 taps xe[i+1] (ka1[0]) and
    # xe[i+2] (ka1[1]) — exactly y0/y1 interleaved. o=2H-1 reaches
    # Xz[2H+3] only through the zero K5[4] tap: pad high by 1.
    y = jax.lax.conv_general_dilated(
        xe, K5, window_strides=(1, 1), padding=((0, 1), (0, 0)),
        lhs_dilation=(2, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + jnp.tile(bias, F).astype(dt)
    return y


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(f, *a, n=10):
    _sync(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    B, H, M, f, Cin, Cout = 32, 160, 128, 4, 16, 16  # up0_1 @ full frame
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, M, f * Cin), jnp.bfloat16)
    k = jax.random.normal(key, (3, 3, Cin, Cout), jnp.float32)
    b = jnp.zeros((Cout,), jnp.float32)

    ref = jax.jit(lambda x: wpack_up2conv3x3_reflect(
        x, k.astype(jnp.bfloat16), b.astype(jnp.bfloat16), f=f))
    alt = jax.jit(lambda x: up2conv_dilated(
        x, k.astype(jnp.bfloat16), b.astype(jnp.bfloat16), f=f))

    r = ref(x)
    a = alt(x)
    print("shapes", r.shape, a.shape)
    d = jnp.max(jnp.abs(r.astype(jnp.float32) - a.astype(jnp.float32)))
    print("max|diff|", float(d))

    # consumer conv so the interleave's layout copy is paid inside
    kc = jax.random.normal(key, (3, 3, 2 * f * Cout, 64), jnp.bfloat16)

    def chain(fn):
        def g(x):
            y = fn(x)
            return jax.lax.conv_general_dilated(
                y, kc, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return g

    for name, fn in (("ref", ref), ("alt", alt)):
        c = jax.jit(chain(fn if name == "ref" else (
            lambda x: up2conv_dilated(x, k.astype(jnp.bfloat16),
                                      b.astype(jnp.bfloat16), f=f))))
        fwd = timeit(c, x)
        g = jax.jit(jax.grad(lambda x: jnp.sum(
            c(x).astype(jnp.float32))))
        fb = timeit(g, x)
        print(f"{name}: fwd {fwd:.2f} ms   grad {fb:.2f} ms")


if __name__ == "__main__":
    main()
