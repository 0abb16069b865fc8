"""Packed (channel-major) decoder stages vs naive on the real TPU.

Times the decoder-only forward and fwd+bwd (grads wrt params+inputs)
at full-frame (320x1024) and attack-crop (256x384) shapes, b32 bf16 —
the two shapes the headline step runs the decoder at — plus the
isolated hot stages.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_packed_decoder.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")

from depthmodelhardening_tpu.models.depth_decoder import DepthDecoder
from depthmodelhardening_tpu.models.resnet import ResnetEncoder

B = 32
DT = jnp.bfloat16


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def timeit(f, *args, n=10):
    _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000


def bench_decoder(H, W, label):
    enc = ResnetEncoder(num_layers=18, dtype=DT)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (B, H, W, 3), DT)
    v_enc = enc.init(jax.random.PRNGKey(1), x[:1], train=False)
    feats = jax.jit(lambda v, x: enc.apply(v, x, train=False))(v_enc, x)
    feats = [jax.lax.stop_gradient(f) for f in feats]

    for packed in ("naive", "packed", "wpacked"):
        dec = DepthDecoder(dtype=DT, packed=packed == "packed",
                           wpacked=packed == "wpacked")
        v = dec.init(jax.random.PRNGKey(2), [f[:1] for f in feats])

        def fwd(v, feats):
            return dec.apply(v, feats)[("disp", 0)]

        f = jax.jit(fwd)
        t_f = timeit(f, v, feats)

        def loss(v, feats):
            outs = dec.apply(v, feats)
            return sum(jnp.sum(o.astype(jnp.float32))
                       for o in outs.values())

        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        t_b = timeit(g, v, feats)
        print(f"{label} {packed}: fwd {t_f:7.2f} ms   "
              f"fwd+bwd {t_b:7.2f} ms", flush=True)


def bench_stage(H, W, Cin, Cout, skip_ch, label):
    """One upsample+concat+conv chain, naive vs packed."""
    from depthmodelhardening_tpu.ops.packed_decoder import (
        pack2, packed_conv3x3_reflect, tile4,
    )
    from depthmodelhardening_tpu.ops.padding import conv3x3_reflect_same
    from depthmodelhardening_tpu.ops.resize import nearest_upsample2

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, H // 2, W // 2, Cin), DT)
    s = (jax.random.normal(rng, (B, H, W, skip_ch), DT)
         if skip_ch else None)
    k = jax.random.normal(rng, (3, 3, Cin + skip_ch, Cout), DT)

    def naive(x, s, k):
        up = nearest_upsample2(x)
        cat = jnp.concatenate([up, s], -1) if s is not None else up
        return conv3x3_reflect_same(cat, k)

    def packed(x, s, k):
        segs = [tile4(x)] + ([pack2(s)] if s is not None else [])
        return packed_conv3x3_reflect(
            segs, k, segment_channels=(Cin, skip_ch) if skip_ch
            else (Cin,))

    for name, fn in (("naive", naive), ("packed", packed)):
        f = jax.jit(fn)
        t_f = timeit(f, x, s, k)

        def loss(x, s, k, fn=fn):
            return jnp.sum(fn(x, s, k).astype(jnp.float32))

        g = jax.jit(jax.grad(loss, argnums=(0, 2) if s is None
                             else (0, 1, 2)))
        t_b = timeit(g, x, s, k)
        print(f"{label:34s} {name:6s} fwd {t_f:7.2f} ms   "
              f"fwd+bwd {t_b:7.2f} ms", flush=True)


def main():
    print("== isolated stages (b32 bf16) ==", flush=True)
    # i=1 chain at full frame: up(32@80x256)->cat f0(64)->conv 96->32
    bench_stage(160, 512, 32, 32, 64, "upconv1_1 96->32 @160x512")
    # i=0 chains at full frame
    bench_stage(320, 1024, 16, 16, 0, "upconv0_1 16->16 @320x1024")
    print("== decoder end-to-end ==", flush=True)
    bench_decoder(256, 384, "decoder 256x384 (attack crop)")
    bench_decoder(320, 1024, "decoder 320x1024 (full)")


if __name__ == "__main__":
    main()
