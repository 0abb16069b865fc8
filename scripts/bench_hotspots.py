"""Microbench suspected non-conv hotspots of the train step.

  - max_pool 3x3/s2 fwd and fwd+input-grad (SelectAndScatter backward)
  - ResNet stages fwd / fwd+igrad at crop + full shapes
  - wpacked decoder stage convs fwd / fwd+igrad
  - bilinear_resize of the scene batch (loop-hoisted, but in finals)

All b32 bf16. Isolated jit calls through the axon tunnel pay ~2.5 ms
dispatch floor — compare numbers relatively.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_hotspots.py
"""

import time

import jax
import jax.numpy as jnp
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")

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


def bench_maxpool(H, W, C, label):
    from depthmodelhardening_tpu.ops.pooling import max_pool_3x3_s2

    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), DT)
    pool = lambda x: nn.max_pool(x, (3, 3), strides=(2, 2),
                                 padding=((1, 1), (1, 1)))
    f = jax.jit(pool)
    t_f = timeit(f, x)
    g = jax.jit(jax.grad(lambda x: jnp.sum(pool(x).astype(jnp.float32))))
    t_g = timeit(g, x)
    gc = jax.jit(jax.grad(
        lambda x: jnp.sum(max_pool_3x3_s2(x).astype(jnp.float32))))
    t_gc = timeit(gc, x)
    print(f"maxpool {label} ({H}x{W}x{C}): fwd {t_f:.2f} | "
          f"fwd+igrad S&S {t_g:.2f} | custom {t_gc:.2f} ms", flush=True)


def bench_stage(stage, H, W, label):
    from depthmodelhardening_tpu.models.resnet import (
        run_stage, stage_in_features,
    )

    cin = stage_in_features(18, stage)

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return run_stage(x, stage, 18, DT, False)

    m = M()
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, cin), DT)
    v = m.init(jax.random.PRNGKey(1), x[:1].astype(jnp.float32))
    f = jax.jit(lambda v, x: m.apply(v, x))
    t_f = timeit(f, v, x)
    g = jax.jit(jax.grad(
        lambda x, v: jnp.sum(m.apply(v, x).astype(jnp.float32))))
    t_g = timeit(g, x, v)
    print(f"layer{stage+1} {label} ({H}x{W}x{cin}): fwd {t_f:.2f} | "
          f"fwd+igrad {t_g:.2f} ms", flush=True)


def bench_stem(H, W, label):
    from depthmodelhardening_tpu.ops.fused_upconv import s2d_stem_conv

    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, 3), DT)
    k = jax.random.normal(jax.random.PRNGKey(1), (7, 7, 3, 64), DT)
    f = jax.jit(s2d_stem_conv)
    t_f = timeit(f, x, k)
    g = jax.jit(jax.grad(
        lambda x, k: jnp.sum(s2d_stem_conv(x, k).astype(jnp.float32))))
    t_g = timeit(g, x, k)
    print(f"s2d stem {label} ({H}x{W}): fwd {t_f:.2f} | "
          f"fwd+igrad {t_g:.2f} ms", flush=True)


def bench_wconv(H, W, Cin, Cout, f_, label):
    from depthmodelhardening_tpu.ops.wpack_decoder import (
        wpack_conv3x3_reflect,
    )

    xw = jax.random.normal(jax.random.PRNGKey(0),
                           (B, H, W // f_, f_ * Cin), DT)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, Cin, Cout), DT)
    fn = jax.jit(lambda xw, k: wpack_conv3x3_reflect(xw, k, f=f_))
    t_f = timeit(fn, xw, k)
    g = jax.jit(jax.grad(lambda xw, k: jnp.sum(
        wpack_conv3x3_reflect(xw, k, f=f_).astype(jnp.float32))))
    t_g = timeit(g, xw, k)
    print(f"wconv {label} {Cin}->{Cout} f={f_} ({H}x{W}): fwd {t_f:.2f}"
          f" | fwd+igrad {t_g:.2f} ms", flush=True)


def main():
    print("=== crop 256x384 shapes (attack loop) ===", flush=True)
    bench_stem(256, 384, "crop")
    bench_maxpool(128, 192, 64, "crop")
    bench_stage(0, 64, 96, "crop")
    bench_stage(1, 64, 96, "crop")
    bench_stage(2, 32, 48, "crop")
    bench_stage(3, 16, 24, "crop")
    bench_wconv(128, 192, 32, 16, 8, "up0a-crop")
    bench_wconv(256, 384, 16, 16, 8, "up0b-crop")
    bench_wconv(256, 384, 16, 1, 8, "disp0-crop")
    print("=== full 320x1024 shapes (student/teacher) ===", flush=True)
    bench_stem(320, 1024, "full")
    bench_maxpool(160, 512, 64, "full")
    bench_stage(0, 80, 256, "full")
    bench_stage(1, 80, 256, "full")
    bench_stage(2, 40, 128, "full")
    bench_stage(3, 20, 64, "full")
    bench_wconv(160, 512, 32, 16, 8, "up0a-full")
    bench_wconv(320, 1024, 16, 16, 8, "up0b-full")
    bench_wconv(320, 1024, 16, 1, 8, "disp0-full")


if __name__ == "__main__":
    main()
