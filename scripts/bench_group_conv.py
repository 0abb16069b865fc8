"""Batch-folded grouped conv: (B,H,W,C) -> (1,H,W,B*C) with
feature_group_count=B turns the decoder's 16-lane convs into 512-lane
grouped convs — exact (each group applies the same 3x3xCxCo kernel).
Measures steady-state (layout held across stages) and the fold/unfold
relayout cost, b32 bf16.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_group_conv.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")

B = 32
DT = jnp.bfloat16


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


def conv_same(x, k, groups=1):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def fold(x):
    Bn, H, W, C = x.shape
    return x.transpose(1, 2, 0, 3).reshape(1, H, W, Bn * C)


def unfold(xf, Bn):
    _, H, W, BC = xf.shape
    return xf.reshape(H, W, Bn, BC // Bn).transpose(2, 0, 1, 3)


def run(H, W, Cin, Cout, label):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, Cin), DT)
    xf = jax.random.normal(key, (1, H, W, B * Cin), DT)
    k = jax.random.normal(key, (3, 3, Cin, Cout), DT)

    f_naive = jax.jit(lambda x, k: conv_same(x, k))
    t0 = timeit(f_naive, x, k)

    def grouped(xf, k):
        kg = jnp.tile(k, (1, 1, 1, B))  # (3,3,Cin,B*Cout) group-major?
        return conv_same(xf, kg, groups=B)

    f_grp = jax.jit(grouped)
    t1 = timeit(f_grp, xf, k)

    f_fold = jax.jit(lambda x: fold(x))
    t2 = timeit(f_fold, x)
    f_unfold = jax.jit(lambda xf: unfold(xf, B))
    t3 = timeit(f_unfold, xf)

    def loss_naive(x, k):
        return jnp.sum(conv_same(x, k).astype(jnp.float32))

    def loss_grp(xf, k):
        return jnp.sum(grouped(xf, k).astype(jnp.float32))

    g0 = timeit(jax.jit(jax.grad(loss_naive, (0, 1))), x, k)
    g1 = timeit(jax.jit(jax.grad(loss_grp, (0, 1))), xf, k)
    print(f"{label}: naive fwd {t0:6.2f} grp fwd {t1:6.2f}   "
          f"naive f+b {g0:6.2f} grp f+b {g1:6.2f}   "
          f"fold {t2:5.2f} unfold {t3:5.2f} ms", flush=True)


def main():
    run(320, 1024, 16, 16, "16->16 @320x1024")
    run(160, 512, 96, 32, "96->32 @160x512 ")
    run(160, 512, 32, 16, "32->16 @160x512 ")
    run(320, 1024, 16, 1, "16->1  @320x1024")


if __name__ == "__main__":
    main()
