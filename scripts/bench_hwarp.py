"""Microbench formulations of the HORIZONTAL (row-aligned) warp that
dominates the full-hardening step: the stereo reprojection's
grid_sample is a per-row 1-D bilinear resample (rectified pair: the
projected y equals the source y exactly), but the generic 4-tap
flat-index gather lowers element-wise on TPU (~215 ms per tap at
batch 32, 320x1024 — 3.43 s of the 4.26 s step).

Variants (fwd + grad wrt coords, the training gradient):
  flat4   — current bilinear_sample_pixels (4 flat H*W gathers)
  flat2   — 2 flat gathers (row-aligned: y taps collapse)
  axis2   — take_along_axis along W with (B, H) batch dims
  onehot  — dense per-row two-tap weight matrix @ row (einsum)

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_hwarp.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from depthmodelhardening_tpu.ops.sampling import bilinear_sample_pixels

B, H, W, C = 32, 320, 1024, 3
DT = jnp.bfloat16


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]
                         .astype(jnp.float32)))


def timeit(f, *a, n=10):
    _sync(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    _sync(o)
    return (time.perf_counter() - t0) / n * 1000


def flat4(img, sx):
    ys = jnp.broadcast_to(
        jnp.arange(H, dtype=jnp.float32)[None, :, None], sx.shape)
    return bilinear_sample_pixels(img, sx, ys)


def flat2(img, sx):
    sxc = jnp.clip(sx, 0.0, W - 1)
    x0 = jnp.floor(sxc)
    w = (sxc - x0).astype(img.dtype)[..., None]
    x0 = x0.astype(jnp.int32)
    flat = img.reshape(B, H * W, C)
    row = jnp.arange(H, dtype=jnp.int32)[None, :, None] * W
    i0 = (row + x0).reshape(B, H * W, 1)
    i1 = (row + jnp.clip(x0 + 1, 0, W - 1)).reshape(B, H * W, 1)
    v0 = jnp.take_along_axis(flat, i0, axis=1).reshape(B, H, W, C)
    v1 = jnp.take_along_axis(flat, i1, axis=1).reshape(B, H, W, C)
    return v0 * (1 - w) + v1 * w


def axis2(img, sx):
    sxc = jnp.clip(sx, 0.0, W - 1)
    x0 = jnp.floor(sxc)
    w = (sxc - x0).astype(img.dtype)[..., None]
    x0 = x0.astype(jnp.int32)
    i0 = x0[..., None]
    i1 = jnp.clip(x0 + 1, 0, W - 1)[..., None]
    v0 = jnp.take_along_axis(img, jnp.broadcast_to(i0, (B, H, W, C)),
                             axis=2)
    v1 = jnp.take_along_axis(img, jnp.broadcast_to(i1, (B, H, W, C)),
                             axis=2)
    return v0 * (1 - w) + v1 * w


def onehot(img, sx):
    # per-row two-tap weight matrix (W_out, W_src) built in chunks of
    # 128 source columns, applied as einsum — MXU work, no gathers
    sxc = jnp.clip(sx, 0.0, W - 1)
    js = jnp.arange(W, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(sxc[..., None] - js))
    # border clamp: sx == W-1 exactly hits one tap of weight 1
    w = w.astype(img.dtype)
    return jnp.einsum("bhxj,bhjc->bhxc", w, img)


def main():
    k = jax.random.PRNGKey(0)
    img = jax.random.uniform(k, (B, H, W, C), DT)
    # realistic stereo shifts: 3..120 px, plus border excursions
    sx = (jnp.arange(W, dtype=jnp.float32)[None, None, :]
          + 40.0 + 80.0 * jax.random.uniform(
              jax.random.fold_in(k, 1), (B, H, W)))

    fns = {"flat4": flat4, "flat2": flat2, "axis2": axis2,
           "onehot": onehot}
    ref = None
    for name, fn in fns.items():
        f = jax.jit(fn)
        g = jax.jit(jax.grad(
            lambda s, fn=fn: jnp.sum(fn(img, s).astype(jnp.float32))))
        out = f(img, sx)
        if ref is None:
            ref = out
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"{name}: fwd {timeit(f, img, sx):8.2f} ms | "
              f"fwd+coordgrad {timeit(g, sx):8.2f} ms | "
              f"max|diff| {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
