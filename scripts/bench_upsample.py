"""2x nearest upsample formulations at decoder shapes (b32 bf16).

The broadcast-reshape upsample interleaves W in the sublane dimension,
which Mosaic executes far below the HBM roofline at low channel counts.
Candidates measured fwd and fwd+igrad:

  bcast   broadcast-reshape on (B,H,W,C)          (current)
  repeat  jnp.repeat axis=2 then axis=1
  dilpad  two interior-dilated lax.pads summed (W), row-repeat (H)
  wlane   width-packed lane duplication: (B,H,M,fC) f -> 2f entirely
          in lanes, H by row-stack; input/output stay packed

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_upsample.py
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


def timeit(fn, *args, n=20):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000


def up_bcast(x):
    B_, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B_, H, 2, W, 2, C))
    return x.reshape(B_, 2 * H, 2 * W, C)


def up_repeat(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=1)


def up_dilpad(x):
    B_, H, W, C = x.shape
    z = jnp.asarray(0, x.dtype)
    a = jax.lax.pad(x, z, ((0, 0, 0), (0, 0, 0), (0, 1, 1), (0, 0, 0)))
    b = jax.lax.pad(x, z, ((0, 0, 0), (0, 0, 0), (1, 0, 1), (0, 0, 0)))
    xw = a + b  # (B, H, 2W, C)
    a = jax.lax.pad(xw, z, ((0, 0, 0), (0, 1, 1), (0, 0, 0), (0, 0, 0)))
    b = jax.lax.pad(xw, z, ((0, 0, 0), (1, 0, 1), (0, 0, 0), (0, 0, 0)))
    return a + b


def up_wlane(xw, f, C):
    """(B,H,M,fC) packed f -> (B,2H,M,2fC) packed 2f over the 2x image.
    Width: per input phase block duplicate lanes (within-vreg);
    height: row interleave via stack on the outer dim."""
    B_, H, M, FC = xw.shape
    y = xw.reshape(B_, H, M, f, 1, C)
    y = jnp.broadcast_to(y, (B_, H, M, f, 2, C)).reshape(B_, H, M, 2 * f * C)
    y = jnp.broadcast_to(y[:, :, None], (B_, H, 2, M, 2 * f * C))
    return y.reshape(B_, 2 * H, M, 2 * f * C)


def run(H, W, C, f):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), DT)
    xw = x.reshape(B, H, W // f, f * C)
    base = timeit(jax.jit(lambda t: t + 1), jnp.ones((8, 128), DT))
    print(f"--- {H}x{W}x{C} (f={f}) dispatch {base:.2f} ms ---",
          flush=True)
    for name, fn, arg in (
            ("bcast", up_bcast, x),
            ("repeat", up_repeat, x),
            ("dilpad", up_dilpad, x),
            ("wlane", lambda t: up_wlane(t, f, C), xw)):
        jf = jax.jit(fn)
        t_f = timeit(jf, arg) - base
        g = jax.jit(jax.grad(
            lambda t: jnp.sum(fn(t).astype(jnp.float32))))
        t_g = timeit(g, arg) - base
        print(f"{name:7s} fwd {t_f:6.2f} | fwd+igrad {t_g:6.2f} ms",
              flush=True)
    # parity check for wlane
    ref = up_bcast(x)
    got = up_wlane(xw, f, C).reshape(B, 2 * H, W // f, 2 * f, C)
    got = got.reshape(B, 2 * H, 2 * W, C)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"wlane parity max|diff| = {err}", flush=True)


def main():
    run(160, 512, 16, 8)
    run(80, 256, 32, 4)
    run(128, 192, 16, 8)


if __name__ == "__main__":
    main()
