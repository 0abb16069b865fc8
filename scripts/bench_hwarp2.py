"""A/B the row-warp formulations at the config-4 shape (VERDICT r4 #4:
the 4-scale photometric warps are a dominant non-attack bucket).

  tri    — triangular-weight MXU contraction (bilinear_sample_rows_tri;
           the round-3 formulation). Wall: the VPU weight GENERATION
           (~4 ops/element over (B,H,Xo,W)), ~11 ms of its ~12 — a
           transposed contraction moves nothing (12.1 -> 11.6 ms).
  onehot — one equality per element + lane-full transposed contraction
           against the channel-concat [img, img_next] source; custom
           VJP reuses the forward taps for d_x (no weight regen, no
           matmul) — bilinear_sample_rows (the round-5 default).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_hwarp2.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from depthmodelhardening_tpu.ops.sampling import (
    bilinear_sample_rows, bilinear_sample_rows_tri,
)

B, H, W, C = 32, 320, 1024, 3


def _sync(r):
    # block_until_ready does not reliably sync through the axon
    # tunnel; a scalar host transfer does (see bench.py)
    return float(jnp.sum(jax.tree_util.tree_leaves(r)[0]
                         .astype(jnp.float32)))


def timeit(f, *args, n=10):
    _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n * 1000


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32),
                      jnp.bfloat16)
    x = jnp.asarray(rng.rand(B, H, W).astype(np.float32) * (W - 1))

    for nm, fn in (("tri", bilinear_sample_rows_tri),
                   ("onehot", bilinear_sample_rows)):
        fwd = jax.jit(lambda img, x, _f=fn: _f(img, x))
        grd = jax.jit(jax.grad(
            lambda img, x, _f=fn: jnp.sum(
                jnp.asarray(_f(img, x), jnp.float32) ** 2),
            argnums=(0, 1)))
        print(f"{nm:6s}: fwd {timeit(fwd, img, x):6.2f} ms   "
              f"fwd+grad {timeit(grd, img, x):6.2f} ms", flush=True)

    err = jax.jit(lambda img, x: jnp.max(jnp.abs(
        bilinear_sample_rows_tri(img, x).astype(jnp.float32)
        - bilinear_sample_rows(img, x).astype(jnp.float32))))
    print("maxerr", float(err(img, x)))


if __name__ == "__main__":
    main()
