"""A/B the SSIM+L1 reprojection-loss lowering at config-4 shape
(round-5 config-4 trace: pallas_reproj lines total ~88 ms of the
698 ms step across 5 full-res calls).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_reproj_loss.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from depthmodelhardening_tpu.ops.pallas_reproj import (
    _jnp_forward, fused_reprojection_loss,
)

B, H, W, C = 32, 320, 1024, 3


def _sync(r):
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
    # f32: the trainer feeds f32 colors/preds (disparities and warps
    # stay f32 through the loss tail)
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    y = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))

    for nm, fn in (("pallas", lambda a, b:
                    fused_reprojection_loss(a, b)),
                   ("jnp", _jnp_forward)):
        fwd = jax.jit(lambda a, b, _f=fn: _f(a, b))
        gr = jax.jit(jax.grad(
            lambda a, b, _f=fn: jnp.sum(_f(a, b).astype(jnp.float32)),
            argnums=(0, 1)))
        print(f"{nm:7s}: fwd {timeit(fwd, x, y):7.3f} ms   "
              f"fwd+grad {timeit(gr, x, y):7.3f} ms", flush=True)

    err = jax.jit(lambda a, b: jnp.max(jnp.abs(
        fused_reprojection_loss(a, b) - _jnp_forward(a, b))))
    print("maxerr", float(err(x, y)))


if __name__ == "__main__":
    main()
