"""A/B the fused up2conv lowering at the decoder's two stage shapes.

The round-5 step trace shows the lhs-dilated K4 conv
(wpack_up2conv3x3_reflect) at 76 TF/s vs ~150 for its peer convs —
XLA multiplies the zero-interleaved dilated rows densely instead of
phase-decomposing (23 ms of the 258 ms step). Candidates:

  dilated — ONE lhs-dilated 4-tap conv (the round-4 shipped form)
  phases  — TWO 2-tap phase convs + row-interleave stack/reshape
            (wpack_up2conv3x3_phases)

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_up2conv.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from depthmodelhardening_tpu.ops.wpack_decoder import (
    wpack_up2conv3x3_phases, wpack_up2conv3x3_reflect,
)

B = 32


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
    # (name, H_in, M, Cin, Cout, f): up1_1 main path reads the f=2
    # packed 32ch stage-1 feature at H/4; up0_1 reads f=4 16ch at H/2
    for nm, Hi, M, Cin, Cout, f in (
            ("up1_1m full", 80, 128, 32, 32, 2),
            ("up0_1 full", 160, 128, 16, 16, 4),
            ("up1_1m crop", 64, 40, 32, 32, 2),
            ("up0_1 crop", 128, 40, 16, 16, 4)):
        x = jnp.asarray(rng.randn(B, Hi, M, f * Cin).astype(np.float32),
                        jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, Cin, Cout).astype(np.float32),
                        jnp.bfloat16)
        b = jnp.asarray(rng.randn(Cout).astype(np.float32), jnp.bfloat16)
        for vn, fn in (("dilated", wpack_up2conv3x3_reflect),
                       ("phases", wpack_up2conv3x3_phases)):
            fwd = jax.jit(lambda x, k, b, _f=f, _fn=fn:
                          _fn(x, k, b, f=_f))
            ig = jax.jit(jax.grad(
                lambda x, k, b, _f=f, _fn=fn: jnp.sum(
                    _fn(x, k, b, f=_f).astype(jnp.float32)), argnums=0))
            gr = jax.jit(jax.grad(
                lambda x, k, b, _f=f, _fn=fn: jnp.sum(
                    _fn(x, k, b, f=_f).astype(jnp.float32)),
                argnums=(0, 1)))
            print(f"{nm} {vn:8s}: fwd {timeit(fwd, x, k, b):6.3f} ms  "
                  f"igrad {timeit(ig, x, k, b):6.3f} ms  "
                  f"grad {timeit(gr, x, k, b):6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
