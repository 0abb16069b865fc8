"""Decompose the model passes that dominate the bench step.

Times, at BOTH the attack-crop shape (256x384, the PGD inner loop) and
the full frame (320x1024, the student grad / teacher fwd):

  encoder fwd                  (ResNet-18, s2d stem)
  encoder+decoder fwd          (scales=(0,), wpacked)
  fwd + input-grad             (what each PGD step pays)
  fwd + param-grad             (what the student step pays)

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_model_parts.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")

from depthmodelhardening_tpu.models.wrappers import init_monodepth2

B = 32


def _sync(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                         .astype(jnp.float32)))


def timeit(fn, *args, n=10):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000


def profile(H, W, label):
    model, variables = init_monodepth2(
        jax.random.PRNGKey(0), H, W, dtype=jnp.bfloat16, scales=(0,),
        s2d_stem=True, wpack_decoder=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3),
                          jnp.bfloat16)

    enc = jax.jit(lambda v, x: model.apply(v, x, method="encode")[-1])
    t_enc = timeit(enc, variables, x)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    t_fwd = timeit(fwd, variables, x)

    def loss(v, x):
        return jnp.mean(model.apply(v, x, train=False)
                        .astype(jnp.float32))

    gin = jax.jit(jax.grad(loss, argnums=1))
    t_gin = timeit(gin, variables, x)
    gpar = jax.jit(jax.grad(loss, argnums=0))
    t_gpar = timeit(gpar, variables, x)
    print(f"{label}: enc fwd {t_enc:.1f} | fwd {t_fwd:.1f} | "
          f"fwd+input-grad {t_gin:.1f} | fwd+param-grad {t_gpar:.1f} ms",
          flush=True)


def main():
    profile(256, 384, "crop 256x384")
    profile(320, 1024, "full 320x1024")


if __name__ == "__main__":
    main()
