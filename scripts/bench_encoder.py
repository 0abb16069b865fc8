"""TPU microbench: ResnetEncoder naive vs s2d stem, b32 bf16 320x1024."""
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")
from depthmodelhardening_tpu.models.resnet import ResnetEncoder

B, H, W = 32, 320, 1024
x = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3),
                       jnp.bfloat16)

def sync(v):
    return float(jnp.sum(jnp.asarray(v, jnp.float32)))

for s2d in (False, True):
    enc = ResnetEncoder(num_layers=18, dtype=jnp.bfloat16,
                        s2d_stem=s2d)
    v = enc.init(jax.random.PRNGKey(1),
                 jnp.zeros((1, H, W, 3), jnp.float32))
    fwd = jax.jit(lambda v, x: enc.apply(v, x)[-1])
    t0 = time.time(); out = fwd(v, x); sync(out)
    print(f"s2d={s2d} fwd compile+run {time.time()-t0:.1f}s",
          flush=True)
    ts = time.time(); n = 20
    for _ in range(n):
        out = fwd(v, x)
    sync(out)
    print(f"s2d={s2d} fwd {(time.time()-ts)/n*1000:.1f} ms",
          flush=True)

    def loss(v, x):
        return sum(jnp.sum(jnp.asarray(f, jnp.float32))
                   for f in enc.apply(v, x))
    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    t0 = time.time(); gv = g(v, x); sync(gv[1])
    print(f"s2d={s2d} fwdbwd compile+run {time.time()-t0:.1f}s",
          flush=True)
    ts = time.time()
    for _ in range(n):
        gv = g(v, x)
    sync(gv[1])
    print(f"s2d={s2d} fwd+bwd {(time.time()-ts)/n*1000:.1f} ms",
          flush=True)
