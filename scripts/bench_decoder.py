"""TPU microbench: DepthDecoder naive vs fused upconv, b32 bf16."""
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")
from depthmodelhardening_tpu.models.depth_decoder import DepthDecoder

B = 32
shapes = [(160, 512, 64), (80, 256, 64), (40, 128, 128),
          (20, 64, 256), (10, 32, 512)]
k = jax.random.PRNGKey(0)
feats = [jax.random.normal(jax.random.fold_in(k, i), (B, h, w, c),
                           jnp.bfloat16)
         for i, (h, w, c) in enumerate(shapes)]

def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))

for fused in (False, True):
    dec = DepthDecoder(dtype=jnp.bfloat16, fuse_upconv=fused)
    v = dec.init(jax.random.PRNGKey(1),
                 [f[:1].astype(jnp.float32) for f in feats])

    fwd = jax.jit(lambda v, fs: dec.apply(v, fs)[("disp", 0)])
    t0 = time.time()
    out = fwd(v, feats); sync(out)
    print(f"fused={fused} fwd compile+run {time.time()-t0:.1f}s",
          flush=True)
    ts = time.time(); n = 10
    for _ in range(n):
        out = fwd(v, feats)
    sync(out)
    fwd_ms = (time.time() - ts) / n * 1000
    print(f"fused={fused} fwd {fwd_ms:.1f} ms", flush=True)

    def loss(v, fs):
        o = dec.apply(v, fs)
        return sum(jnp.sum(jnp.asarray(x, jnp.float32))
                   for x in o.values())
    # grads wrt params AND input features (the attack loop needs both)
    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    t0 = time.time()
    gv = g(v, feats); sync(gv[1][0])
    print(f"fused={fused} fwdbwd compile+run {time.time()-t0:.1f}s",
          flush=True)
    ts = time.time()
    for _ in range(n):
        gv = g(v, feats)
    sync(gv[1][0])
    print(f"fused={fused} fwd+bwd {(time.time()-ts)/n*1000:.1f} ms",
          flush=True)
