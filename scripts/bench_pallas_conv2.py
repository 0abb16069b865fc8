"""Pallas 3x3 conv, take 2: fold the 9 taps into ONE K=9*Cin MXU dot.

Round 1's kernel issued nine (Co,Cin)@(Cin,L) dots per block — K=16
fills 16/128 of the systolic depth, capping utilization at ~1.5%. Here
each block builds a (9*Cin, L) patch matrix in VMEM from nine static
lane-shifted slices of the row strip (VMEM->VMEM copies), then runs a
single (Co, 9Cin)@(9Cin, L) dot: K=144 fills the depth and only the
M=Co<=32 rows stay starved (12.5-25% ceiling vs XLA's measured ~3%).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_pallas_conv2.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")

B = 32
DT = jnp.bfloat16

STAGES = [
    ("upconv1b 160x256 96->32", 160, 256, 96, 32),
    ("upconv0a 160x256 32->16", 160, 256, 32, 16),
    ("upconv0b 320x512 16->16", 320, 512, 16, 16),
    ("dispconv 320x512 16->1", 320, 512, 16, 1),
]


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(f, *args, n=20):
    _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000


def conv_xla(x, k):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _make_kernel(rt, Wpad, Cin, Co, L, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_hbm, k_ref, out_ref):
        b = pl.program_id(0)
        i = pl.program_id(1)

        def body(xs, patches, sem):
            # overlapping row strips need a manual DMA (BlockSpec
            # indexing is block-granular)
            cp = pltpu.make_async_copy(
                x_hbm.at[b, :, pl.ds(i * rt * Wpad, (rt + 3) * Wpad)],
                xs, sem)
            cp.start()
            cp.wait()
            for dy in range(3):
                for dx in range(3):
                    off = dy * Wpad + dx
                    tap = dy * 3 + dx
                    patches[pl.ds(tap * Cin, Cin), :] = \
                        xs[:, pl.ds(off, L)]
            out_ref[0] = jax.lax.dot_general(
                k_ref[:, :], patches[:, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)

        pl.run_scoped(
            body,
            xs=pltpu.VMEM((Cin, (rt + 3) * Wpad), dtype),
            patches=pltpu.VMEM((9 * Cin, L), dtype),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    return kernel


def conv_pallas(x, k, rt=16):
    """x: (B, H, W, Cin) NHWC; k: (3,3,Cin,Co). Reflect-pad + 3x3."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from depthmodelhardening_tpu.ops.padding import reflect_pad1

    Bn, H, W, Cin = x.shape
    Co = k.shape[-1]
    xp = reflect_pad1(x)  # (B, H+2, W+2, Cin)
    Hp, Wp = H + 2, W + 2
    Wpad = ((Wp + 127) // 128) * 128
    xt = jnp.moveaxis(xp, -1, 1)  # (B, Cin, Hp, Wp)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, Wpad - Wp)))
    n_chunks = -(-H // rt)
    # pad rows so every chunk's (rt+3)-row strip (one junk row keeps
    # the last tap's rectangular slice in bounds) stays in bounds
    rows_needed = n_chunks * rt + 3
    if rows_needed > Hp:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, rows_needed - Hp), (0, 0)))
    xt = xt.reshape(Bn, Cin, -1)

    # km rows are (dy, dx, ci)-major to match the patch stacking
    km = k.reshape(9 * Cin, Co).T  # (Co, 9*Cin)

    L = rt * Wpad
    kernel = _make_kernel(rt, Wpad, Cin, Co, L, x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(Bn, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Co, L), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bn, Co, n_chunks * L), x.dtype),
    )(xt, km.astype(x.dtype))
    out = out.reshape(Bn, Co, n_chunks * rt, Wpad)[:, :, :H, :W]
    return jnp.moveaxis(out, 1, -1)


def _make_kernel_whole(rt, Wpad, Cin, Co, L, n_chunks, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, k_ref, out_ref, patches):
        # x_ref: (1, Cin, rows*Wpad) whole padded image in VMEM
        def chunk(i, _):
            # dynamic loads must be 128-aligned; take aligned row
            # segments and use static lane slices for the dx taps
            base = pl.multiple_of(i * rt * Wpad, 128)
            for dy in range(3):
                seg = x_ref[0, :, pl.ds(base + dy * Wpad, L + 128)]
                for dx in range(3):
                    tap = dy * 3 + dx
                    patches[pl.ds(tap * Cin, Cin), :] = seg[:, dx:dx + L]
            out_ref[0, :, pl.ds(i * L, L)] = jax.lax.dot_general(
                k_ref[:, :], patches[:, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk, 0)

    return kernel


def conv_pallas_whole(x, k, rt=16):
    """Whole image resident in VMEM, grid over batch only: kills the
    per-block DMA/launch overhead of the chunked variant."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from depthmodelhardening_tpu.ops.padding import reflect_pad1

    Bn, H, W, Cin = x.shape
    Co = k.shape[-1]
    xp = reflect_pad1(x)
    Hp, Wp = H + 2, W + 2
    Wpad = ((Wp + 127) // 128) * 128
    xt = jnp.moveaxis(xp, -1, 1)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, Wpad - Wp)))
    n_chunks = -(-H // rt)
    rows_needed = n_chunks * rt + 3
    if rows_needed > Hp:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, rows_needed - Hp), (0, 0)))
    xt = xt.reshape(Bn, Cin, -1)
    km = k.reshape(9 * Cin, Co).T

    L = rt * Wpad
    kernel = _make_kernel_whole(rt, Wpad, Cin, Co, L, n_chunks, x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(Bn,),
        in_specs=[
            pl.BlockSpec((1, Cin, rows_needed * Wpad),
                         lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Co, n_chunks * L), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bn, Co, n_chunks * L), x.dtype),
        scratch_shapes=[pltpu.VMEM((9 * Cin, L), x.dtype)],
    )(xt, km.astype(x.dtype))
    out = out.reshape(Bn, Co, n_chunks * rt, Wpad)[:, :, :H, :W]
    return jnp.moveaxis(out, 1, -1)


def main():
    key = jax.random.PRNGKey(0)
    for name, H, W, Cin, Co in STAGES:
        x = jax.random.normal(key, (B, H, W, Cin), DT)
        k = jax.random.normal(key, (3, 3, Cin, Co), DT) * 0.1
        if Cin > 32:
            continue  # whole-image strips for Cin>32 overflow VMEM
        ref = jax.jit(conv_xla)
        pal = jax.jit(conv_pallas_whole)
        r = ref(x, k)
        p = pal(x, k)
        err = float(jnp.max(jnp.abs(r.astype(jnp.float32) -
                                    p.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(r.astype(jnp.float32)))) + 1e-9
        t_ref = timeit(ref, x, k)
        t_pal = timeit(pal, x, k)
        print(f"{name:28s} xla {t_ref:6.2f} ms  pallas-whole {t_pal:6.2f}"
              f" ms  rel-err {err/scale:.2e}", flush=True)


if __name__ == "__main__":
    main()
