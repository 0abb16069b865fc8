"""Prototype: Pallas fused VALID-3x3 conv on width-packed tensors.

Kernel shape experiment before productionizing (ops/pallas_wconv.py):
per (batch, row-tile) grid cell, assemble the 9-tap im2col patch in
VMEM via lane-concats of shifted slabs and hit the MXU with ONE
(TH*M, 9K) @ (9K, N) matmul, bias+ELU fused.

Compares against the XLA wpack_conv3x3_reflect pad-branch conv at the
up0b full-res shape (b32 bf16, K=N=128).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/proto_pallas_wconv.py
"""

import functools
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


def make_kernel(H, M, Mp2, K, N, TH, accum9=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_hbm, w_ref, b_ref, o_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)

        def body(xs, sem):
            cp = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(t * TH, TH + 2)], xs, sem)
            cp.start()
            cp.wait()
            if accum9:
                # nine shifted (TH*M, K) @ (K, N) matmuls accumulated
                # in f32 — no patch assembly copies
                acc = None
                for ky in range(3):
                    for kx in range(3):
                        s = xs[ky:ky + TH, kx:kx + M, :]
                        p = jnp.dot(
                            s.reshape(TH * M, K),
                            w_ref[(3 * ky + kx) * K:
                                  (3 * ky + kx + 1) * K],
                            preferred_element_type=jnp.float32)
                        acc = p if acc is None else acc + p
            else:
                slabs = []
                for ky in range(3):
                    for kx in range(3):
                        s = xs[ky:ky + TH, kx:kx + M, :]
                        slabs.append(s.reshape(TH * M, K))
                patch = jnp.concatenate(slabs, axis=1)  # (TH*M, 9K)
                acc = jnp.dot(patch, w_ref[...],
                              preferred_element_type=jnp.float32)
            acc = acc + b_ref[0][None, :].astype(jnp.float32)
            # expm1 has no Pallas TPU lowering; exp-1 is fine in f32
            y = jnp.where(acc > 0, acc, jnp.exp(acc) - 1.0)
            o_ref[0] = y.reshape(TH, M, N).astype(o_ref.dtype)

        pl.run_scoped(
            body,
            xs=pltpu.VMEM((TH + 2, Mp2, K), x_hbm.dtype),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    return kernel


def pallas_wconv(xe, w9, bias, TH, M, accum9=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bn, Hp2, Mp2, K = xe.shape
    H = Hp2 - 2
    N = w9.shape[1]
    kernel = make_kernel(H, M, Mp2, K, N, TH, accum9=accum9)
    grid = (Bn, H // TH)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bn, H, M, N), xe.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9 * K, N), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, M, N), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
    )(xe, w9, bias)


def main():
    from depthmodelhardening_tpu.ops.wpack_decoder import (
        wpack_conv3x3_kernel33, wpack_conv3x3_reflect,
    )

    H, W, Cin, Cout, f = 320, 1024, 16, 16, 8
    M, K, N = W // f, f * Cin, f * Cout
    key = jax.random.PRNGKey(0)
    xw = jax.random.normal(key, (B, H, M, K), DT)
    k = jax.random.normal(key, (3, 3, Cin, Cout), DT) * 0.1
    bias = jnp.zeros((Cout,), DT)

    ref_fn = jax.jit(lambda xw, k: jax.nn.elu(
        wpack_conv3x3_reflect(xw, k, bias, f=f)))
    t_ref = timeit(ref_fn, xw, k)
    print(f"XLA pad-branch conv+elu: {t_ref:.2f} ms", flush=True)

    # pre-pad once outside (the kernel consumes xe); padded copy is
    # timed separately to see both pieces
    k33 = wpack_conv3x3_kernel33(k, f).astype(DT)
    w9 = k33.transpose(0, 1, 2, 3).reshape(9 * K, N)

    def build_xe(xw):
        # zero pad (prototype: perf only, exactness later); the packed
        # width is padded up to a multiple of 8 — Mosaic requires HBM
        # slice shapes aligned to the (8, 128) tiling on the
        # second-to-minor dim, and 130 is not
        pad_r = (-(M + 2)) % 8 + 1
        return jnp.pad(xw, ((0, 0), (1, 1), (1, pad_r), (0, 0)))

    xe = jax.jit(build_xe)(xw)
    t_pad = timeit(jax.jit(build_xe), xw)
    b_tiled = jnp.tile(bias, f)[None, :]

    # XLA VALID conv on the SAME prepadded input — the apples-to-apples
    # baseline for the kernel alone (the reflect-pad build is shared)
    xla_valid = jax.jit(lambda xe, k33: jax.nn.elu(
        jax.lax.conv_general_dilated(
            xe[:, :, :M + 2], k33, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b_tiled[0]))
    print(f"XLA VALID conv+elu on prepadded: "
          f"{timeit(xla_valid, xe, k33):.2f} ms", flush=True)

    for accum9 in (False, True):
        for TH in (8, 16, 32):
            try:
                fn = jax.jit(functools.partial(
                    pallas_wconv, TH=TH, M=M, accum9=accum9))
                t = timeit(fn, xe, w9, b_tiled)
                print(f"pallas TH={TH} accum9={accum9}: {t:.2f} ms "
                      f"(+pad {t_pad:.2f})", flush=True)
            except Exception as e:
                print(f"pallas TH={TH} accum9={accum9}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    # parity vs XLA on the zero-padded conv (trim the alignment pad)
    ref0 = jax.nn.elu(jax.lax.conv_general_dilated(
        xe[:, :, :M + 2], k33, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b_tiled[0])
    got = pallas_wconv(xe, w9, b_tiled, TH=8, M=M)
    err = float(jnp.max(jnp.abs(ref0.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"parity max|diff| vs XLA zero-pad conv: {err}", flush=True)


if __name__ == "__main__":
    main()
