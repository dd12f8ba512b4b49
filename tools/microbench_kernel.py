"""Microbenchmarks for the Pallas oracle redesign (round 2).

Measures, on the real TPU chip:
  1. per-grid-step overhead (trivial kernel, repeated block indices)
  2. the (4*Tc, 13) x (13, BR) matmul cost per step at HIGHEST/DEFAULT
     (reveals whether Mosaic pads K=13 to 128)
  3. full _intersect_chunk-style epilogue cost per step (VPU share)

Usage: python tools/microbench_kernel.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def bench_grid_overhead(n_steps=16384, br=1024):
    """Trivial kernel: 1D grid, every step revisits block 0 and does
    nothing but a guarded no-op. Measures pure grid sequencing cost."""

    def kernel(counts_ref, x_ref, o_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            o_ref[...] = x_ref[...]

    x = jnp.ones((8, br), jnp.float32)
    counts = jnp.zeros((1, 1), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((8, br), lambda s, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, br), lambda s, c: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    f = jax.jit(
        lambda c, x: pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, br), jnp.float32),
        )(c, x)
    )
    dt = timeit(f, counts, x)
    print(f"grid overhead: {n_steps} steps -> {dt*1e3:.2f} ms "
          f"({dt/n_steps*1e9:.0f} ns/step)")


def _mm_kernel(counts_ref, x_ref, c_ref, o_ref, *, precision, epilogue, tc):
    out = jax.lax.dot_general(
        c_ref[...], x_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if not epilogue:
        o_ref[...] = out[0:1, :] + o_ref[...] * 0.5
        return
    det = out[0 * tc:1 * tc, :]
    tdet = out[1 * tc:2 * tc, :]
    udet = out[2 * tc:3 * tc, :]
    vdet = out[3 * tc:4 * tc, :]
    ok = det >= 1e-8
    inv = 1.0 / jnp.where(ok, det, 1.0)
    u = udet * inv
    v = vdet * inv
    t = tdet * inv
    ok = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= 0)
    tm = jnp.where(ok, t, 3.0e38)
    t_min = jnp.min(tm, axis=0, keepdims=True)
    rows = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
    row = jnp.min(
        jnp.where(tm == jnp.broadcast_to(t_min, tm.shape), rows, 2**30),
        axis=0, keepdims=True)
    o_ref[...] = jnp.minimum(t_min + row.astype(jnp.float32) * 0.0,
                             o_ref[...])


def bench_matmul(tc=256, br=1024, n_steps=2048, precision="highest",
                 epilogue=False, k=13):
    prec = dict(highest=jax.lax.Precision.HIGHEST,
                default=jax.lax.Precision.DEFAULT)[precision]
    kern = functools.partial(_mm_kernel, precision=prec, epilogue=epilogue,
                             tc=tc)
    feats = jnp.ones((k, br), jnp.float32)
    # 64 distinct chunk tables cycled -> realistic DMA traffic
    n_tab = 64
    coef = jnp.ones((n_tab, 4 * tc, k), jnp.float32) * 1e-4

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((k, br), lambda s, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 4 * tc, k), lambda s, c: (s % n_tab, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, br), lambda s, c: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    counts = jnp.zeros((1, 1), jnp.int32)
    f = jax.jit(
        lambda c, x, co: pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, br), jnp.float32),
        )(c, x, co)
    )
    dt = timeit(f, counts, feats, coef)
    per = dt / n_steps
    flops = 2 * 4 * tc * br * k
    print(f"mm tc={tc} br={br} k={k} prec={precision} epi={epilogue}: "
          f"{per*1e6:.2f} us/step ({flops/per/1e12:.1f} TFLOP/s nominal)")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    bench_grid_overhead(16384)
    bench_grid_overhead(4096)
    for prec in ("highest", "default"):
        bench_matmul(tc=256, br=1024, precision=prec)
    bench_matmul(tc=256, br=1024, k=128)
    bench_matmul(tc=256, br=2048)
    bench_matmul(tc=256, br=512)
    bench_matmul(tc=256, br=256)
    bench_matmul(tc=512, br=1024)
    bench_matmul(tc=256, br=1024, epilogue=True)
    bench_matmul(tc=256, br=512, epilogue=True)
    bench_matmul(tc=256, br=2048, epilogue=True)
    bench_matmul(tc=128, br=1024, epilogue=True)
