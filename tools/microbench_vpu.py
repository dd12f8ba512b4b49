"""Measure the chip's achievable VPU f32 throughput and HBM bandwidth
— the denominators for docs/PERF.md's roofline (VERDICT r3 #3: the
"single-chip plateau" claim must be arithmetic against hardware peaks,
not A/B exhaustion).

* VPU: TWO independent methodologies that must reconcile (~15%) —
  (1) a Pallas/Mosaic kernel iterating a long FMA chain on an
  (8, 128)-tile-aligned VMEM block, and (2) the same chain mix
  compiled by XLA's elementwise codegen (fori_loop of fused FMAs on
  the same VMEM-resident block). Pure element-wise f32, no memory
  traffic in the timed loop, the same instruction mix as the
  Moller-Trumbore kernel's inner pairs. Reports FLOP/s counting
  mul+add of each FMA as 2 (a chained `x*a+b` that cannot fuse
  further).
* HBM: device-to-device copy of a large f32 buffer (read+write bytes
  / time).

Usage: python tools/microbench_vpu.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 256, 1024          # (256, 1024) f32 block = 1 MB in VMEM
INNER = 4096                      # FMA chain length per element
GRID = 64                         # independent grid steps


N_CHAINS = 6  # independent accumulator chains per element (ILP)


def _fma_kernel(x_ref, o_ref):
    x = x_ref[...]
    a = x * 1.000001 + 0.3
    b = x * 0.999999 - 0.3
    accs = tuple(x + 0.01 * k for k in range(N_CHAINS))

    def body(_, accs):
        # N_CHAINS independent dependent-FMA chains per element: enough
        # ILP to fill the VPU pipeline, data-dependent enough that the
        # compiler cannot algebraically collapse any chain.
        return tuple(acc * a + b for acc in accs)

    accs = jax.lax.fori_loop(0, INNER, body, accs)
    out = accs[0]
    for acc in accs[1:]:
        out = out + acc
    o_ref[...] = out


@jax.jit
def _fma_bench(x):
    return pl.pallas_call(
        _fma_kernel,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
    )(x)


def _sync(x) -> float:
    """Force REAL completion: over the axon tunnel block_until_ready
    can return before the device work ran (async queueing — see the
    verify skill's timing gotcha), but a device->host fetch of a value
    derived from the result cannot."""
    return float(jnp.sum(x))


def vpu_flops(reps: int = 5) -> float:
    x = jnp.linspace(0.0, 1.0, ROWS * LANES, dtype=jnp.float32).reshape(
        ROWS, LANES
    )
    out = _fma_bench(x)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = _fma_bench(out)  # dependent chain across reps
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    flops = 2.0 * N_CHAINS * ROWS * LANES * INNER * GRID  # FMA = 2 flops
    return flops / dt


@jax.jit
def _fma_bench_xla(x):
    """SECOND, INDEPENDENT ceiling methodology (VERDICT r4 next-step
    5): the same FMA mix lowered by XLA's elementwise codegen instead
    of Mosaic/Pallas — same chain structure, same ILP, same
    VMEM-resident (1 MB) block, different compiler. If the two
    denominators disagree, the roofline's utilization figures inherit
    that uncertainty; reconciliation to ~15% pins them."""
    a = x * 1.000001 + 0.3
    b = x * 0.999999 - 0.3
    accs = tuple(x + 0.01 * k for k in range(N_CHAINS))

    def body(_, accs):
        return tuple(acc * a + b for acc in accs)

    accs = jax.lax.fori_loop(0, INNER * GRID, body, accs)
    out = accs[0]
    for acc in accs[1:]:
        out = out + acc
    return out


def vpu_flops_xla(reps: int = 5) -> float:
    x = jnp.linspace(0.0, 1.0, ROWS * LANES, dtype=jnp.float32).reshape(
        ROWS, LANES
    )
    out = _fma_bench_xla(x)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = _fma_bench_xla(out)  # dependent chain across reps
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    flops = 2.0 * N_CHAINS * ROWS * LANES * INNER * GRID
    return flops / dt


def hbm_bandwidth(reps: int = 5, mb: int = 512) -> float:
    n = mb * (1 << 20) // 4
    x = jnp.arange(n, dtype=jnp.float32)

    @jax.jit
    def copy(x):
        return x + 1.0  # one read + one write per element

    out = copy(x)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = copy(out)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    return 2.0 * n * 4 / dt


def main() -> int:
    from rendering_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    flops = vpu_flops()
    flops_xla = vpu_flops_xla()
    bw = hbm_bandwidth()
    print(json.dumps({
        "device": str(dev),
        "vpu_f32_flops_per_sec": round(flops / 1e12, 4),
        "vpu_f32_flops_per_sec_xla": round(flops_xla / 1e12, 4),
        "methodology_ratio": round(flops / max(flops_xla, 1.0), 3),
        "vpu_unit": "TFLOP/s",
        "hbm_bandwidth_gb_per_sec": round(bw / 1e9, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
