"""Benchmark — rays/sec/chip forward+backward on the shotgun.scene
workload (BASELINE.md / BASELINE.json north star).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

value = primary rays per second for one full fwd+bwd step (render the
3840x1080 shotgun frame, pixel loss, gradients w.r.t. light intensity +
object color + mesh vertices). The reference baseline is ~0.7e6
primary rays/s FORWARD-ONLY on a multicore desktop CPU (derived in
BASELINE.md); vs_baseline = value / 0.7e6, conservatively comparing our
fwd+bwd against its fwd-only.

Env knobs: BENCH_WIDTH/BENCH_HEIGHT/BENCH_TRIS/BENCH_REPS.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main() -> int:
    width = int(os.environ.get("BENCH_WIDTH", 3840))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    reps = int(os.environ.get("BENCH_REPS", 5))
    n_tris = os.environ.get("BENCH_TRIS")
    n_tris = int(n_tris) if n_tris else None

    from rendering_tpu.diff.inverse import extract_params
    from rendering_tpu.flagship import build_flagship_scene
    from rendering_tpu.render.pipeline import render_scene

    scene = build_flagship_scene(
        width=width, height=height, n_tris=n_tris, enable_ssaa=False
    )

    paths = (("lights", 0, "intensity"), ("obj_color",), ("meshes", 0, "v"))
    params = extract_params(scene, paths)

    from rendering_tpu.diff.inverse import apply_params

    def loss_fn(params, scene):
        s = apply_params(scene, params, paths)
        frame, _ = render_scene(s)
        return jnp.mean(frame)

    step = jax.jit(jax.value_and_grad(loss_fn))

    # warmup/compile
    loss, grads = step(params, scene)
    jax.block_until_ready(grads)

    t0 = time.perf_counter()
    for _ in range(reps):
        loss, grads = step(params, scene)
    jax.block_until_ready(grads)
    dt = (time.perf_counter() - t0) / reps

    primary_rays = width * height
    value = primary_rays / dt
    baseline = 0.7e6
    print(
        json.dumps(
            {
                "metric": "shotgun_fwd_bwd_primary_rays_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "rays/s",
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
