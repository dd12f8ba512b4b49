"""On-chip A/B: any-hit (shadow) chunk-table shape (docs/PERF.md).

The batched shadow any-hit kernel is ~72% of the flagship fwd+bwd
step; unoccluded rays must disprove every live chunk, so finer cull
chunks trade more (n_sub, BR) slab batches for less wasted
Moller-Trumbore on that tail. This measures the flagship fwd+bwd step
with the default shared tables vs anyhit-specific shapes.

Kill criterion (VERDICT r3 #3): <3% improvement -> keep the default,
record the numbers in docs/PERF.md.

Usage: python tools/bench_anyhit_ab.py [--reps 3] [--tris 250000]
       [--shapes 32x16,32x8,128x8]
       [--compact 0.25,0.5]   # two-phase any-hit with mid-pass
                              # shadow-ray compaction instead of
                              # chunk shapes (VERDICT r4 next-step 3;
                              # settings.anyhit_compact_frac)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(scene, reps: int) -> float:
    import jax
    import jax.numpy as jnp

    from rendering_tpu.diff.inverse import apply_params, extract_params
    from rendering_tpu.render.pipeline import render_scene

    paths = (("lights", 0, "intensity"), ("obj_color",), ("meshes", 0, "v"))
    params = extract_params(scene, paths)

    def loss_fn(params, scene):
        s = apply_params(scene, params, paths)
        frame, _ = render_scene(s)
        return jnp.mean(frame)

    step = jax.jit(jax.value_and_grad(loss_fn))
    loss, g = step(params, scene)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(reps):
        loss, g = step(params, scene)
    jax.block_until_ready(g)
    return (time.perf_counter() - t0) / reps


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tris", type=int, default=250_000)
    ap.add_argument("--width", type=int, default=3840)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--shapes", default="32x16,32x8,128x8")
    ap.add_argument("--compact", default="",
                    help="comma list of anyhit_compact_frac values to "
                         "A/B instead of chunk shapes")
    args = ap.parse_args()

    from rendering_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

    from rendering_tpu.flagship import build_flagship_scene

    rays = args.width * args.height

    def build(anyhit_tc=0, anyhit_ns=0):
        scene = build_flagship_scene(
            width=args.width, height=args.height, n_tris=args.tris,
            enable_ssaa=False,
        )
        if not anyhit_tc:
            return scene
        st = scene.static
        settings = st.settings.replace(
            anyhit_tri_chunk=anyhit_tc, anyhit_n_sub=anyhit_ns
        )
        # Rebake the anyhit tables from the host-side arrays (tables
        # bake at build_scene; flagship builds from arrays we still
        # have on device — rebuild via numpy views of the mesh).
        import numpy as np

        from rendering_tpu.ops.pallas_intersect import (
            build_intersect_tables,
        )

        m = scene.meshes[0]
        import types

        host = types.SimpleNamespace(
            v=np.asarray(m.v),
            reach_lo=np.asarray(m.reach_lo),
            reach_hi=np.asarray(m.reach_hi),
            morton_perm=None,
        )
        tables = build_intersect_tables(
            host, tri_chunk=anyhit_tc, n_sub=anyhit_ns or None
        )
        meshes = (dataclasses.replace(m, itables_anyhit=tables),)
        return dataclasses.replace(
            scene, meshes=meshes,
            static=dataclasses.replace(st, settings=settings),
        )

    base = run(build(), args.reps)
    print(json.dumps({
        "shape": "default(shared)",
        "s_per_step": round(base, 4),
        "rays_per_sec": round(rays / base, 1),
    }), flush=True)
    if args.compact:
        for frac in args.compact.split(","):
            frac = float(frac)
            scene = build()
            st = scene.static
            scene = dataclasses.replace(
                scene,
                static=dataclasses.replace(
                    st,
                    settings=st.settings.replace(anyhit_compact_frac=frac),
                ),
            )
            dt = run(scene, args.reps)
            print(json.dumps({
                "shape": f"anyhit compact frac={frac}",
                "s_per_step": round(dt, 4),
                "rays_per_sec": round(rays / dt, 1),
                "vs_default": round(base / dt, 3),
            }), flush=True)
        return 0
    for shape in args.shapes.split(","):
        tc, ns = (int(v) for v in shape.split("x"))
        dt = run(build(tc, ns), args.reps)
        print(json.dumps({
            "shape": f"anyhit tc={tc} n_sub={ns}",
            "s_per_step": round(dt, 4),
            "rays_per_sec": round(rays / dt, 1),
            "vs_default": round(base / dt, 3),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
