"""Benchmark — rays/sec/chip forward+backward on the shotgun.scene
workload (BASELINE.md / BASELINE.json north star), at BOTH mesh sizes:

  * 250k triangles (the README's "250,000 triangle" model,
    /root/reference/README.md:69 — the north-star mesh size), measured
    on BOTH geometries: the bundled shotgun.obj subdivided+displaced to
    250k REAL triangles (flagship.densify_mesh; the committed headline
    when the two diverge >30%) and the procedural sphere mesh (the
    cross-geometry floor), and
  * the bundled 1,539-triangle shotgun.obj size.

Prints ONE JSON line. The headline metric/value/vs_baseline are the
250k-triangle numbers (the reference's derived ~0.7e6 primary rays/s
FORWARD-ONLY CPU baseline comes from that size); the bundled-size
result rides along as small_mesh_* keys so the small-mesh regression
axis stays visible in every BENCH_r*.json.

value = primary rays per second for one full fwd+bwd step (render the
3840x1080 frame, pixel loss, gradients w.r.t. light intensity + object
color + mesh vertices). fwd+bwd is compared against the reference's
fwd-only baseline — conservative.

Env knobs: BENCH_WIDTH/BENCH_HEIGHT/BENCH_TRIS/BENCH_REPS (BENCH_TRIS
forces a single run at that triangle count).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def build_scene_for(width, height, n_tris, real_geometry=False):
    from rendering_tpu.flagship import build_flagship_scene

    return build_flagship_scene(
        width=width, height=height, n_tris=n_tris, enable_ssaa=False,
        real_geometry=real_geometry,
    )


def run_size(scene, reps, forward_only=False):
    from rendering_tpu.diff.inverse import apply_params, extract_params
    from rendering_tpu.render.pipeline import render_scene

    width = scene.static.settings.width
    height = scene.static.settings.height
    paths = (("lights", 0, "intensity"), ("obj_color",), ("meshes", 0, "v"))
    params = extract_params(scene, paths)

    def loss_fn(params, scene):
        s = apply_params(scene, params, paths)
        frame, _ = render_scene(s)
        return jnp.mean(frame)

    if forward_only:
        # Apples-to-apples with the reference's 0.7M rays/s baseline
        # (a forward render, no gradients).
        step = jax.jit(loss_fn)
        out = step(params, scene)  # warmup/compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = step(params, scene)
        jax.block_until_ready(out)
    else:
        step = jax.jit(jax.value_and_grad(loss_fn))
        loss, out = step(params, scene)  # warmup/compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            loss, out = step(params, scene)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return (width * height) / dt


def _probe_backend(timeout_s: float = 300.0) -> None:
    """Fail fast instead of hanging forever: when the axon TPU tunnel
    is down, jax backend init blocks indefinitely (even with
    JAX_PLATFORMS=cpu — the plugin dials the tunnel during
    registration). Probe init in a killable subprocess first."""
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            timeout=timeout_s, check=True, capture_output=True,
        )
    except subprocess.TimeoutExpired:
        print(
            f"bench: jax backend init hung for {timeout_s:.0f}s — the "
            f"TPU tunnel is unreachable; refusing to hang. Retry when "
            f"the tunnel is up.",
            file=sys.stderr,
        )
        raise SystemExit(1)
    except subprocess.CalledProcessError as e:
        # Fast failure (broken install, plugin import error): surface
        # the child's actual diagnostic instead of a bare traceback.
        print("bench: jax backend probe failed:", file=sys.stderr)
        sys.stderr.write(e.stderr.decode(errors="replace"))
        raise SystemExit(1)


def main() -> int:
    from rendering_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    _probe_backend()
    width = int(os.environ.get("BENCH_WIDTH", 3840))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    reps = int(os.environ.get("BENCH_REPS", 5))
    forced = os.environ.get("BENCH_TRIS")
    baseline = 0.7e6

    if forced:
        scene = build_scene_for(width, height, int(forced))
        value = run_size(scene, reps)
        print(json.dumps({
            "metric": f"shotgun{forced}_fwd_bwd_primary_rays_per_sec_per_chip",
            "value": round(value, 1),
            "unit": "rays/s",
            "vs_baseline": round(value / baseline, 3),
        }))
        return 0

    proc_scene = build_scene_for(width, height, 250000)
    proc = run_size(proc_scene, reps)
    del proc_scene

    # REAL 250k geometry: the bundled shotgun.obj subdivided+displaced
    # to the README's 250k count (flagship.densify_mesh) — real thin
    # features / self-occlusion instead of the best-case-coherence
    # procedural sphere (VERDICT r3 #2). The HEADLINE is the real-
    # geometry number whenever the two differ by >30% (else the
    # procedural one, for continuity with earlier rounds).
    from rendering_tpu.flagship import REFERENCE_DIR

    have_assets = os.path.exists(
        os.path.join(REFERENCE_DIR, "input", "objects", "shotgun.obj")
    )
    real = None
    if have_assets:
        real_scene = build_scene_for(
            width, height, 250000, real_geometry=True
        )
        real = run_size(real_scene, reps)
        del real_scene

    if real is not None and abs(real - proc) / max(proc, 1.0) > 0.30:
        headline, geometry = real, "real_subdivided_shotgun"
    else:
        headline, geometry = proc, "procedural"
    head_scene = build_scene_for(
        width, height, 250000, real_geometry=geometry != "procedural"
    )
    head_fwd = run_size(head_scene, reps, forward_only=True)
    del head_scene

    # Bundled 1,539-tri shotgun.obj size; the metric is labeled by the
    # ACTUAL triangle count (without the reference assets mounted the
    # builder falls back to a 250k procedural mesh — a mislabeled
    # "small" number must not silently enter BENCH_r*.json).
    small_scene = build_scene_for(width, height, None)
    small_tris = int(small_scene.static.meshes[0].n_tris)
    small = run_size(small_scene, reps)
    print(json.dumps({
        "metric": "shotgun250k_fwd_bwd_primary_rays_per_sec_per_chip",
        "value": round(headline, 1),
        "unit": "rays/s",
        "vs_baseline": round(headline / baseline, 3),
        "geometry": geometry,
        "procedural250k_rays_per_sec": round(proc, 1),
        "real250k_rays_per_sec": (
            round(real, 1) if real is not None else None
        ),
        "fwd_only_rays_per_sec": round(head_fwd, 1),
        "fwd_only_vs_baseline": round(head_fwd / baseline, 3),
        "small_mesh_tris": small_tris,
        "small_mesh_rays_per_sec": round(small, 1),
        "small_mesh_vs_baseline": round(small / baseline, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
