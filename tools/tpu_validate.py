"""Post-change TPU validation: renders a set of golden scenes on the
REAL chip via the CLI and applies the CI tolerance logic, then
compiles/runs one collect_stats oracle call (the f32-SMEM stats
variant is TPU-only Mosaic code that interpret-mode tests cannot
cover) and the 1-device-mesh sharded lane.

Runnable from anywhere: it builds its own /tmp/vws workspace (scene
files resolve assets relative to the cwd — the reference binary's
contract) and chdirs into it.

  python /root/repo/tools/tpu_validate.py [scene ...]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np  # noqa: E402


def setup_workspace(ws: str = "/tmp/vws") -> None:
    """Shared asset layout for the committed golden scenes (same shape
    as tests/conftest.py::workspace)."""
    inp = os.path.join(ws, "input")
    os.makedirs(inp, exist_ok=True)
    for name, src in (
        ("objects", "/root/reference/input/objects"),
        ("skybox", "/root/reference/input/skybox"),
    ):
        dst = os.path.join(inp, name)
        if not os.path.exists(dst):
            os.symlink(src, dst)
    maps = os.path.join(inp, "maps")
    if not os.path.exists(maps):
        shutil.copytree("/root/repo/tests/assets/maps", maps)
    for f in os.listdir("/root/repo/tests/scenes"):
        if f.endswith(".scene"):
            shutil.copy(os.path.join("/root/repo/tests/scenes", f), ws)
    os.chdir(ws)

DEFAULT_SCENES = [
    "t01_simple_shapes",
    "t03_cow_textured",  # diffuse+normal+specular maps, TBN
    "t04_skybox",
    "t09_showac",
    "t10_shotgun",
    "t11_sphere_smooth",  # loosest golden budget — check it on chip too
    "t12_bunny_multi",   # fused multi-mesh dispatch on the real chip
    "t13_reflective_full",
]


def check_scene(name: str) -> bool:
    import jax

    from rendering_tpu.cli import main
    from rendering_tpu.utils.bmp import bmp_to_image, load_bmp
    from test_golden import SCENE_TOL, DEFAULT_TOL, neighborhood_violations

    assert jax.default_backend() == "tpu", jax.default_backend()
    out = f"/tmp/vws/{name}_tpu.bmp"
    main([f"{name}.scene", "--output", out])
    ours = bmp_to_image(load_bmp(out))
    gold = bmp_to_image(load_bmp(f"/root/repo/tests/goldens/{name}.bmp"))
    tol1, tol8, tolv = SCENE_TOL.get(name, DEFAULT_TOL)
    d = np.abs(ours.astype(np.int16) - gold.astype(np.int16))[1:-1, 1:-1]
    v = neighborhood_violations(ours, gold)[1:-1, 1:-1]
    ok = (
        (d > 1).mean() <= tol1
        and (d > 8).mean() <= tol8
        and v.mean() <= tolv
    )
    print(
        f"{name}: d>1 {(d > 1).mean():.5f}/{tol1} d>8 {(d > 8).mean():.5f}"
        f"/{tol8} viol {v.mean():.5f}/{tolv} -> {'OK' if ok else 'FAIL'}",
        flush=True,
    )
    return ok


def check_stats_kernel() -> bool:
    import jax

    from rendering_tpu.flagship import build_flagship_scene
    from rendering_tpu.ops.pallas_intersect import bruteforce_mesh_pallas

    scene = build_flagship_scene(width=64, height=32, enable_ssaa=False)
    mesh = scene.meshes[0]
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    ro = jnp.asarray(rng.uniform(-1, 1, (512, 3)), jnp.float32)
    rd = jnp.asarray(
        rng.uniform(-1, 1, (512, 3)) + np.array([0, 0, -2.0]), jnp.float32
    )
    t, tri, bt, tt = jax.jit(
        lambda ro, rd: bruteforce_mesh_pallas(
            mesh, ro, rd, collect_stats=True
        )
    )(ro, rd)
    jax.block_until_ready(tt)
    ok = float(tt) >= 0 and float(bt) > 0
    print(f"stats kernel: tri_tests={float(tt):.3e} box_tests="
          f"{float(bt):.3e} -> {'OK' if ok else 'FAIL'}", flush=True)
    return ok


def check_sharded_lane() -> bool:
    """shard_map + Pallas composed ON THE REAL CHIP (VERDICT r3 #4):
    render_scene_sharded over a 1-device mesh must equal the unsharded
    TPU render u8-exactly, and its throughput is reported. Until this
    lane existed the production multi-chip path had only ever executed
    on fake CPU devices — grid/scalar-prefetch interactions under
    shard_map are exactly where TPU surprises live."""
    import time

    import jax

    from rendering_tpu.flagship import build_flagship_scene
    from rendering_tpu.parallel.shard import (
        make_ray_mesh,
        render_scene_sharded,
    )
    from rendering_tpu.render.pipeline import render_scene

    assert jax.default_backend() == "tpu", jax.default_backend()
    scene = build_flagship_scene(width=512, height=256, enable_ssaa=True)
    mesh = make_ray_mesh(jax.devices()[:1])
    f_single = jax.jit(lambda s: render_scene(s, out_u8=True)[0])
    f_shard = jax.jit(
        lambda s: render_scene_sharded(s, mesh, out_u8=True)[0]
    )
    a = np.asarray(f_single(scene))
    b = np.asarray(f_shard(scene))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = f_shard(scene)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    rays = 512 * 256
    equal = bool((a == b).all())
    print(
        f"sharded lane (1-dev mesh, shard_map+Pallas on chip): "
        f"u8-equal={equal}, {rays / dt / 1e6:.2f}M rays/s "
        f"-> {'OK' if equal else 'FAIL'}",
        flush=True,
    )
    return equal


def check_geoshard_lane() -> bool:
    """Geometry sharding composed ON THE REAL CHIP: the full
    feature-complete geo path (fused tables through shard_map over a
    ('rays','geo') mesh, SSAA refinement, shade-sharded beyond-HBM
    mode) over a 1x1 mesh must equal the 1-D-sharded TPU render
    u8-exactly (both use pixel_dirs raygen). One physical chip can
    only validate the G=1 degenerate combine; the cross-shard
    reduction itself is pinned u8-exact on the virtual 8-device mesh
    (tests/test_geoshard.py)."""
    import dataclasses

    import jax

    from rendering_tpu.flagship import build_multimesh_scene
    from rendering_tpu.parallel.geoshard import (
        make_geo_mesh,
        render_scene_geo_sharded,
    )
    from rendering_tpu.parallel.shard import (
        make_ray_mesh,
        render_scene_sharded,
    )

    assert jax.default_backend() == "tpu", jax.default_backend()
    scene = build_multimesh_scene(256, 128, n_meshes=2,
                                  tris_per_mesh=2000)
    st = scene.static
    scene_g = dataclasses.replace(
        scene,
        static=dataclasses.replace(
            st, settings=st.settings.replace(geo_shard_axis="geo",
                                             enable_ssaa=True)
        ),
    )
    scene_r = dataclasses.replace(
        scene,
        static=dataclasses.replace(
            st, settings=st.settings.replace(enable_ssaa=True)
        ),
    )
    mesh1 = make_ray_mesh(jax.devices()[:1])
    gmesh = make_geo_mesh(jax.devices()[:1], n_geo=1)
    a = np.asarray(jax.jit(
        lambda s: render_scene_sharded(s, mesh1, out_u8=True)[0]
    )(scene_r))
    b = np.asarray(render_scene_geo_sharded(scene_g, gmesh,
                                            out_u8=True)[0])
    c = np.asarray(render_scene_geo_sharded(scene_g, gmesh,
                                            shade_sharded=True,
                                            out_u8=True)[0])
    equal = bool((a == b).all()) and bool((b == c).all())
    print(
        f"geoshard lane (1x1 mesh, fused+SSAA+shade-shard on chip): "
        f"u8-equal={equal} -> {'OK' if equal else 'FAIL'}",
        flush=True,
    )
    return equal


def main_() -> int:
    scenes = sys.argv[1:] or DEFAULT_SCENES
    setup_workspace()
    ok = check_stats_kernel()
    ok = check_sharded_lane() and ok
    ok = check_geoshard_lane() and ok
    for s in scenes:
        ok = check_scene(s) and ok
    print("ALL OK" if ok else "FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main_())
