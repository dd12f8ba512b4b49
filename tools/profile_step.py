"""Round-3 on-chip phase profile of the flagship fwd+bwd step.

Times, on the real TPU chip, each sub-phase of the 250k-triangle
3840x1080 step in isolation (separate jits with their own
block_until_ready), plus the honest kernel work counters
(collect_stats=True) for the closest and batched any-hit queries —
quantifying how many Moller-Trumbore pairs each pass really evaluates
(the culling-efficiency oracle that decides where round-3 kernel work
should go).

Usage: python tools/profile_step.py [n_tris [width height]]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    from rendering_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 3840
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 1080

    from rendering_tpu.diff.inverse import apply_params, extract_params
    from rendering_tpu.flagship import build_flagship_scene
    from rendering_tpu.ops.pallas_intersect import bruteforce_mesh_pallas
    from rendering_tpu.render.integrator import DEFAULT_RAY_BLOCK
    from rendering_tpu.render.pipeline import derive_mesh_tables, render_scene
    from rendering_tpu.render.raygen import primary_rays

    print(f"backend={jax.default_backend()} tris={n_tris} "
          f"{width}x{height}", flush=True)
    scene = build_flagship_scene(
        width=width, height=height, n_tris=n_tris, enable_ssaa=False
    )
    n_rays = width * height

    # --- full fwd / fwd+bwd (the bench's step) ---
    paths = (("lights", 0, "intensity"), ("obj_color",), ("meshes", 0, "v"))
    params = extract_params(scene, paths)

    def loss_fn(params, scene):
        s = apply_params(scene, params, paths)
        frame, _ = render_scene(s)
        return jnp.mean(frame)

    import os
    if os.environ.get("PROFILE_SKIP_FULL"):
        # Reuse numbers from a previous run (compiles over the tunnel
        # cost ~10 min each); isolated phases only.
        dt_f = dt_fb = float(os.environ.get("PROFILE_FB_MS", "743.6")) / 1e3
    else:
        dt_f, _ = timeit(jax.jit(loss_fn), params, scene)
        print(f"fwd only          : {dt_f*1e3:8.1f} ms "
              f"({n_rays/dt_f/1e6:.2f} Mrays/s)", flush=True)
        dt_fb, _ = timeit(jax.jit(jax.value_and_grad(loss_fn)), params, scene)
        print(f"fwd+bwd           : {dt_fb*1e3:8.1f} ms "
              f"({n_rays/dt_fb/1e6:.2f} Mrays/s)", flush=True)

    # --- isolated phases ---
    scene_t = derive_mesh_tables(scene)
    mesh = scene_t.meshes[0]
    st = scene_t.static

    ro, rd, pix = primary_rays(scene_t, offset=1.0)  # (N, 3)
    ro3 = ro.T
    rd3 = rd.T

    def blocks(a3, n):
        """(3, N) -> (nb, 3, B) padded to DEFAULT_RAY_BLOCK blocks —
        the integrator's calling convention (one kernel call per block;
        a single 4M-ray call overflows the kernel's scoped VMEM)."""
        b = min(DEFAULT_RAY_BLOCK, n)
        nb = -(-n // b)
        pad = nb * b - n
        a3 = jnp.pad(a3, ((0, 0), (0, pad)), constant_values=1.0)
        return a3.reshape(3, nb, b).swapaxes(0, 1)

    @jax.jit
    def closest(ro3, rd3):
        rob = blocks(ro3, ro3.shape[1])
        rdb = blocks(rd3, rd3.shape[1])

        def body(args):
            ro_b, rd_b = args
            t, tri, _, _ = bruteforce_mesh_pallas(
                mesh, ro_b, rd_b, None,
                backface_culling=st.settings.use_backface_culling,
                tables=mesh.itables, rays_row=True,
            )
            return t, tri

        t, tri = jax.lax.map(body, (rob, rdb))
        return t.reshape(-1)[:n_rays], tri.reshape(-1)[:n_rays]

    dt_c, (t_hit, tri_hit) = timeit(closest, ro3, rd3)
    print(f"closest {n_rays/1e6:.1f}M rays : {dt_c*1e3:8.1f} ms "
          f"({n_rays/dt_c/1e6:.2f} Mrays/s)", flush=True)

    # Shadow query exactly as lighting() issues it: both lights
    # batched into one any-hit call from the real hit points.
    hit_mask = tri_hit >= 0
    t_safe = jnp.where(hit_mask, t_hit, 1.0)
    hp3 = ro3 + rd3 * t_safe[None, :]

    dirs = []
    dists = []
    for light in scene_t.lights:
        if light.kind == "distant":
            ld3 = jnp.broadcast_to(light.dir[:, None], hp3.shape)
            dist = jnp.where(hit_mask, 3.0e38, -1.0)
        else:
            delta3 = hp3 - light.pos[:, None]
            d2 = jnp.sum(delta3 * delta3, axis=0)
            dist = jnp.where(hit_mask, jnp.sqrt(d2), -1.0)
            ld3 = delta3 / jnp.sqrt(d2)[None, :]
        dirs.append(-ld3)
        dists.append(dist)
    s_ro3 = jnp.tile(hp3, (1, len(dirs)))
    s_rd3 = jnp.concatenate(dirs, axis=1)
    s_dist = jnp.concatenate(dists)

    ns = s_ro3.shape[1]

    def blocks1(a, n):
        b = min(DEFAULT_RAY_BLOCK, n)
        nb = -(-n // b)
        a = jnp.pad(a, (0, nb * b - n), constant_values=-1.0)
        return a.reshape(nb, b)

    @jax.jit
    def anyhit(s_ro3, s_rd3, s_dist):
        rob = blocks(s_ro3, ns)
        rdb = blocks(s_rd3, ns)
        db = blocks1(s_dist, ns)

        def body(args):
            ro_b, rd_b, d_b = args
            t, tri, _, _ = bruteforce_mesh_pallas(
                mesh, ro_b, rd_b, d_b,
                backface_culling=False,
                tables=mesh.itables, rays_row=True, mode="any",
            )
            return tri

        return jax.lax.map(body, (rob, rdb, db)).reshape(-1)[:ns]
    dt_a, _ = timeit(anyhit, s_ro3, s_rd3, s_dist)
    print(f"anyhit  {ns/1e6:.1f}M rays : {dt_a*1e3:8.1f} ms "
          f"({ns/dt_a/1e6:.2f} Mrays/s)", flush=True)

    # --- honest work counters ---
    @jax.jit
    def closest_stats(ro3, rd3):
        rob = blocks(ro3, n_rays)
        rdb = blocks(rd3, n_rays)

        def body(args):
            ro_b, rd_b = args
            _, tri, bx, tt = bruteforce_mesh_pallas(
                mesh, ro_b, rd_b, None,
                backface_culling=st.settings.use_backface_culling,
                tables=mesh.itables, rays_row=True, collect_stats=True,
            )
            return tri, bx, tt

        tri, bx, tt = jax.lax.map(body, (rob, rdb))
        return tri.reshape(-1)[:n_rays], jnp.sum(bx), jnp.sum(tt)

    @jax.jit
    def anyhit_stats(s_ro3, s_rd3, s_dist):
        rob = blocks(s_ro3, ns)
        rdb = blocks(s_rd3, ns)
        db = blocks1(s_dist, ns)

        def body(args):
            ro_b, rd_b, d_b = args
            _, tri, bx, tt = bruteforce_mesh_pallas(
                mesh, ro_b, rd_b, d_b,
                backface_culling=False,
                tables=mesh.itables, rays_row=True, mode="any",
                collect_stats=True,
            )
            return tri, bx, tt

        tri, bx, tt = jax.lax.map(body, (rob, rdb, db))
        return tri.reshape(-1)[:ns], jnp.sum(bx), jnp.sum(tt)

    _, (tri_c, bx_c, tt_c) = timeit(closest_stats, ro3, rd3, reps=1)
    occ_frac = None
    _, (tri_a, bx_a, tt_a) = timeit(anyhit_stats, s_ro3, s_rd3, s_dist,
                                    reps=1)
    occ = jnp.sum((tri_a >= 0) & (s_dist >= 0)) / jnp.maximum(
        jnp.sum(s_dist >= 0), 1)
    print(f"closest tri_tests : {float(tt_c)/1e9:8.2f} G "
          f"({float(tt_c)/n_rays:,.0f}/ray)  box {float(bx_c)/1e9:.2f} G",
          flush=True)
    print(f"anyhit  tri_tests : {float(tt_a)/1e9:8.2f} G "
          f"({float(tt_a)/ns:,.0f}/ray)  box {float(bx_a)/1e9:.2f} G  "
          f"occluded {float(occ)*100:.1f}%", flush=True)

    # --- differentiable hit re-evaluation + shading (everything else) ---
    rest = dt_fb - dt_c - dt_a
    print(f"residual (shading/gather/bwd/etc): {rest*1e3:8.1f} ms "
          f"({rest/dt_fb*100:.0f}% of step)", flush=True)


if __name__ == "__main__":
    main()
