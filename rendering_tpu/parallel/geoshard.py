"""By-primitive GEOMETRY sharding (SURVEY section 5.8 stretch goal).

The default scale-out replicates the scene and shards rays — right for
shotgun-class scenes (<< 1 GB). For scenes whose acceleration tables
outgrow one chip's HBM, this module shards the FUSED chunk tables
themselves across a second mesh axis:

  mesh = Mesh(devices.reshape(R, G), ("rays", "geo"))

* the fused super-chunk tables (ops.pallas_intersect.FusedTables) are
  padded to G-divisible super counts and physically sharded along the
  super axis (shard_map in_specs) — each device HOLDS 1/G of the
  scene's triangles in kernel format;
* every device intersects its ray shard against its table shard (the
  kernel and its tile pre-cull are shard-size-agnostic);
* trace_closest combines per-ray winners across 'geo' with pmin +
  rank-tie-break psum selects, trace_occlusion with a psum-any — both
  collectives produce vma-unvarying results, so shading runs once per
  ray shard on the combined hit, replicated over 'geo'
  (render.integrator fused branches, settings.geo_shard_axis);
* idmap values are GLOBAL (mesh sub index / vgeoT column), so a shard-
  local hit needs no id rebasing after the combine.

Scope: this shards the INTERSECTION tables (16 f32 rows per triangle
+ chunk boxes) always, and with shade_sharded=True ALSO the
shading-side (30, T) vgeoT table — column-wise over 'geo', with the
winner-row gather done locally per shard and combined by one masked
psum (render.integrator, SceneData.vgeoT_sharded). The replicated
per-mesh geometry arrays (v/n/uv/tangents/vgeoT/BVH) are stripped to
zero-size in that mode, so each device holds only 1/G of ALL
per-triangle data — intersection and shading — plus the (small)
replicated maps/lights/materials.

Scenes must be built with settings.geo_shard_axis="geo" (the combine
collectives are traced into the bounce loop) and can then ONLY render
through render_scene_geo_sharded. Demo scope: primary pass (the
benchmark shape; SSAA refinement composes the same way the ray-sharded
SSAA pass does but is not wired here).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from rendering_tpu.ops.pallas_intersect import (
    FusedTables,
    IntersectTables,
    _FMAX,
)
from rendering_tpu.parallel.shard import _round_robin_layout, _shard_map
from rendering_tpu.render.integrator import DEFAULT_RAY_BLOCK, integrate
from rendering_tpu.render.raygen import pixel_dirs


def make_geo_mesh(devices=None, n_geo: int = 2) -> Mesh:
    """2-D (rays, geo) mesh over the devices; n_geo divides them."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size % n_geo == 0
    return Mesh(devices.reshape(devices.size // n_geo, n_geo),
                ("rays", "geo"))


def pad_fused_for_shards(ft: FusedTables, g: int) -> FusedTables:
    """Pad the super-chunk count to a multiple of g so P('geo') shards
    whole supers. Padding supers carry zero triangles and inverted
    boxes — the cull's validity test rejects them. Host numpy tables
    (the beyond-HBM build, scene.build_scene as_numpy) stay numpy, so
    shard_map's sharded in_specs can transfer each device only its
    shard instead of staging the padded whole on one device."""
    cs = ft.geo.sbox.shape[0]
    pad = (-cs) % g
    if pad == 0:
        return ft
    xp = np if isinstance(ft.geo.sbox, np.ndarray) else jnp
    tc, ns = ft.geo.tri_chunk, ft.geo.n_sub
    inv_box = np.concatenate(
        [np.full((pad, 3), _FMAX, np.float32),
         np.full((pad, 3), -_FMAX, np.float32),
         np.zeros((pad, 2), np.float32)], axis=1,
    )
    inv_cbox = np.repeat(inv_box, ns, axis=0)
    geo = IntersectTables(
        tc, ns, None,
        xp.concatenate(
            [ft.geo.tri, xp.zeros((pad,) + ft.geo.tri.shape[1:],
                                  np.float32)]
        ),
        xp.concatenate([ft.geo.cbox, xp.asarray(inv_cbox)]),
        xp.concatenate([ft.geo.sbox, xp.asarray(inv_box)]),
    )
    idmap = xp.concatenate(
        [ft.idmap, xp.zeros((2, pad * ns * tc), np.int32)], axis=1
    )
    return FusedTables(geo, idmap, ft.n_meshes, ft.any_clipped, ft.t_total)


def pad_vgeo_for_shards(vgeo, g: int):
    """Pad the global (30, T) vgeoT column count to a multiple of g so
    P(None, 'geo') shards whole columns. Pad columns are zeros — no
    winner vid ever points at them (idmap only holds real columns).
    Host numpy input stays numpy (see pad_fused_for_shards)."""
    t = vgeo.shape[1]
    pad = (-t) % g
    if pad == 0:
        return vgeo
    xp = np if isinstance(vgeo, np.ndarray) else jnp
    return xp.concatenate(
        [vgeo, xp.zeros((vgeo.shape[0], pad), np.float32)], axis=1
    )


def _strip_mesh_heavy(m):
    """Zero-size every per-triangle array of a MeshData so the
    replicated scene carries no O(T) payload — the fused trace reads
    only the sharded chunk tables and (shade_sharded) the sharded
    vgeoT; shading reads hit.geo and the (kept) map tables."""
    z = lambda *s: jnp.zeros(s, jnp.float32)  # noqa: E731
    zi = lambda *s: jnp.zeros(s, jnp.int32)  # noqa: E731
    return dataclasses.replace(
        m, v=z(0, 3, 3), n=z(0, 3, 3), uv=z(0, 3, 2), tangent=z(0, 3),
        bitangent=z(0, 3), vgeoT=z(30, 0), reach_lo=z(0, 3),
        reach_hi=z(0, 3), node_min=z(0, 3), node_max=z(0, 3),
        skip=zi(0), leaf_start=zi(0), leaf_count=zi(0),
        real_flag=zi(0), leaf_tris=zi(0), morton_perm=None,
        itables=None, itables_anyhit=None,
    )


def _table_args(ft: FusedTables):
    return {"tri": ft.geo.tri, "cbox": ft.geo.cbox, "sbox": ft.geo.sbox,
            "idmap": ft.idmap}


_TABLE_SPECS = {
    "tri": P("geo", None, None),
    "cbox": P("geo", None),
    "sbox": P("geo", None),
    "idmap": P(None, "geo"),
}


def render_scene_geo_sharded(scene, mesh: Mesh,
                             ray_block: int = DEFAULT_RAY_BLOCK,
                             shade_sharded: bool = False):
    """Primary-pass render with rays sharded over 'rays' and the fused
    geometry tables sharded over 'geo'. Returns (frame3 (3, H, W),
    stats) matching render_scene's primary pass u8-exactly (pinned by
    tests/test_geoshard.py). The scene must be built with
    settings.geo_shard_axis == 'geo' and enable_ssaa False.

    shade_sharded=True additionally shards the (30, T) shading table
    column-wise over 'geo' and strips every replicated per-triangle
    array from the scene, so NOTHING O(T) is replicated — the full
    beyond-HBM mode. Output is identical (u8-exact, pinned)."""
    from rendering_tpu.render.pipeline import derive_mesh_tables

    st = scene.static
    settings = st.settings
    assert settings.geo_shard_axis == "geo", (
        "build the scene with RenderSettings(geo_shard_axis='geo')"
    )
    assert not settings.enable_ssaa and not settings.show_ac
    assert not settings.show_normals, (
        "show_normals is not implemented on the geo-sharded path "
        "(it would silently render the shaded frame instead)"
    )
    assert scene.fused_itables is not None, "geo sharding needs meshes"
    # The fused branch only activates on the Pallas backend; without it
    # the per-mesh fallback would iterate the (possibly stripped)
    # meshes and silently render geometry-free frames.
    from rendering_tpu.render.integrator import _pallas_backend

    use_pallas, _interp = _pallas_backend(settings)
    assert use_pallas, (
        "geo sharding requires the Pallas oracle (TPU backend, or "
        "settings.pallas_interpret=True on CPU)"
    )
    w, h = settings.width, settings.height
    g = dict(zip(mesh.axis_names, mesh.devices.shape))["geo"]
    ndev_r = dict(zip(mesh.axis_names, mesh.devices.shape))["rays"]

    ft = pad_fused_for_shards(scene.fused_itables, g)
    fts = scene.fused_shadow_itables
    shadow_aliases = fts is scene.fused_itables
    fts_p = (
        ft if shadow_aliases
        else (pad_fused_for_shards(fts, g) if fts is not None else None)
    )
    scene0 = dataclasses.replace(
        scene, fused_itables=None, fused_shadow_itables=None
    )
    vgeo_p = None
    if shade_sharded:
        vt = [m.vgeoT for m in scene.meshes]
        cat = (np.concatenate
               if all(isinstance(v, np.ndarray) for v in vt)
               else jnp.concatenate)
        vgeo_p = pad_vgeo_for_shards(cat(vt, axis=1), g)
        scene0 = dataclasses.replace(
            scene0, meshes=tuple(_strip_mesh_heavy(m)
                                 for m in scene0.meshes)
        )

    r = w * h
    rp, perm = _round_robin_layout(r, ndev_r)
    xs = (perm % w).astype(jnp.float32)
    ys = jnp.minimum(perm // w, h - 1).astype(jnp.float32)

    tables = _table_args(ft)
    specs = dict(_TABLE_SPECS)
    if fts_p is not None and not shadow_aliases:
        tables = dict(tables, **{
            "s_" + k: v for k, v in _table_args(fts_p).items()
        })
        specs = dict(specs, **{
            "s_" + k: v for k, v in _TABLE_SPECS.items()
        })
    if vgeo_p is not None:
        tables["vgeo"] = vgeo_p
        specs["vgeo"] = P(None, "geo")

    ft_static = (ft.geo.tri_chunk, ft.geo.n_sub, ft.n_meshes,
                 ft.any_clipped, ft.t_total)
    fts_static = None
    if fts_p is not None and not shadow_aliases:
        fts_static = (fts_p.geo.tri_chunk, fts_p.geo.n_sub,
                      fts_p.n_meshes, fts_p.any_clipped, fts_p.t_total)
    has_shadow = fts_p is not None

    def local(scene0, tables, xs_l, ys_l):
        tc, ns, nm, clip, tt = ft_static
        ft_l = FusedTables(
            IntersectTables(tc, ns, None, tables["tri"], tables["cbox"],
                            tables["sbox"]),
            tables["idmap"], nm, clip, tt,
        )
        if not has_shadow:
            fts_l = None
        elif shadow_aliases:
            fts_l = ft_l
        else:
            stc, sns, snm, sclip, stt = fts_static
            fts_l = FusedTables(
                IntersectTables(stc, sns, None, tables["s_tri"],
                                tables["s_cbox"], tables["s_sbox"]),
                tables["s_idmap"], snm, sclip, stt,
            )
        s = dataclasses.replace(
            scene0, fused_itables=ft_l, fused_shadow_itables=fts_l,
            vgeoT_sharded=tables.get("vgeo"),
        )
        s = derive_mesh_tables(s)
        rd = pixel_dirs(s, xs_l, ys_l, 1.0, 1.0)
        ro = jnp.broadcast_to(s.cam_pos, rd.shape)
        nloc = xs_l.shape[0]
        accum3, stats = integrate(
            s, ro, rd, jnp.arange(nloc, dtype=jnp.int32),
            jnp.ones((nloc,), jnp.float32), n_pixels=nloc,
            ray_block=ray_block, out_slots=not st.any_bouncing,
        )
        # All stats leaves are 'geo'-unvarying by here (the fused
        # combines psum the per-shard counters over 'geo' already);
        # one psum over the ray shards finishes the totals.
        stats = {k: jax.lax.psum(v, "rays") for k, v in stats.items()}
        return accum3, stats

    # check_vma=False: the interpret-mode Pallas lowering (the CPU test
    # path) trips an internal lowering-cache KeyError under a 2-axis
    # manual mesh with vma tracking on (jax 0.9); this wrapper is
    # forward-only, every cross-shard combine is explicit (pmin/psum in
    # the integrator's fused branches), and the equality test pins the
    # result, so the static vma check buys nothing here.
    accum3, stats = _shard_map(
        local, mesh=mesh,
        in_specs=(P(), specs, P("rays"), P("rays")),
        out_specs=(P(None, "rays"), P()),
        check_vma=False,
    )(scene0, tables, xs, ys)

    from rendering_tpu.parallel.shard import assemble_frame

    return assemble_frame(accum3, perm, rp, r, w, h), stats
