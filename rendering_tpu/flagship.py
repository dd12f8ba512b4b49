"""Flagship benchmark scene builders.

The north-star workload (BASELINE.md) is shotgun.scene: a 3840x1080
phong mesh with diffuse/normal/specular maps, point+distant lights,
ac_penalty=3. The repo's reference assets live at /root/reference when
mounted; otherwise a deterministic procedural mesh of comparable (or
much larger) triangle count stands in, so the benchmark and the graft
entry points are self-contained.
"""

from __future__ import annotations

import os

import numpy as np

from rendering_tpu.models.objloader import MeshArrays, load_obj
from rendering_tpu.models.parser import LightDef, ObjectDef, SceneDef
from rendering_tpu.models.scene import SceneData, build_scene
from rendering_tpu.models.settings import RenderSettings

REFERENCE_DIR = os.environ.get("REFERENCE_DIR", "/root/reference")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def procedural_mesh(n_tris: int, pos, size, seed: int = 0) -> MeshArrays:
    """Deterministic bumpy-sphere triangle soup with UVs and smooth
    normals, already in world space (mirrors a loaded+transformed OBJ).
    """
    rows = max(2, int(np.sqrt(n_tris / 2)))
    cols = max(2, n_tris // (2 * rows) + 1)
    th = np.linspace(0.12, np.pi - 0.12, rows + 1)
    ph = np.linspace(0, 2 * np.pi, cols + 1)
    T, P = np.meshgrid(th, ph, indexing="ij")
    bump = 1.0 + 0.08 * np.sin(5 * T + seed) * np.cos(7 * P)
    x = bump * np.sin(T) * np.cos(P)
    y = bump * np.cos(T)
    z = bump * np.sin(T) * np.sin(P)
    verts = np.stack([x, y, z], -1).astype(np.float32)  # (rows+1, cols+1, 3)
    uv = np.stack([P / (2 * np.pi), T / np.pi], -1).astype(np.float32)

    def quad(i, j):
        return (
            verts[i, j], verts[i + 1, j], verts[i + 1, j + 1], verts[i, j + 1],
            uv[i, j], uv[i + 1, j], uv[i + 1, j + 1], uv[i, j + 1],
        )

    tris_v, tris_uv = [], []
    for i in range(rows):
        for j in range(cols):
            a, b, c, d, ta, tb, tc, td = quad(i, j)
            tris_v.append([a, b, c])
            tris_uv.append([ta, tb, tc])
            tris_v.append([a, c, d])
            tris_uv.append([ta, tc, td])
            if len(tris_v) >= n_tris:
                break
        if len(tris_v) >= n_tris:
            break
    v = np.asarray(tris_v, np.float32)
    tuv = np.asarray(tris_uv, np.float32)

    size = np.asarray(size, np.float32)
    pos = np.asarray(pos, np.float32)
    v = v * (size / 2.0) + pos
    # smooth normals = sphere direction at each vertex (unit-ish)
    n = (v - pos) / (size / 2.0)

    # Root bounds must CONTAIN the bumps (|bump| <= 1.08): pos +- size/2
    # clipped the poking triangles and flipped clipped_by_root=True,
    # silently benchmarking a hole-ridden mesh on the root-filter
    # kernel configuration the real (unclipped) shotgun asset never
    # uses. 1.0801 covers the f32 rounding of the 1.08 extreme.
    bound = np.float32(1.0801) * size / 2.0

    edge1 = v[:, 1] - v[:, 0]
    edge2 = v[:, 2] - v[:, 0]
    duv1 = tuv[:, 1] - tuv[:, 0]
    duv2 = tuv[:, 2] - tuv[:, 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        f = 1.0 / (duv1[:, 0] * duv2[:, 1] - duv2[:, 0] * duv1[:, 1])
        tangent = np.nan_to_num(
            f[:, None] * (duv2[:, 1:2] * edge1 - duv1[:, 1:2] * edge2)
        ).astype(np.float32)
        bitangent = np.nan_to_num(
            f[:, None] * (-duv2[:, 0:1] * edge1 + duv1[:, 0:1] * edge2)
        ).astype(np.float32)
    bounds = np.stack([pos - bound, pos + bound]).astype(np.float32)
    return MeshArrays(
        v=v, n=n.astype(np.float32), uv=tuv, tangent=tangent,
        bitangent=bitangent, root_bounds=bounds,
    )


def _subdiv_bary(level: int) -> np.ndarray:
    """Barycentric corner weights of the 4**level equal subtriangles of
    a triangle (midpoint lattice): (4**level, 3 corners, 3 weights over
    the parent's A/B/C)."""
    n = 1 << level
    tris = []
    for i in range(n):
        for j in range(n - i):
            # up-triangle (i, j), (i+1, j), (i, j+1)
            tris.append(((i, j), (i + 1, j), (i, j + 1)))
            if i + j < n - 1:
                # down-triangle (i+1, j), (i+1, j+1), (i, j+1)
                tris.append(((i + 1, j), (i + 1, j + 1), (i, j + 1)))
    out = np.zeros((len(tris), 3, 3), np.float64)
    for t, corners in enumerate(tris):
        for c, (i, j) in enumerate(corners):
            a = 1.0 - (i + j) / n
            out[t, c] = (a, i / n, j / n)
    assert out.shape[0] == 4**level
    return out


def _displace_noise(p: np.ndarray) -> np.ndarray:
    """Deterministic smooth pseudo-noise in [-1, 1] of world position
    (..., 3) — a position function, so triangle-soup vertices that
    share a position displace identically (no cracks on smooth
    surfaces)."""
    acc = np.zeros(p.shape[:-1], np.float64)
    wsum = 0.0
    for f, w in ((9.0, 1.0), (23.0, 0.5), (57.0, 0.25)):
        acc += w * (
            np.sin(f * p[..., 0] + 1.7)
            * np.sin(f * p[..., 1] + 2.3)
            * np.sin(f * p[..., 2] + 3.1)
        )
        wsum += w
    return acc / wsum


def densify_mesh(mesh: MeshArrays, target_tris: int,
                 displace_frac: float = 0.004) -> MeshArrays:
    """Subdivide + displace a real mesh to ~target_tris triangles
    (VERDICT r3 #2: the 250k headline must run on real geometry, not a
    best-case-coherence procedural sphere).

    Midpoint 4-way subdivision preserves the surface EXACTLY (thin
    features, self-occlusion and silhouettes are the loaded asset's);
    per-triangle levels are area-prioritized so big flat faces carry
    the extra resolution and slivers are not over-split. Vertices then
    displace along their interpolated smooth normals by a smooth
    position-noise of amplitude displace_frac * bbox diagonal — real
    high-frequency relief so chunk AABBs cannot collapse onto an
    idealized smooth surface. Root bounds expand to contain the
    displaced mesh (clipped_by_root stays False, like the procedural
    flagship)."""
    t0 = int(mesh.v.shape[0])
    if t0 == 0 or target_tris <= t0:
        return mesh
    v = np.asarray(mesh.v, np.float64)
    n = np.asarray(mesh.n, np.float64)
    uv = np.asarray(mesh.uv, np.float64)

    # Base level for everyone, plus one extra level for the
    # largest-area triangles until the total reaches target.
    base = 0
    while t0 * 4 ** (base + 1) <= target_tris:
        base += 1
    area2 = np.linalg.norm(
        np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=1
    )
    promote_n = min(
        t0, (target_tris - t0 * 4**base) // max(4 ** (base + 1) - 4**base, 1)
    )
    order = np.argsort(-area2, kind="stable")
    levels = np.full((t0,), base, np.int32)
    levels[order[:promote_n]] = base + 1

    outs_v, outs_n, outs_uv, outs_t, outs_b = [], [], [], [], []
    for lv in np.unique(levels):
        sel = levels == lv
        bary = _subdiv_bary(int(lv))  # (S, 3, 3)
        # (T, S, 3c, 3d) = bary (S, 3c, 3w) x v[sel] (T, 3w, 3d)
        sub_v = np.einsum("scw,twd->tscd", bary, v[sel])
        sub_n = np.einsum("scw,twd->tscd", bary, n[sel])
        sub_uv = np.einsum("scw,twd->tscd", bary, uv[sel])
        s = bary.shape[0]
        outs_v.append(sub_v.reshape(-1, 3, 3))
        outs_n.append(sub_n.reshape(-1, 3, 3))
        outs_uv.append(sub_uv.reshape(-1, 3, 2))
        outs_t.append(np.repeat(np.asarray(mesh.tangent)[sel], s, axis=0))
        outs_b.append(np.repeat(np.asarray(mesh.bitangent)[sel], s, axis=0))
    v_out = np.concatenate(outs_v)
    n_out = np.concatenate(outs_n)
    uv_out = np.concatenate(outs_uv)

    # Displace along interpolated smooth normals (normalized; degenerate
    # normals displace nowhere).
    lo = v.reshape(-1, 3).min(axis=0)
    hi = v.reshape(-1, 3).max(axis=0)
    amp = displace_frac * float(np.linalg.norm(hi - lo))
    nl = np.linalg.norm(n_out, axis=-1, keepdims=True)
    n_hat = n_out / np.maximum(nl, 1e-20)
    v_out = v_out + n_hat * (amp * _displace_noise(v_out))[..., None]

    v_out = v_out.astype(np.float32)
    dlo = v_out.reshape(-1, 3).min(axis=0) - np.float32(1e-3)
    dhi = v_out.reshape(-1, 3).max(axis=0) + np.float32(1e-3)
    return MeshArrays(
        v=v_out,
        n=n_out.astype(np.float32),
        uv=uv_out.astype(np.float32),
        tangent=np.concatenate(outs_t).astype(np.float32),
        bitangent=np.concatenate(outs_b).astype(np.float32),
        root_bounds=np.stack([dlo, dhi]),
    )


def _maps(prefix: str):
    """Load committed synthesized maps (tests/assets/maps) through the
    parser's shared texel decoders (one implementation — the inline
    copy here once drifted to a 1-ulp-off normalize)."""
    from rendering_tpu.models.parser import (
        decode_normal_map,
        decode_specular_map,
    )
    from rendering_tpu.utils.bmp import load_bmp_float

    base = os.path.join(REPO, "tests", "assets", "maps")
    out = {}
    for kind in ("diffuse", "normal", "specular"):
        path = os.path.join(base, f"{prefix}_{kind}.bmp")
        if not os.path.exists(path):
            return {}
        data = load_bmp_float(path)
        h, w = data.shape[:2]
        flat = data.reshape(h * w, 3)
        if kind == "normal":
            flat = decode_normal_map(flat)
        elif kind == "specular":
            flat = decode_specular_map(flat)
        out[kind] = (flat, (w, h))
    return out


def build_flagship_scene(
    width: int = 3840,
    height: int = 1080,
    n_tris: int | None = None,
    enable_ssaa: bool = False,
    with_maps: bool = True,
    real_geometry: bool = False,
) -> SceneData:
    """shotgun.scene workload (input/shotgun.scene): phong mesh +
    point/distant lights, ac_penalty=3. Falls back to a procedural mesh
    when the reference assets are unavailable or n_tris is forced.

    real_geometry=True with n_tris set subdivides+displaces the REAL
    shotgun.obj to ~n_tris triangles (densify_mesh) instead of the
    procedural sphere — real thin features, self-occlusion and
    silhouettes at the benchmark count (requires the reference assets;
    falls back to the procedural mesh otherwise)."""
    st = RenderSettings(
        width=width, height=height, ac_penalty=3,
        background_color=(0.52, 0.8, 0.92), enable_ssaa=enable_ssaa,
        enable_output=False, output_progress=False,
        image_name="shotgun_bench",
    )
    sd = SceneDef(settings=st)
    sd.lights = [
        LightDef("point", color=(1, 1, 1), intensity=1.0, pos=(0, 0, 0)),
        LightDef("distant", color=(1, 1, 1), intensity=0.2, dir=(0.3, 0, -1)),
    ]
    obj = ObjectDef(
        "mesh", pos=(-0.1, 0, -0.6), size=(2, 2, 2), color=(1, 1, 1),
        rot=(0, 100, 0), material="phong", ambient=0.4, diffuse=0.1,
        specular=0.7, n_specular=10.0,
    )
    shotgun_obj = os.path.join(REFERENCE_DIR, "input", "objects", "shotgun.obj")
    if n_tris is None and os.path.exists(shotgun_obj):
        obj.mesh = load_obj(
            shotgun_obj, obj.size, obj.rot, obj.pos, bias=st.bias
        )
    elif real_geometry and n_tris and os.path.exists(shotgun_obj):
        obj.mesh = densify_mesh(
            load_obj(shotgun_obj, obj.size, obj.rot, obj.pos, bias=st.bias),
            n_tris,
        )
    else:
        obj.mesh = procedural_mesh(
            n_tris or 250_000, pos=(-0.1, 0, -0.6), size=(2, 2, 2)
        )
    if with_maps:
        maps = _maps("shotgun")
        if maps:
            obj.diffuse_map, obj.diffuse_map_wh = maps["diffuse"]
            obj.normal_map, obj.normal_map_wh = maps["normal"]
            obj.specular_map, obj.specular_map_wh = maps["specular"]
    sd.objects = [obj]
    return build_scene(sd)


def build_tiny_scene(width: int = 64, height: int = 32,
                     n_tris: int = 128) -> SceneData:
    """Tiny multi-material scene for dry runs: mesh + spheres + plane,
    all four materials, point+distant+area lights."""
    st = RenderSettings(
        width=width, height=height, max_ray_depth=4, enable_ssaa=False,
        enable_output=False, output_progress=False,
        background_color=(0.2, 0.25, 0.3),
    )
    sd = SceneDef(settings=st)
    sd.lights = [
        LightDef("point", color=(1, 0.9, 0.8), intensity=0.7, pos=(0, 2, -1)),
        LightDef("distant", color=(1, 1, 1), intensity=0.3, dir=(0.2, -1, -0.4)),
        LightDef("area", color=(1, 1, 1), intensity=40.0, pos=(0, 3, -3),
                 i=(1.5, 0, 0), j=(0, 0, 1.5), samples=2),
    ]
    mesh_obj = ObjectDef(
        "mesh", pos=(0.8, 0.1, -3), size=(1.4, 1.4, 1.4), color=(1, 1, 1),
        material="phong", ambient=0.4, diffuse=0.1, specular=0.7,
        n_specular=10.0,
    )
    mesh_obj.mesh = procedural_mesh(n_tris, pos=(0.8, 0.1, -3), size=(1.4, 1.4, 1.4))
    sd.objects = [
        ObjectDef("plane", pos=(0, -1.5, 0), normal=(0, 1, 0),
                  color=(0.85, 0.85, 0.85)),
        mesh_obj,
        ObjectDef("sphere", pos=(-1.0, 0, -2.5), radius=0.6, color=(1, 1, 1),
                  material="transparent", ior=1.4),
        ObjectDef("sphere", pos=(-0.2, 0.8, -4), radius=0.8, color=(1, 1, 1),
                  material="reflective"),
        ObjectDef("sphere", pos=(1.8, -0.6, -2.2), radius=0.4,
                  color=(0.9, 0.3, 0.2)),
    ]
    return build_scene(sd)


def build_multimesh_scene(
    width: int = 1920,
    height: int = 1080,
    n_meshes: int = 16,
    tris_per_mesh: int | None = None,
    max_ray_depth: int = 10,
) -> SceneData:
    """N-mesh stress scene (VERDICT r3 #1: the per-mesh dispatch loop
    must not scale with mesh count): a grid of bunny instances
    (input/objects/bunny.obj when the reference assets are mounted,
    procedural bumpy spheres otherwise / when tris_per_mesh is forced)
    over a floor plane, point+distant lights, phong shading. Mesh
    positions tile a sqrt(N)-ish grid in front of the camera so every
    instance is visible and shadow rays cross instances."""
    st = RenderSettings(
        width=width, height=height, ac_penalty=3,
        background_color=(0.52, 0.8, 0.92), enable_ssaa=False,
        enable_output=False, output_progress=False,
        max_ray_depth=max_ray_depth, image_name="multimesh_bench",
    )
    sd = SceneDef(settings=st)
    sd.lights = [
        LightDef("point", color=(1, 1, 1), intensity=1.0, pos=(0, 2, 0)),
        LightDef("distant", color=(1, 1, 1), intensity=0.25,
                 dir=(0.3, -0.4, -1)),
    ]
    bunny_obj = os.path.join(REFERENCE_DIR, "input", "objects", "bunny.obj")
    use_bunny = tris_per_mesh is None and os.path.exists(bunny_obj)

    cols = max(1, int(np.ceil(np.sqrt(n_meshes))))
    rows = -(-n_meshes // cols)
    objects = [
        ObjectDef("plane", pos=(0, -1.2, 0), normal=(0, 1, 0),
                  color=(0.85, 0.85, 0.85)),
    ]
    size = 1.1
    for k in range(n_meshes):
        r, c = divmod(k, cols)
        pos = (
            (c - (cols - 1) / 2.0) * 1.4,
            (r - (rows - 1) / 2.0) * 1.3,
            -3.0 - 0.45 * ((r + c) % 3),
        )
        obj = ObjectDef(
            "mesh", pos=pos, size=(size, size, size),
            color=(0.4 + 0.6 * ((k * 7) % 5) / 4.0,
                   0.4 + 0.6 * ((k * 3) % 5) / 4.0,
                   0.4 + 0.6 * ((k * 11) % 5) / 4.0),
            rot=(0.0, float((k * 37) % 360), 0.0),
            material="phong", ambient=0.3, diffuse=0.4, specular=0.3,
            n_specular=12.0,
        )
        if use_bunny:
            obj.mesh = load_obj(bunny_obj, obj.size, obj.rot, obj.pos,
                                bias=st.bias)
        else:
            obj.mesh = procedural_mesh(
                tris_per_mesh or 5000, pos=pos,
                size=(size, size, size), seed=k,
            )
        objects.append(obj)
    sd.objects = objects
    return build_scene(sd)
