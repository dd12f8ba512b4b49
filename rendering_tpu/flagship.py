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
) -> SceneData:
    """shotgun.scene workload (input/shotgun.scene): phong mesh +
    point/distant lights, ac_penalty=3. Falls back to a procedural mesh
    when the reference assets are unavailable or n_tris is forced."""
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
