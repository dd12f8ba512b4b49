"""Geometry (by-primitive) sharding — parallel.geoshard
(SURVEY section 5.8 stretch goal).

On the virtual 8-device mesh reshaped (rays=4, geo=2) / (rays=2,
geo=4), the fused chunk tables are physically sharded along the
super-chunk axis and the cross-shard closest-hit / occlusion combines
must reproduce the replicated-geometry render u8-exactly.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
import pytest

from rendering_tpu.flagship import build_multimesh_scene
from rendering_tpu.models.settings import RenderSettings
from rendering_tpu.parallel.geoshard import (
    make_geo_mesh,
    pad_fused_for_shards,
    render_scene_geo_sharded,
)
from rendering_tpu.render.pipeline import render_scene
from rendering_tpu.utils.bmp import quantize_reference


def _scenes(n_meshes, tris_per_mesh):
    """(replicated-geometry scene, geo-shard scene) for the same world.

    Both use the interpreter-mode kernel (the fused path is Pallas
    code); only geo_shard_axis differs — it is static, so the sharded
    scene's bounce loop traces the cross-shard combines."""
    base = build_multimesh_scene(
        64, 48, n_meshes=n_meshes, tris_per_mesh=tris_per_mesh
    )

    def with_settings(scene, **kw):
        st = scene.static
        return dataclasses.replace(
            scene,
            static=dataclasses.replace(
                st, settings=st.settings.replace(**kw)
            ),
        )

    ref = with_settings(base, pallas_interpret=True)
    # geo_shard_axis changes TABLE BAKING for 1-mesh scenes (fused
    # tables required), so rebuild from scratch via the builder's
    # settings seam is needed there; for >= 2 meshes the tables exist
    # and settings surgery is enough.
    sharded = with_settings(
        base, pallas_interpret=True, geo_shard_axis="geo"
    )
    assert sharded.fused_itables is not None
    return ref, sharded


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
def test_geo_sharded_matches_replicated(shape):
    """Geometry-sharded == replicated-geometry RAY-SHARDED render,
    u8-exact (render_scene_sharded shares the pixel_dirs ray
    generation; render_scene's tiled primary raygen differs by 1 ulp,
    which flips only knife-edge rays — the documented strip-path
    divergence, not a geometry-sharding effect)."""
    n_rays, n_geo = shape
    mesh = make_geo_mesh(jax.devices()[: n_rays * n_geo], n_geo=n_geo)
    _, sharded = _scenes(n_meshes=3, tris_per_mesh=90)

    # Reference: the SAME wrapper at n_geo=1 — one geometry shard IS
    # the replicated path (identical raygen / integrate / combine
    # code), so any difference isolates the actual table sharding +
    # cross-shard reduction.
    ref_mesh = make_geo_mesh(jax.devices()[:8], n_geo=1)
    f0, _ = render_scene_geo_sharded(sharded, ref_mesh)
    f1, stats = render_scene_geo_sharded(sharded, mesh)
    a = quantize_reference(np.asarray(f0).transpose(1, 2, 0))
    b = quantize_reference(np.asarray(f1).transpose(1, 2, 0))
    np.testing.assert_array_equal(a, b)
    assert float(stats["rays_casted"]) > 0

    # Sanity anchor: the unsharded tiled render agrees except (at
    # most) isolated knife-edge pixels (its primary raygen differs by
    # 1 ulp from pixel_dirs — the documented strip-path divergence).
    f2, _ = render_scene(_scenes(n_meshes=3, tris_per_mesh=90)[0])
    c = quantize_reference(np.asarray(f2).transpose(1, 2, 0))
    frac = (np.abs(b.astype(np.int16) - c.astype(np.int16)) > 0).mean()
    assert frac < 0.03, frac


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
def test_shade_sharded_matches(shape):
    """FULL geometry sharding (shade_sharded=True): the (30, T) vgeoT
    shading table is column-sharded over 'geo' and every replicated
    per-triangle array is stripped to zero size; the masked
    local-gather + psum winner-row combine must reproduce the
    table-sharded render u8-exactly — isolating exactly the
    shading-side shard."""
    n_rays, n_geo = shape
    mesh = make_geo_mesh(jax.devices()[: n_rays * n_geo], n_geo=n_geo)
    _, sharded = _scenes(n_meshes=3, tris_per_mesh=90)

    f0, _ = render_scene_geo_sharded(sharded, mesh)
    f1, stats = render_scene_geo_sharded(sharded, mesh,
                                         shade_sharded=True)
    a = quantize_reference(np.asarray(f0).transpose(1, 2, 0))
    b = quantize_reference(np.asarray(f1).transpose(1, 2, 0))
    np.testing.assert_array_equal(a, b)
    assert float(stats["rays_casted"]) > 0


def test_pad_vgeo_for_shards():
    import jax.numpy as jnp

    from rendering_tpu.parallel.geoshard import pad_vgeo_for_shards

    v = jnp.arange(30 * 7, dtype=jnp.float32).reshape(30, 7)
    for g in (2, 3, 4, 7):
        p = pad_vgeo_for_shards(v, g)
        assert p.shape[1] % g == 0 and p.shape[1] >= 7
        np.testing.assert_array_equal(np.asarray(p[:, :7]), np.asarray(v))
        assert not np.asarray(p[:, 7:]).any()


def test_pad_fused_for_shards():
    _, sharded = _scenes(n_meshes=2, tris_per_mesh=70)
    ft = sharded.fused_itables
    cs = ft.geo.sbox.shape[0]
    for g in (3, 4, 5):
        p = pad_fused_for_shards(ft, g)
        assert p.geo.sbox.shape[0] % g == 0
        assert p.geo.sbox.shape[0] >= cs
        # padded supers: inverted boxes -> never live
        if p.geo.sbox.shape[0] > cs:
            lo = np.asarray(p.geo.sbox[cs:, 0:3])
            hi = np.asarray(p.geo.sbox[cs:, 3:6])
            assert (lo > hi).all()
