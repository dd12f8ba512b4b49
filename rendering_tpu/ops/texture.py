"""Nearest-neighbor map sampling (Mesh::{getDiffuseColor,
getSpecularValue,getSurfaceData} map paths, src/objects.cpp:121-175).

Maps live as flat (H*W, C) arrays in the reference's loadBMP layout
(bottom-up rows, see utils/bmp.py), so the index expression
`(int)(H*ty) * W + (int)(W*tx)` (with high-side clamping only) is
reproduced verbatim. All gathers are differentiable w.r.t. the map
texels (piecewise-constant w.r.t. the UVs, as in the reference).
"""

from __future__ import annotations

import jax.numpy as jnp


def _map_index(tx, ty, w: int, h: int):
    wi = (w * tx).astype(jnp.int32)
    hi = (h * ty).astype(jnp.int32)
    wi = jnp.minimum(wi, w - 1)  # high-side clamp only (objects.cpp:146-148)
    hi = jnp.minimum(hi, h - 1)
    return hi * w + wi


def sample_map(flat_map, wh, tex):
    """flat_map: (H*W, C) or (H*W,); wh: (W, H) static; tex: (R, 2)."""
    w, h = int(wh[0]), int(wh[1])
    idx = _map_index(tex[:, 0], tex[:, 1], w, h)
    return flat_map[idx]


def sample_packed(mapsT, wh, tex):
    """Gather all rows of a packed transposed map table at once.
    mapsT: (rows, H*W); wh: (W, H) static; tex: (R, 2).
    Returns (rows, R) — one gather serves every map sharing these
    texel indices (a TPU gather costs per-index, not per-row)."""
    w, h = int(wh[0]), int(wh[1])
    idx = _map_index(tex[:, 0], tex[:, 1], w, h)
    return mapsT[:, idx]


def sample_map_r(flat_map, wh, tex2):
    """sample_map on rows: tex2 (2, R) -> (C, R) (or (1, R) for a
    single-channel map). Same texel indices/values; the gather runs
    against the channel-first view so its output lands rays-minor."""
    w, h = int(wh[0]), int(wh[1])
    idx = _map_index(tex2[0], tex2[1], w, h)
    if flat_map.ndim == 1:
        return flat_map[idx][None]
    return flat_map.T[:, idx]


def sample_packed_r(mapsT, wh, tex2):
    """sample_packed with row texcoords: tex2 (2, R) -> (rows, R)."""
    w, h = int(wh[0]), int(wh[1])
    idx = _map_index(tex2[0], tex2[1], w, h)
    return mapsT[:, idx]
