"""Sobel edge mask for adaptive SSAA (Scene::launchSSAA,
src/scene.cpp:547-569), as a dense stencil over the framebuffer.

The reference convolves the RGB framebuffer with the 3x3 Sobel operator
in both orientations, takes val = sqrt(|gx|^2 + |gy|^2) where |.| is the
RGB vector length, and marks pixels with val > 0.5. Border pixels
(row/col 0 and H-1/W-1) are never written by the reference (its loop
runs over the interior only; the buffer is heap garbage there) — we
define them as False, the common zero-initialized-page outcome.
"""

from __future__ import annotations

import jax.numpy as jnp

_SOBEL = jnp.asarray(
    [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], dtype=jnp.float32
)


def sobel_mask(frame: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """frame: (H, W, 3) -> bool (H, W); borders False."""
    h, w = frame.shape[:2]
    gx = jnp.zeros((h - 2, w - 2, 3), frame.dtype)
    gy = jnp.zeros((h - 2, w - 2, 3), frame.dtype)
    # x += fb[i-1+a, j-1+b] * S[a][b]; y += fb[...] * S[b][a]
    # (scene.cpp:558-562). Unrolled 3x3 stencil — XLA fuses this into a
    # single vectorized pass, no conv needed for a fixed 3x3.
    for a in range(3):
        for b in range(3):
            patch = frame[a : h - 2 + a, b : w - 2 + b]
            gx = gx + patch * _SOBEL[a, b]
            gy = gy + patch * _SOBEL[b, a]
    val = jnp.sqrt(jnp.sum(gx * gx, axis=-1) + jnp.sum(gy * gy, axis=-1))
    mask = val > threshold
    return jnp.pad(mask, 1, constant_values=False)
