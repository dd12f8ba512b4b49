"""Small vector helpers over SoA (..., 3) jnp arrays.

Replaces the reference's Vec3f/Matrix44f classes (include/geometry.h):
on TPU a "Vec3" is just the last axis of a batched array and a "Ray" is
the pair (orig, dir) of (N, 3) arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

FLT_MAX = jnp.float32(3.4028234663852886e38)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length2(a):
    return jnp.sum(a * a, axis=-1)


def length(a):
    return jnp.sqrt(length2(a))


def normalize(a):
    """Vec3::normalize semantics (geometry.h:104-112): zero vectors are
    left unchanged (guard len2 > 0), no epsilon."""
    len2 = length2(a)[..., None]
    safe = jnp.where(len2 > 0, len2, 1.0)
    return jnp.where(len2 > 0, a * (1.0 / jnp.sqrt(safe)), a)


def clamp(low, high, val):
    return jnp.maximum(low, jnp.minimum(high, val))


def pvary_like(tree, *refs):
    """Align a pytree's shard_map varying-axis types (vma) with the
    union of the reference arrays' vma. No-op outside shard_map. Needed
    for lax.scan/while_loop carries whose init values are unvarying
    constants (jnp.zeros etc.) while the loop body mixes in per-shard
    data."""
    import jax

    vma = set()
    for r in refs:
        try:
            vma |= set(jax.typeof(r).vma)
        except AttributeError:  # pragma: no cover
            pass
    if not vma:
        return tree

    def pv(x):
        have = set(getattr(jax.typeof(x), "vma", ()))
        missing = tuple(a for a in vma if a not in have)
        return jax.lax.pvary(x, missing) if missing else x

    import jax.tree_util as jtu

    return jtu.tree_map(pv, tree)
