"""Fused Pallas TPU kernel for ray-mesh intersection (any mesh size).

Same math as ops/bruteforce_mxu.py (the MXU bilinear-form
Moller-Trumbore: reference semantics of src/objects.cpp:59-95 with the
root-box reach filter replicating src/objects.cpp:534-570 + :737-760),
restructured TPU-first:

  triangles -> Morton-ordered chunks of `tri_chunk` (precomputed
               coefficient/AABB tables: build_intersect_tables — the
               baked acceleration structure, rebuilt on geometry
               updates like the reference rebuilds its BVH)
  grid = (ray_tiles, chunks)     # Mosaic double-buffers chunk tables
  per step: slab-test the chunk AABB against the tile's rays (and the
            per-ray running t / done state); if no ray can accept a
            hit, skip the compute; else (4*Tc, 13) x (13, BR-rays) on
            the MXU + accept/min epilogue on the VPU, updating the
            running (t, tri) held in the tile's revisited output block.

Two modes:
  * closest-hit (primary/bounce rays): running minimum + triangle id.
  * any-hit (shadow rays, mode="any"): a ray that finds ANY accepted
    hit below its limit marks itself done (t <- -1), which the chunk
    cull treats as "skip" — surface-origin shadow rays typically
    resolve on their first live (local) chunk and prune the rest of
    the mesh. Matches trace_occlusion's boolean semantics exactly.

A fully manual-DMA variant (chunk tables fetched only when live) cut
table traffic further but hits an opaque TPU runtime abort on this
platform for many-live-chunk workloads (see git history); the
grid-pipelined form streams every chunk table but double-buffers the
traffic behind compute and is robust at every size tested (1.5k-250k
triangles).

Layout is rays-on-lanes / triangles-on-sublanes: per-ray scalars are
rows of an (8, R) aux array (sublane broadcast is free), per-chunk
tables are Mosaic-blocked, the closest-hit reduction is a
sublane-dimension min, and outputs are compact (1, R) vectors.

This is a discrete hit ORACLE (t / triangle id / occlusion bit): the
integrator runs it under stop_gradient and re-evaluates accepted hits
differentiably, so no custom VJP is needed.

Tie-breaking: strict `t < t_best` across chunks and lowest in-chunk
row on equal t — i.e. Morton order, which differs from the jnp
oracle's load order ONLY when two distinct triangles hit at the exact
same f32 t (degenerate overlaps; same caveat as the reference's
leaf-DFS order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rendering_tpu.ops.geometry import FLT_MAX

DEFAULT_RAY_TILE = 1024
_FMAX = 3.4028234663852886e38  # FLT_MAX literal (kernels can't capture arrays)


def _ray_features_t(roT: jnp.ndarray, rdT: jnp.ndarray) -> jnp.ndarray:
    """(3, R) x2 -> (13, R) feature rows (transposed ray_features)."""
    one = jnp.ones_like(roT[0:1])
    return jnp.concatenate(
        [
            one, roT[0:1], roT[1:2], roT[2:3], rdT[0:1], rdT[1:2], rdT[2:3],
            rdT[1:2] * roT[0:1], rdT[2:3] * roT[0:1], rdT[2:3] * roT[1:2],
            rdT[0:1] * roT[1:2], rdT[0:1] * roT[2:3], rdT[1:2] * roT[2:3],
        ],
        axis=0,
    )


def _kernel(
    # scalar prefetch (SMEM)
    torder_ref,  # (n_tiles, C) i32 — PER-TILE chunk visit order: the
                 # tile's geometrically-live chunks first (near-to-far
                 # from the ray origins' centroid), then the last live
                 # id repeated. Dead steps therefore keep the same
                 # block index, so Mosaic skips their table DMA, and
                 # the count guard below skips their compute — a dead
                 # (tile, chunk) step costs only grid bookkeeping
                 # (the naive grid spent ~1us/step on these, which
                 # dominated large meshes: 81% of a 250k-tri call).
    counts_ref,  # (n_tiles, 1) i32 — live chunks per tile
    cbox_ref,    # (C, 8) — per-chunk AABB rows [lo xyz, hi xyz, 0, 0]
    # VMEM blocks (coef/lo/hi are indexed through torder_ref)
    feats_ref,   # (13, BR) VMEM
    coef_ref,    # (4*Tc, 13) VMEM — rows [det | tdet | udet | vdet]
    lo_ref,      # (Tc, 3) VMEM — per-tri reach box (root-clipped)
    hi_ref,      # (Tc, 3) VMEM
    aux_ref,     # (8, BR) VMEM — rows [ro xyz, 1/rd xyz, t0, unused]
    t_ref,       # (1, BR) VMEM out — running best t (-1 = done, any-hit)
    tri_ref,     # (1, BR) VMEM out — running best triangle id
    *,
    tc: int,
    backface_culling: bool,
    use_root_filter: bool,
    anyhit: bool,
    precision,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    chunk = torder_ref[i, j]
    base = chunk * tc

    @pl.when(j == 0)
    def _init():
        t_ref[...] = aux_ref[6:7, :]
        tri_ref[...] = jnp.full(tri_ref.shape, -1, jnp.int32)

    @pl.when(j < counts_ref[i, 0])
    def _step():
        _cull_and_intersect(
            feats_ref, coef_ref, lo_ref, hi_ref, aux_ref, cbox_ref,
            t_ref, tri_ref, chunk, base, tc=tc,
            backface_culling=backface_culling,
            use_root_filter=use_root_filter, anyhit=anyhit,
            precision=precision,
        )


def _cull_and_intersect(
    feats_ref, coef_ref, lo_ref, hi_ref, aux_ref, cbox_ref, t_ref,
    tri_ref, chunk, base, *, tc, backface_culling, use_root_filter,
    anyhit, precision,
):
    # Chunk-level cull: a triangle in this chunk can only be accepted if
    # the ray crosses the chunk's AABB at some t in [0, t_best) and the
    # ray is not already resolved (any-hit done marker t_best < 0).
    # Skipping the whole grid step when no ray in the tile qualifies is
    # the SPMD analogue of a 2-level BVH — the per-ray accept tests
    # below are unchanged, so results are identical. Comparisons are
    # negated so a NaN slab value (rd_c == 0 with origin on the box
    # plane) keeps the chunk live (conservative), never skips it.
    t_run = t_ref[...]
    ctmin = jnp.full(t_run.shape, -_FMAX, jnp.float32)
    ctmax = jnp.full(t_run.shape, _FMAX, jnp.float32)
    for c in range(3):
        ro_c = aux_ref[c : c + 1, :]
        inv_c = aux_ref[3 + c : 4 + c, :]
        t1 = (cbox_ref[chunk, c] - ro_c) * inv_c
        t2 = (cbox_ref[chunk, 3 + c] - ro_c) * inv_c
        ctmin = jnp.maximum(ctmin, jnp.minimum(t1, t2))
        ctmax = jnp.minimum(ctmax, jnp.maximum(t1, t2))
    live = ~((ctmin > ctmax) | (ctmax < 0) | (ctmin >= t_run) | (t_run < 0))

    @pl.when(jnp.any(live))
    def _compute():
        _intersect_chunk(
            feats_ref, coef_ref, lo_ref, hi_ref, aux_ref, t_ref, tri_ref,
            base, tc=tc, backface_culling=backface_culling,
            use_root_filter=use_root_filter, anyhit=anyhit,
            precision=precision,
        )


def _intersect_chunk(
    feats_ref, coef_ref, lo_ref, hi_ref, aux_ref, t_ref, tri_ref, base,
    *, tc, backface_culling, use_root_filter, anyhit, precision,
):
    out = jax.lax.dot_general(
        coef_ref[...], feats_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (4*Tc, BR)
    det = out[0 * tc : 1 * tc, :]
    tdet = out[1 * tc : 2 * tc, :]
    udet = out[2 * tc : 3 * tc, :]
    vdet = out[3 * tc : 4 * tc, :]

    # Same accept chain (and f32 evaluation order) as bruteforce_mxu:
    # zero-coefficient padded triangles fail the epsilon test in both
    # culling modes, so no explicit lane-validity mask is needed.
    if backface_culling:
        ok = det >= 1e-8
    else:
        ok = jnp.abs(det) >= 1e-8
    inv = 1.0 / jnp.where(ok, det, 1.0)
    u = udet * inv
    v = vdet * inv
    t = tdet * inv
    ok = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= 0)

    if use_root_filter:
        # Reference slab semantics ((lo-ro)*inv, no t>=0 clamp;
        # src/objects.cpp:534-570) against the root-clipped per-tri box.
        shape = (tc, feats_ref.shape[1])
        tmin = jnp.full(shape, -_FMAX, jnp.float32)
        tmax = jnp.full(shape, _FMAX, jnp.float32)
        for c in range(3):
            lo_c = jnp.broadcast_to(lo_ref[:, c : c + 1], shape)
            hi_c = jnp.broadcast_to(hi_ref[:, c : c + 1], shape)
            ro_c = jnp.broadcast_to(aux_ref[c : c + 1, :], shape)
            inv_c = jnp.broadcast_to(aux_ref[3 + c : 4 + c, :], shape)
            t1 = (lo_c - ro_c) * inv_c
            t2 = (hi_c - ro_c) * inv_c
            tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
            tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
        ok = ok & (tmin <= tmax)

    t_prev = t_ref[...]                      # (1, BR)
    ok = ok & (t < jnp.broadcast_to(t_prev, t.shape))

    if anyhit:
        # Occlusion query: any accepted hit below the limit resolves the
        # ray; done rays (t = -1) never re-accept (t < -1 is false).
        hit_any = jnp.any(ok, axis=0, keepdims=True)        # (1, BR)
        t_ref[...] = jnp.where(hit_any, -1.0, t_prev)
        tri_ref[...] = jnp.where(hit_any, 0, tri_ref[...])
        return

    tm = jnp.where(ok, t, _FMAX)
    t_min = jnp.min(tm, axis=0, keepdims=True)          # (1, BR)
    better = t_min < t_prev                 # strict: earlier chunk wins ties
    rows = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
    row = jnp.min(
        jnp.where(tm == jnp.broadcast_to(t_min, tm.shape), rows,
                  jnp.int32(2**30)),
        axis=0,
        keepdims=True,
    )
    t_ref[...] = jnp.where(better, t_min, t_prev)
    tri_ref[...] = jnp.where(better, base + row, tri_ref[...])


class IntersectTables:
    """Precomputed, Morton-ordered chunk tables for the Pallas kernel —
    the TPU analogue of the reference's built acceleration structure
    (src/objects.cpp:461-530): geometry is baked into kernel-layout
    coefficient/AABB tables once per scene build. Rebuild after any
    geometry update, exactly as the reference rebuilds its BVH per run;
    within a render the tables are the oracle's geometry snapshot (hit
    topology is stop_gradient'd anyway, and accepted hits are
    re-evaluated from live vertices)."""

    def __init__(self, tri_chunk, use_root_filter, perm, coef, lo, hi,
                 cbox):
        self.tri_chunk = tri_chunk
        self.use_root_filter = use_root_filter
        self.perm = perm      # (T,) i32 or None
        self.coef = coef      # (C, 4*Tc, 13)
        self.lo = lo          # (C, Tc, 3)
        self.hi = hi          # (C, Tc, 3)
        self.cbox = cbox      # (C, 8)

    def tree_flatten(self):
        return (
            (self.perm, self.coef, self.lo, self.hi, self.cbox),
            (self.tri_chunk, self.use_root_filter),
        )

    @classmethod
    def tree_unflatten(cls, static, dyn):
        return cls(static[0], static[1], *dyn)


jax.tree_util.register_pytree_node(
    IntersectTables,
    lambda t: t.tree_flatten(),
    IntersectTables.tree_unflatten,
)


def build_intersect_tables(
    mesh, *, tri_chunk: int = 256, use_root_filter: bool = True
):
    """Build the kernel-format chunk tables for a mesh. Call once per
    scene build (eagerly, device-side) — keeping this out of the traced
    render removes minutes of trace time and hundreds of MB of in-graph
    temporaries for 250k-triangle meshes."""
    from rendering_tpu.ops.bruteforce_mxu import mt_coefficients

    T = int(mesh.v.shape[0])
    if T == 0:
        return None
    n_chunks = -(-T // tri_chunk)
    t_pad = n_chunks * tri_chunk - T

    perm = getattr(mesh, "morton_perm", None)
    v = mesh.v if perm is None else mesh.v[perm]
    reach_lo = mesh.reach_lo if perm is None else mesh.reach_lo[perm]
    reach_hi = mesh.reach_hi if perm is None else mesh.reach_hi[perm]
    coef = mt_coefficients(v)  # (13, T, 4)
    coef = jnp.pad(coef, ((0, 0), (0, t_pad), (0, 0)))
    # (C, 4*Tc, 13): rows grouped per quantity within a chunk.
    coef = (
        coef.reshape(13, n_chunks, tri_chunk, 4)
        .transpose(1, 3, 2, 0)
        .reshape(n_chunks, 4 * tri_chunk, 13)
    )
    lo = jnp.pad(reach_lo, ((0, t_pad), (0, 0))).reshape(
        n_chunks, tri_chunk, 3
    )
    hi = jnp.pad(reach_hi, ((0, t_pad), (0, 0))).reshape(
        n_chunks, tri_chunk, 3
    )

    # Chunk AABBs for the in-kernel cull. With the root filter on, a hit
    # additionally requires crossing the (clipped) reach box, so the
    # union of reach boxes bounds all acceptable hits; without it, raw
    # vertex bounds. Padding is min/max-neutral; inverted (empty)
    # clipped boxes never extend a union.
    if use_root_filter:
        ub_lo, ub_hi = reach_lo, reach_hi
    else:
        ub_lo = jnp.min(v, axis=1)
        ub_hi = jnp.max(v, axis=1)
    ub_lo = jnp.pad(ub_lo, ((0, t_pad), (0, 0)), constant_values=_FMAX)
    ub_hi = jnp.pad(ub_hi, ((0, t_pad), (0, 0)), constant_values=-_FMAX)
    cbox = jnp.concatenate(
        [
            jnp.min(ub_lo.reshape(n_chunks, tri_chunk, 3), axis=1),
            jnp.max(ub_hi.reshape(n_chunks, tri_chunk, 3), axis=1),
            jnp.zeros((n_chunks, 2), jnp.float32),
        ],
        axis=1,
    )  # (C, 8)
    return IntersectTables(tri_chunk, use_root_filter, perm, coef, lo, hi,
                           cbox)


def bruteforce_mesh_pallas(
    mesh,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    t_limit: jnp.ndarray | None = None,
    *,
    backface_culling: bool = True,
    tri_chunk: int = 256,
    use_root_filter: bool = True,
    ray_tile: int | None = None,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGHEST,
    tables: "IntersectTables | None" = None,
    mode: str = "closest",
):
    """Closest hit (mode="closest") or occlusion query (mode="any") over
    all mesh triangles, fused on-chip. Interface matches
    ops.bruteforce.bruteforce_mesh; in any-hit mode the returned tri is
    0 where the ray is occluded within t_limit and -1 otherwise (t is
    FLT_MAX). Pass prebuilt `tables` (build_intersect_tables) to skip
    in-graph table construction; they must match tri_chunk and
    use_root_filter."""
    T = int(mesh.v.shape[0])
    R = ro.shape[0]
    anyhit = mode == "any"
    if T == 0:
        z = jnp.zeros((), jnp.int32)
        return (
            jnp.full((R,), FLT_MAX, jnp.float32),
            jnp.full((R,), -1, jnp.int32),
            z, z,
        )

    if tables is None:
        tables = build_intersect_tables(
            mesh, tri_chunk=tri_chunk, use_root_filter=use_root_filter
        )
    else:
        assert tables.tri_chunk == tri_chunk
        assert tables.use_root_filter == use_root_filter
    tb = tables
    n_chunks = -(-T // tri_chunk)
    perm = tb.perm

    if ray_tile is None:
        # The per-tile visit-order table costs n_tiles * C * 4 bytes of
        # the 1MB SMEM budget (shared by all kernel instances of the
        # program); many-chunk meshes therefore take wider ray tiles.
        ray_tile = 2048 if n_chunks > 256 else DEFAULT_RAY_TILE
    n_tiles = -(-R // ray_tile)
    r_pad = n_tiles * ray_tile - R
    rp = n_tiles * ray_tile
    t0 = jnp.full((R,), FLT_MAX, jnp.float32)
    if t_limit is not None:
        t0 = jnp.minimum(t0, t_limit)
    ro_p, rd_p = ro, rd
    if r_pad:
        ro_p = jnp.pad(ro, ((0, r_pad), (0, 0)))
        rd_p = jnp.pad(rd, ((0, r_pad), (0, 0)), constant_values=1.0)
        t0 = jnp.pad(t0, (0, r_pad))
    roT = ro_p.T
    rdT = rd_p.T
    feats = _ray_features_t(roT, rdT)  # (13, Rp)
    aux = jnp.concatenate(
        [roT, 1.0 / rdT, t0[None, :], jnp.zeros_like(t0)[None, :]],
        axis=0,
    )  # (8, Rp)

    # Per-tile compacted chunk visit order. A pre-pass in plain XLA
    # slab-tests every chunk box against every ray (same negated-NaN
    # conservatism as the in-kernel cull, reduced with any() per tile);
    # each tile then visits its geometrically-live chunks first, in
    # near-to-far order from the ray origins' centroid, with the dead
    # tail repeating the last live id (same block index -> Mosaic skips
    # the table DMA; the in-kernel count guard skips the compute). The
    # in-kernel vector cull still runs on live steps for progressive
    # t_best / any-hit pruning. Pure visit reordering — results are
    # identical up to equal-t ties.
    origin_c = jnp.mean(jax.lax.stop_gradient(ro), axis=0)
    chunk_c = (tb.cbox[:, 0:3] + tb.cbox[:, 3:6]) * 0.5
    dist2 = jnp.sum((chunk_c - origin_c[None, :]) ** 2, axis=1)
    order = jnp.argsort(dist2).astype(jnp.int32)  # (C,) near-to-far

    ro_tiles = jax.lax.stop_gradient(ro_p).reshape(n_tiles, ray_tile, 3)
    inv_tiles = jax.lax.stop_gradient(1.0 / rd_p).reshape(
        n_tiles, ray_tile, 3
    )
    t0_tiles = jax.lax.stop_gradient(t0).reshape(n_tiles, ray_tile)
    cbox_o = tb.cbox[order]  # (C, 8) in near-to-far order

    def _tile_live(args):
        ro_b, inv_b, t0_b = args  # (BR,3), (BR,3), (BR,)
        t1 = (cbox_o[None, :, 0:3] - ro_b[:, None, :]) * inv_b[:, None, :]
        t2 = (cbox_o[None, :, 3:6] - ro_b[:, None, :]) * inv_b[:, None, :]
        ctmin = jnp.max(jnp.minimum(t1, t2), axis=-1)  # (BR, C)
        ctmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
        live = ~(
            (ctmin > ctmax) | (ctmax < 0) | (ctmin >= t0_b[:, None])
        )
        return jnp.any(live, axis=0)  # (C,) in near-to-far slots

    live = jax.lax.map(_tile_live, (ro_tiles, inv_tiles, t0_tiles))
    slots = jnp.arange(n_chunks, dtype=jnp.int32)
    key = jnp.where(live, slots[None, :], n_chunks + slots[None, :])
    perm_t = jnp.argsort(key, axis=1)              # live-first, stable
    torder = order[perm_t]                         # (tiles, C) chunk ids
    counts = jnp.sum(live, axis=1).astype(jnp.int32)
    last_live = jnp.take_along_axis(
        torder, jnp.maximum(counts - 1, 0)[:, None], axis=1
    )
    torder = jnp.where(
        slots[None, :] < counts[:, None], torder, last_live
    ).astype(jnp.int32)
    counts2 = counts[:, None]

    kernel = functools.partial(
        _kernel,
        tc=tri_chunk,
        backface_culling=backface_culling,
        use_root_filter=use_root_filter,
        anyhit=anyhit,
        precision=precision,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((13, ray_tile), lambda i, j, to, ct, cb: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 4 * tri_chunk, 13),
                         lambda i, j, to, ct, cb: (to[i, j], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tri_chunk, 3),
                         lambda i, j, to, ct, cb: (to[i, j], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tri_chunk, 3),
                         lambda i, j, to, ct, cb: (to[i, j], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ray_tile), lambda i, j, to, ct, cb: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ray_tile), lambda i, j, to, ct, cb: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i, j, to, ct, cb: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    t_out, tri_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, rp), jnp.float32),
            jax.ShapeDtypeStruct((1, rp), jnp.int32),
        ],
        interpret=interpret,
    )(torder, counts2, tb.cbox, feats, tb.coef, tb.lo, tb.hi, aux)

    t_best = t_out[0, :R]
    tri_best = tri_out[0, :R]
    tri_tests = jnp.asarray(R, jnp.int32) * jnp.asarray(T, jnp.int32)
    if anyhit:
        return (
            jnp.full((R,), FLT_MAX, jnp.float32),
            tri_best,
            jnp.zeros((), jnp.int32),
            tri_tests,
        )
    if perm is None:
        tri_remap = tri_best
    else:
        tri_remap = perm[jnp.maximum(tri_best, 0)].astype(jnp.int32)
    tri_best = jnp.where(tri_best >= 0, tri_remap, -1)
    found = tri_best >= 0
    t_best = jnp.where(found, t_best, FLT_MAX)
    return t_best, tri_best, jnp.zeros((), jnp.int32), tri_tests
