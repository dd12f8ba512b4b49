"""Fused Pallas TPU kernel for ray-mesh intersection (any mesh size).

Round-2 redesign (VPU-direct + live-chunk grid). The round-1 kernel
(git history) evaluated Moller-Trumbore as an MXU bilinear form
((4*Tc, 13) x (13, BR) matmul); profiling on the v5e showed that
K=13 is padded to the MXU's native 128 contraction depth and HIGHEST
precision costs 6 bf16 passes, so the matmul ran at ~32 ps per
(ray, triangle) pair while a direct VPU evaluation of the exact same
f32 arithmetic as ops.intersect.ray_triangle (the reference formula,
src/objects.cpp:59-95) costs ~20 ps/pair — and, more importantly, the
(ray_tiles x all_chunks) grid spent ~1.4 us of Mosaic sequencing per
DEAD grid step, which dominated large meshes (a 250k-triangle mesh is
~977 chunks but a coherent ray tile reaches only ~11 of them).

Structure (TPU-first):

  triangles -> Morton-ordered chunks of `tri_chunk` with per-chunk
               vertex/edge/reach-box tables (build_intersect_tables —
               the baked acceleration structure, rebuilt on geometry
               updates like the reference rebuilds its BVH,
               src/objects.cpp:461-530).
  pre-pass  -> per-TILE exact any-ray slab test of every chunk AABB
               (_tile_live_exact), giving live chunk lists sorted
               near-to-far from the tile's origin centroid. This is
               the packet-descent step of a packet-BVH, done as one
               dense XLA pass over (n_tiles, BR, C).
  grid      -> ONE dimension over the compacted (tile, chunk) live
               pairs (plus one init step per empty tile), padded to a
               static bucket size chosen by the actual pair count
               (lax.cond). Dead steps repeat the previous pair so
               their block indices never change (no DMA) — every grid
               step costs ~1us of Mosaic sequencing even when idle, so
               the grid is sized by the work that EXISTS, not by
               tiles x chunks or tiles x worst-case-K. Overflow past
               the largest bucket falls back to all-pairs capacity
               (coarse-tiled when the fine tables would strain SMEM).
  per step  -> slab-test all n_sub cull-chunk AABBs of the super as
               ONE (n_sub, BR) VPU batch (separate (1, BR) passes
               waste 7/8 of each (8, 128) VPU granule), then re-check
               each cull chunk against the per-ray running t
               (progressive pruning as hits are found); if any ray in
               the tile still qualifies, evaluate Moller-Trumbore for
               the (Tc, BR) pair block on the VPU with bit-exact
               ray_triangle f32 arithmetic, then the accept/min
               epilogue updates the running (t, tri) output block.
               Cull boxes ride as a (n_sub, 8) VMEM block sharing the
               super's block index (SMEM scalar tables would pay ~48
               scalar reads per step).

Two modes:
  * closest-hit (primary/bounce rays): running minimum + triangle id.
  * any-hit (shadow rays, mode="any"): a ray that finds ANY accepted
    hit below its limit marks itself done (t <- -1), which the chunk
    cull treats as "skip" — surface-origin shadow rays typically
    resolve on their first live (local) chunk and prune the rest of
    the mesh. Matches trace_occlusion's boolean semantics exactly.

Stats are honest and device-side (reference counters,
include/stats.h:18-36): when collect_stats=True the kernel
accumulates the number of slab-tested rays (box_tests) and of
(live ray x triangle) Moller-Trumbore evaluations (tri_tests) in
SMEM. The scalar read-modify-writes serialize the per-step pipeline
(~2x step cost), so like the reference's collectStatistics gate the
counters compile in only on request; otherwise they return 0.

Layout is rays-on-lanes / triangles-on-sublanes: per-ray scalars are
rows of a (16, R) aux array (sublane broadcast is free), per-chunk
tables are (16, Tc) row blocks (v0/e1/e2/reach_lo/reach_hi), compute
is (Tc, BR), the closest-hit reduction is a sublane-dimension min, and
outputs are compact (1, R) vectors.

This is a discrete hit ORACLE (t / triangle id / occlusion bit): the
integrator runs it under stop_gradient and re-evaluates accepted hits
differentiably, so no custom VJP is needed.

Tie-breaking: strict `t < t_best` across chunks and lowest in-chunk
row on equal t — i.e. Morton/near-to-far order, which differs from
the jnp oracle's load order ONLY when two distinct triangles hit at
the exact same f32 t (degenerate overlaps; same caveat as the
reference's leaf-DFS order). Per-pair (t, accept) values are
bit-identical to ray_triangle: same mul/sub/div f32 sequence.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rendering_tpu.ops.geometry import FLT_MAX

DEFAULT_RAY_TILE = int(os.environ.get("RT_RAY_TILE", "512"))
# Any-hit (shadow) queries may use their own tile width: shadow rays
# typically resolve on their first live (local) chunk, so the
# cull-tightness vs per-pair-work tradeoff sits elsewhere than for
# closest-hit. Defaults to the closest-hit tile; env knob for on-chip
# A/B (ray_tile=1024 for shadows measured 2x worse culling in round 2;
# finer tiles are the untested direction).
ANYHIT_RAY_TILE = int(
    os.environ.get("RT_ANYHIT_RAY_TILE", "0")
) or None
_FMAX = 3.4028234663852886e38  # FLT_MAX literal (kernels can't capture arrays)

# Step-count buckets for the 1-D pair-compacted grid, as multiples of
# n_tiles (total live pairs + one init step per tile). The actual pair
# count picks the smallest fitting bucket via nested lax.cond;
# anything beyond the last bucket takes the dense all-pairs fallback
# at a wider ray tile (SMEM: its (n_tiles*C) tables must stay well
# under the 1MB budget). Every grid step costs ~1us of Mosaic
# sequencing even when dead, so the grid is sized by the work that
# EXISTS, not by tiles x worst-case-K. The ladder has intermediate
# rungs in the 4-16x range because that is where the flagship's real
# totals land (measured 250k/3840x1080: primary closest 7-10.6x,
# batched shadow any-hit 4.7-7.7x — a coarse (4, 16) ladder forced
# both into the 16x bucket, all padding; repeated-index dead steps
# cost ~0.3us each, so trimming the tail bought ~4% wall-clock).
# Each rung is a separate Mosaic compile per mode, so the ladder stays
# at 4 rungs (a 6-rung ladder doubled scene compile time for <1%).
_S_BUCKETS = (4, 8, 12, 16)
_FALLBACK_RAY_TILE = 4096
# SMEM budget (bytes-ish) for the dense all-pairs fallback's three
# (n_tiles * n_super,) i32 step tables at the FINE tiling; beyond it
# the fallback re-tiles coarsely. Module constant so tests can force
# the coarse path on small workloads.
_FINE_FB_LIMIT = 200_000
# Widest lane slice a single (Tc, lanes) compute may use — bounds the
# VPU temporaries (Mosaic's scoped-VMEM stack is 16MB).
_MAX_COMPUTE_LANES = 1024


def _kernel(
    # scalar prefetch (SMEM). All tables are FLAT 1-D: SMEM pads the
    # last dim of every prefetch operand to 128 elements, so 2-D
    # (rows, small) layouts waste 128/small x the budget.
    ptile_ref,   # (S,) i32 — ray-tile index of step s. Steps are
                 # grouped by tile; within a tile the SUPER-chunk visit
                 # order is live-first near-to-far (from the tile's ray
                 # origin centroid). The dead tail repeats the last
                 # pair (same block indices -> Mosaic skips the DMA;
                 # the live flag skips the compute).
    psuper_ref,  # (S,) i32 — super-chunk id of step s
    plive_ref,   # (S,) i32 — 1 if step s computes (0: init-only/tail)
    # VMEM blocks
    tri_ref,     # (16, n_sub*Tc) VMEM — one SUPER chunk: n_sub cull
                 # chunks side by side, rows [v0 xyz, e1 xyz, e2 xyz,
                 #                            reach_lo xyz, reach_hi xyz, 0]
    cboxs_ref,   # (n_sub, 8) VMEM — this super's cull-chunk AABBs,
                 # rows [lo xyz, hi xyz, 0, 0]; padded chunks hold
                 # inverted boxes (always culled)
    aux_ref,     # (16, BR) VMEM — rays of tile ptile[s]:
                 #                 rows [ro xyz, rd xyz, 1/rd xyz, t0]
    t_ref,       # (1, BR) VMEM out — running best t (-1 = done, any-hit)
    tri_out_ref,  # (1, BR) VMEM out — running best triangle id
    stats_ref=None,  # (1, 2) f32 SMEM out — [tri_tests, box_tests];
                     # f32 like the host-side counters: totals exceed
                     # int32 range within one large-mesh call (a work
                     # oracle, not an exact sum — same contract as
                     # integrator._zero_stats);
                     # present ONLY when collect_stats (one fewer
                     # per-step operand otherwise — each operand costs
                     # index-map/bookkeeping time every grid step)
    *,
    tc: int,
    n_sub: int,
    backface_culling: bool,
    use_root_filter: bool,
    anyhit: bool,
    collect_stats: bool,
):
    s = pl.program_id(0)
    sup = psuper_ref[s]

    if collect_stats:
        @pl.when(s == 0)
        def _init_stats():
            stats_ref[0, 0] = 0.0
            stats_ref[0, 1] = 0.0

    prev_tile = ptile_ref[jnp.maximum(s - 1, 0)]
    first = (s == 0) | (ptile_ref[s] != prev_tile)

    @pl.when(first)
    def _init():
        t_ref[...] = aux_ref[9:10, :]
        tri_out_ref[...] = jnp.full(tri_out_ref.shape, -1, jnp.int32)

    # A whole-tile any-hit early-out (skip the step when every ray is
    # resolved, jnp.any(t_ref >= 0)) measured FLAT on the 250k flagship
    # (5.52M vs 5.56M rays/s): unoccluded shadow rays keep t = dist and
    # never resolve, so a 512-wide tile practically never goes all-done
    # in open scenes. Not worth the per-step reduce.
    @pl.when(plive_ref[s] == 1)
    def _step():
        # Two-level descent inside one grid step: the grid/DMA unit is
        # the SUPER chunk (n_sub cull chunks, spatially contiguous in
        # Morton order), each cull chunk re-culled per ray before its
        # Moller-Trumbore — many sub-chunks per ~1us grid step
        # amortizes Mosaic's per-step sequencing, and the XLA pre-pass
        # only pays super-granularity work. The lane (ray) axis is
        # additionally sliced so (Tc, lanes) temporaries stay within
        # Mosaic's 16MB scoped-VMEM stack at the fallback's wide tiles.
        br = aux_ref.shape[1]
        lanes = min(br, _MAX_COMPUTE_LANES)
        for k in range(br // lanes):
            sl = slice(k * lanes, (k + 1) * lanes)
            _cull_and_intersect(
                tri_ref, cboxs_ref, aux_ref.at[:, sl], t_ref.at[:, sl],
                tri_out_ref.at[:, sl], stats_ref, sup,
                tc=tc, n_sub=n_sub, backface_culling=backface_culling,
                use_root_filter=use_root_filter, anyhit=anyhit,
                collect_stats=collect_stats,
            )


def _cull_and_intersect(
    tri_ref, cboxs_ref, aux_ref, t_ref, tri_out_ref, stats_ref, sup,
    *, tc, n_sub, backface_culling, use_root_filter, anyhit,
    collect_stats,
):
    # Chunk-level cull: a triangle in a cull chunk can only be accepted
    # if the ray crosses the chunk's AABB at some t in [0, t_best) and
    # the ray is not already resolved (any-hit done marker t_best < 0).
    # Skipping the compute when no ray in the tile qualifies is pure
    # work pruning — the per-ray accept tests below are unchanged, so
    # results are identical. Comparisons are negated so a NaN slab
    # value (rd_c == 0 with origin on the box plane) keeps the chunk
    # live (conservative), never skips it.
    #
    # The t-INDEPENDENT part of all n_sub slabs is evaluated as ONE
    # (n_sub, BR) batch: eight separate (1, BR) passes each wasted 7/8
    # of every (8, 128)-granule VPU op on empty sublanes. The
    # t-dependent conditions re-read t_ref per sub chunk, preserving
    # the progressive pruning (sub j+1 sees sub j's accepted hits /
    # any-hit done marks) of the sequential formulation.
    br = aux_ref.shape[1]
    ctmin = jnp.full((n_sub, br), -_FMAX, jnp.float32)
    ctmax = jnp.full((n_sub, br), _FMAX, jnp.float32)
    for c in range(3):
        ro_c = aux_ref[c : c + 1, :]
        inv_c = aux_ref[6 + c : 7 + c, :]
        t1 = (cboxs_ref[:, c : c + 1] - ro_c) * inv_c      # (n_sub, BR)
        t2 = (cboxs_ref[:, 3 + c : 4 + c] - ro_c) * inv_c
        ctmin = jnp.maximum(ctmin, jnp.minimum(t1, t2))
        ctmax = jnp.minimum(ctmax, jnp.maximum(t1, t2))
    # Padded cull chunks hold INVERTED boxes [+FMAX, -FMAX]; the
    # per-axis min/max swap above would turn them into an
    # everything-box (always live), so they need an explicit validity
    # test. lo.x > hi.x only holds for pads (real boxes have lo <= hi;
    # a NaN compares False, keeping the chunk conservatively live).
    invalid = cboxs_ref[:, 0:1] > cboxs_ref[:, 3:4]    # (n_sub, 1)
    live0 = ~((ctmin > ctmax) | (ctmax < 0) | invalid)
    # The counter read-modify-writes serialize the scalar pipeline
    # (~3 us/step measured), so they compile in only when the caller
    # collects statistics — exactly the reference's collectStatistics
    # gate (include/stats.h: counters are no-ops unless enabled).
    if collect_stats:
        stats_ref[0, 1] = stats_ref[0, 1] + jnp.float32(n_sub * br)

    for j in range(n_sub):
        t_run = t_ref[...]
        live = (
            live0[j : j + 1, :]
            & ~((ctmin[j : j + 1, :] >= t_run) | (t_run < 0))
        )

        @pl.when(jnp.any(live))
        def _compute(j=j, live=live):
            if collect_stats:
                stats_ref[0, 0] = stats_ref[0, 0] + jnp.float32(tc) * jnp.sum(
                    live.astype(jnp.float32)
                )
            _intersect_chunk(
                tri_ref, aux_ref, t_ref, tri_out_ref,
                (sup * n_sub + j) * tc, j * tc,
                tc=tc, backface_culling=backface_culling,
                use_root_filter=use_root_filter, anyhit=anyhit,
            )


def _intersect_chunk(
    tri_ref, aux_ref, t_ref, tri_out_ref, base, col0, *, tc,
    backface_culling, use_root_filter, anyhit,
):
    # Direct Moller-Trumbore on the VPU, (Tc, BR) pair block.
    # Bit-identical f32 sequence to ops.intersect.ray_triangle
    # (reference formula, src/objects.cpp:59-95): pvec = rd x e2,
    # det = e1.pvec, u = tvec.pvec/det, qvec = tvec x e1,
    # v = rd.qvec/det, t = e2.qvec/det. Per-tri values broadcast along
    # lanes as (Tc, 1) columns; per-ray values along sublanes as
    # (1, BR) rows. Zero-padded triangles fail the det epsilon in both
    # culling modes, so no lane-validity mask is needed.
    def tri_col(r):  # table row, this cull chunk's window -> (Tc, 1)
        return tri_ref[r : r + 1, col0 : col0 + tc].T

    def ray_row(r):  # aux row -> (1, BR)
        return aux_ref[r : r + 1, :]

    v0 = [tri_col(c) for c in range(3)]
    e1 = [tri_col(3 + c) for c in range(3)]
    e2 = [tri_col(6 + c) for c in range(3)]
    ro = [ray_row(c) for c in range(3)]
    rd = [ray_row(3 + c) for c in range(3)]

    p0 = rd[1] * e2[2] - rd[2] * e2[1]
    p1 = rd[2] * e2[0] - rd[0] * e2[2]
    p2 = rd[0] * e2[1] - rd[1] * e2[0]
    det = e1[0] * p0 + e1[1] * p1 + e1[2] * p2
    if backface_culling:
        ok = det >= 1e-8
    else:
        ok = jnp.abs(det) >= 1e-8
    inv = 1.0 / jnp.where(ok, det, 1.0)
    tv0 = ro[0] - v0[0]
    tv1 = ro[1] - v0[1]
    tv2 = ro[2] - v0[2]
    u = (tv0 * p0 + tv1 * p1 + tv2 * p2) * inv
    q0 = tv1 * e1[2] - tv2 * e1[1]
    q1 = tv2 * e1[0] - tv0 * e1[2]
    q2 = tv0 * e1[1] - tv1 * e1[0]
    v = (rd[0] * q0 + rd[1] * q1 + rd[2] * q2) * inv
    t = (e2[0] * q0 + e2[1] * q1 + e2[2] * q2) * inv
    ok = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= 0)

    if use_root_filter:
        # LITERAL transcription of the reference slab
        # (AccelerationStructure::intersectBox, src/objects.cpp:534-570,
        # sign-swap + pairwise running comparisons; no t>=0 clamp)
        # against the root-clipped per-tri box. The interval form
        # (max(mins) <= min(maxs)) is equivalent for real values but
        # NaN-REJECTS the IEEE corner (rd_c == 0 with the origin
        # exactly on a box plane -> 0 * inf = NaN) that the reference's
        # negated comparisons accept — ops.intersect.slab_test (the
        # BVH path) matches the reference, so this must too.
        def tpair(c):
            lo_c = tri_col(9 + c)
            hi_c = tri_col(12 + c)
            inv_c = ray_row(6 + c)
            neg = inv_c < 0
            lo = jnp.where(neg, hi_c, lo_c)
            hi = jnp.where(neg, lo_c, hi_c)
            return (lo - ro[c]) * inv_c, (hi - ro[c]) * inv_c

        tmin, tmax = tpair(0)
        tymin, tymax = tpair(1)
        box_hit = ~((tmin > tymax) | (tymin > tmax))
        tmin = jnp.where(tymin > tmin, tymin, tmin)
        tmax = jnp.where(tymax < tmax, tymax, tmax)
        tzmin, tzmax = tpair(2)
        box_hit = box_hit & ~((tmin > tzmax) | (tzmin > tmax))
        ok = ok & box_hit

    t_prev = t_ref[...]                      # (1, BR)
    ok = ok & (t < jnp.broadcast_to(t_prev, t.shape))

    if anyhit:
        # Occlusion query: any accepted hit below the limit resolves the
        # ray; done rays (t = -1) never re-accept (t < -1 is false).
        hit_any = jnp.any(ok, axis=0, keepdims=True)        # (1, BR)
        t_ref[...] = jnp.where(hit_any, -1.0, t_prev)
        tri_out_ref[...] = jnp.where(hit_any, 0, tri_out_ref[...])
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
    tri_out_ref[...] = jnp.where(better, base + row, tri_out_ref[...])


class IntersectTables:
    """Precomputed, Morton-ordered chunk tables for the Pallas kernel —
    the TPU analogue of the reference's built acceleration structure
    (src/objects.cpp:461-530): geometry is baked into kernel-layout
    vertex/edge/reach tables once per scene build. Rebuild after any
    geometry update, exactly as the reference rebuilds its BVH per run;
    within a render the tables are the oracle's geometry snapshot (hit
    topology is stop_gradient'd anyway, and accepted hits are
    re-evaluated from live vertices)."""

    def __init__(self, tri_chunk, n_sub, perm, tri, cbox, sbox):
        self.tri_chunk = tri_chunk   # cull-chunk triangles (Tc)
        self.n_sub = n_sub           # cull chunks per super (DMA) chunk
        self.perm = perm      # (T,) i32 or None
        self.tri = tri        # (Cs, 16, n_sub*Tc)
        self.cbox = cbox      # (Cs*n_sub, 8) cull-chunk AABBs
        self.sbox = sbox      # (Cs, 8) super-chunk AABBs (pre-pass)

    def tree_flatten(self):
        return (
            (self.perm, self.tri, self.cbox, self.sbox),
            (self.tri_chunk, self.n_sub),
        )

    @classmethod
    def tree_unflatten(cls, static, dyn):
        return cls(static[0], static[1], *dyn)


jax.tree_util.register_pytree_node(
    IntersectTables,
    lambda t: t.tree_flatten(),
    IntersectTables.tree_unflatten,
)


def default_tri_chunk(n_tris: int) -> int:
    """Cull-chunk-size policy: tight chunks (few triangles -> tight
    AABBs -> little wasted Moller-Trumbore work) while capping the
    chunk count C <= ~4096: the XLA pre-pass and the per-tile SMEM
    order tables scale with the SUPER count C / n_sub, and finer
    chunks stopped paying for themselves on the 250k flagship (cull
    boxes themselves ride in VMEM, so SMEM is no longer the binding
    constraint)."""
    tc = int(os.environ.get("RT_TRI_CHUNK", "64"))
    # Cap SUPER count (the grid/pre-pass/order-table unit) at ~512:
    # pre-cull work and pair tables scale with it, not with cull
    # chunks (cull boxes ride in VMEM and the sub-cull is batched).
    while -(-n_tris // (tc * DEFAULT_SUB_PER_SUPER)) > 512:
        tc *= 2
    return min(tc, 2048)


# Cull chunks per SUPER chunk — the grid/DMA/pre-pass unit. Each grid
# step costs ~1us of Mosaic sequencing regardless of work, and the XLA
# pre-pass pays per (tile, super): grouping n_sub Morton-contiguous
# cull chunks per step amortizes both while the in-kernel per-sub cull
# keeps the Moller-Trumbore work as tight as chunk-level culling.
# Measured on the 250k flagship (v5e): 64-tri cull chunks in supers of
# 8 beat the flat 128-tri single-level kernel by ~15% on both closest
# and any-hit; with the SEQUENTIAL per-sub slabs of the first design,
# supers of 16 lost it again, but the batched (n_sub, BR) cull made
# finer sub chunks nearly free. Env knobs RT_TRI_CHUNK / RT_N_SUB
# override for kernel-shape experiments (read once at import).
DEFAULT_SUB_PER_SUPER = int(os.environ.get("RT_N_SUB", "8"))


def build_intersect_tables(mesh, *, tri_chunk: int = 256,
                           n_sub: int | None = None,
                           as_numpy: bool = False):
    """Build the kernel-format chunk tables for a mesh. Call once per
    scene build. Pure NUMPY on the host: a jnp formulation compiled
    ~27 XLA programs per mesh, which costs minutes per scene over the
    remote-compile TPU tunnel; the host math is milliseconds. The
    tables are independent of every render flag (use_root_filter etc.
    only change the KERNEL's behavior), so one build serves any
    settings surgery applied after build_scene.

    n_sub overrides the cull-chunks-per-super fanout (the fused
    multi-mesh builder pins one value across all meshes so their super
    blocks share the kernel's static (16, n_sub*Tc) shape; a mesh with
    fewer chunks than n_sub pads its super with inverted-box cull
    chunks that are always culled)."""
    import numpy as np

    if isinstance(mesh.v, jax.core.Tracer):
        raise TypeError(
            "build_intersect_tables is host-side numpy; build tables at "
            "scene-build time (models.scene.build_scene bakes mesh.itables) "
            "instead of under jit"
        )
    T = int(mesh.v.shape[0])
    if T == 0:
        return None
    n_chunks = -(-T // tri_chunk)
    if n_sub is None:
        n_sub = min(DEFAULT_SUB_PER_SUPER, n_chunks)
    n_super = -(-n_chunks // n_sub)
    n_chunks = n_super * n_sub           # pad to whole supers
    t_pad = n_chunks * tri_chunk - T

    perm = getattr(mesh, "morton_perm", None)
    v = np.asarray(mesh.v)
    reach_lo = np.asarray(mesh.reach_lo)
    reach_hi = np.asarray(mesh.reach_hi)
    if perm is not None:
        p = np.asarray(perm)
        v, reach_lo, reach_hi = v[p], reach_lo[p], reach_hi[p]

    v0 = v[:, 0]
    e1 = v[:, 1] - v0
    e2 = v[:, 2] - v0
    # (T, 16) rows -> (C, 16, Tc). Zero padding: degenerate triangles
    # (det = 0) fail the epsilon test in both culling modes.
    rows = np.concatenate(
        [v0, e1, e2, reach_lo, reach_hi, np.zeros((T, 1), np.float32)],
        axis=1,
    ).astype(np.float32)  # (T, 16)
    rows = np.pad(rows, ((0, t_pad), (0, 0)))
    tri = np.ascontiguousarray(
        rows.reshape(n_super, n_sub * tri_chunk, 16).transpose(0, 2, 1)
    )

    # Chunk AABBs for the tile pre-cull and the in-kernel cull: union
    # of RAW vertex bounds. Any accepted Moller-Trumbore hit point lies
    # on its triangle, hence inside this union, so culling chunks whose
    # union the ray misses (within [0, t_best)) is sound — and it is
    # ~7x tighter than the reach-box union (root-clipped leaf reach)
    # used in round 1, which inflated live chunks/tile from ~11 to ~77
    # on the 250k flagship. Padding is min/max-neutral.
    ub_lo = np.pad(v.min(axis=1), ((0, t_pad), (0, 0)),
                   constant_values=_FMAX)
    ub_hi = np.pad(v.max(axis=1), ((0, t_pad), (0, 0)),
                   constant_values=-_FMAX)
    clo = ub_lo.reshape(n_chunks, tri_chunk, 3).min(axis=1)
    chi = ub_hi.reshape(n_chunks, tri_chunk, 3).max(axis=1)
    cbox = np.concatenate(
        [clo, chi, np.zeros((n_chunks, 2), np.float32)], axis=1
    ).astype(np.float32)  # (C, 8); padded chunks hold inverted boxes
    sbox = np.concatenate(
        [
            clo.reshape(n_super, n_sub, 3).min(axis=1),
            chi.reshape(n_super, n_sub, 3).max(axis=1),
            np.zeros((n_super, 2), np.float32),
        ],
        axis=1,
    ).astype(np.float32)  # (Cs, 8)
    # as_numpy keeps the tables HOST-side: the fused builder
    # re-concatenates them on the host anyway (a device round-trip per
    # mesh costs ~35 s per 9 MB over a remote TPU tunnel), and the
    # geo-sharded path feeds host arrays straight into shard_map so
    # each device receives only ITS shard — staging the full table on
    # one device first would defeat the beyond-HBM mode.
    wrap = (lambda a: a) if as_numpy else jnp.asarray
    return IntersectTables(
        tri_chunk, n_sub,
        None if perm is None else wrap(perm),
        wrap(tri), wrap(cbox), wrap(sbox),
    )


def _tile_live_exact(ro_t, inv_t, t0_t, cbox):
    """Per-tile chunk cull: EXACT per-ray slab test, any() over the
    tile's rays — the packet-descent step of a packet-BVH, done as one
    dense XLA pass. ro_t/inv_t: (n_tiles, 3, BR) ROW layout (rays on
    lanes — matches the integrator's (3, B) convention, so slicing a
    tile is free); t0_t: (n_tiles, BR); cbox: (C, 8). Returns live
    (n_tiles, C) bool. Comparisons are negated so a NaN slab value
    (rd_c == 0 with origin on the box plane) keeps the chunk live
    (conservative), never skips it. An interval-arithmetic variant
    (bounding the tile's origin/direction boxes) was tried first and
    measured ~25x too conservative on the 250k flagship (mean 283 live
    chunks/tile vs 11 exact) — the decoupled per-axis intervals admit
    ray combinations no real ray achieves; the exact test costs
    ~1-2 ms per 64k rays and keeps the kernel grid ~25x smaller."""
    def body(args):
        ro_b, inv_b, t0_b = args  # (3, BR), (3, BR), (BR,)
        # Per-axis python loop keeps every temporary (BR, C) — chunks
        # on lanes. A fused (BR, C, 3) formulation puts xyz on the
        # 128-lane axis (42x pad waste) and measured ~10x slower.
        shape = (ro_b.shape[1], cbox.shape[0])
        ctmin = jnp.full(shape, -_FMAX, jnp.float32)
        ctmax = jnp.full(shape, _FMAX, jnp.float32)
        for c in range(3):
            t1 = (cbox[None, :, c] - ro_b[c][:, None]) * inv_b[c][:, None]
            t2 = (cbox[None, :, 3 + c] - ro_b[c][:, None]) * inv_b[c][:, None]
            ctmin = jnp.maximum(ctmin, jnp.minimum(t1, t2))
            ctmax = jnp.minimum(ctmax, jnp.maximum(t1, t2))
        live = ~(
            (ctmin > ctmax) | (ctmax < 0) | (ctmin >= t0_b[:, None])
            # Resolved rays (t0 = -1: pre-done shadow lanes, padding,
            # dead-weight paths) contribute no liveness even when a
            # chunk straddles their origin (there ctmin < -1, so the
            # ctmin >= t0 clause alone would keep it live).
            | (t0_b[:, None] < 0)
            # Padded chunks hold INVERTED boxes [+FMAX, -FMAX]; the
            # per-axis min/max swap turns them into an everything-box,
            # so they need an explicit validity test (lo.x > hi.x only
            # holds for pads; NaN compares False -> conservative).
            | (cbox[None, :, 0] > cbox[None, :, 3])
        )
        return jnp.any(live, axis=0)  # (C,)

    return jax.lax.map(body, (ro_t, inv_t, t0_t))


def _tile_tables(ro_t, inv_t, t0_t, cbox):
    """Per-tile live-first near-to-far chunk visit order (row-layout
    ro_t/inv_t: (n_tiles, 3, BR)). Returns
    (torder (n_tiles, C) i32, counts (n_tiles,) i32, total scalar =
    sum(max(counts, 1)) — the compacted step count including one
    init step for each empty tile)."""
    live = _tile_live_exact(ro_t, inv_t, t0_t, cbox)
    # Near-to-far sort key from the centroid of the tile's LIVE ray
    # origins: padded/pre-done lanes carry t0 < 0 and zero origins — a
    # plain mean would drag a partial tile's centroid toward the world
    # origin and weaken its progressive t-pruning (pure perf; results
    # are identical up to degenerate exact-tie chunk order).
    lane = (t0_t >= 0).astype(jnp.float32)            # (n_tiles, BR)
    cnt = jnp.maximum(jnp.sum(lane, axis=1), 1.0)     # (n_tiles,)
    centroid = (
        jnp.sum(ro_t * lane[:, None, :], axis=2) / cnt[:, None]
    )  # (n_tiles, 3)
    ccenter = (cbox[None, :, 0:3] + cbox[None, :, 3:6]) * 0.5
    dist2 = jnp.sum((ccenter - centroid[:, None, :]) ** 2, axis=-1)
    # One sort does both: dead chunks key to +inf (stable -> id order),
    # live chunks order near-to-far.
    key = jnp.where(live, dist2, _FMAX)
    torder = jnp.argsort(key, axis=1).astype(jnp.int32)  # (n_tiles, C)
    counts = jnp.sum(live, axis=1).astype(jnp.int32)
    total = jnp.sum(jnp.maximum(counts, 1))
    return torder, counts, total


def _pair_tables(torder, counts, S: int):
    """Compact the per-tile live chunk lists into 1-D step tables of
    static size S: step s handles (ptile[s], pchunk[s]), steps grouped
    by tile, each tile occupying max(count, 1) consecutive steps (the
    >= 1 guarantees its output block is initialized even with nothing
    to intersect; such steps carry plive = 0). The tail past the last
    real pair repeats the final pair with plive = 0, so its block
    indices never change and Mosaic skips the DMA. Requires
    sum(max(counts, 1)) <= S (checked by the caller's bucket cond)."""
    n_tiles, C = torder.shape
    counts0 = jnp.maximum(counts, 1)
    ends = jnp.cumsum(counts0).astype(jnp.int32)       # (n_tiles,)
    starts = ends - counts0
    total = ends[-1]
    slot = jnp.arange(S, dtype=jnp.int32)
    # method="compare_all" lowers to one dense (S, n_tiles) compare +
    # row-sum; the default binary search becomes a vmap'd while loop
    # on TPU (~0.5ms per call, ~17ms per 250k frame — measured).
    tile = jnp.clip(
        jnp.searchsorted(
            ends, slot, side="right", method="compare_all"
        ).astype(jnp.int32),
        0, n_tiles - 1,
    )
    j = slot - starts[tile]
    # Clamp j so tail steps repeat the tile's LAST pair (constant block
    # index -> no refetch) instead of walking the dead order entries.
    j = jnp.clip(jnp.minimum(j, counts0[tile] - 1), 0, C - 1)
    chunk = torder[tile, j]
    live = (slot < total) & (j < counts[tile])
    return tile, chunk, live.astype(jnp.int32)


def _pallas_call(
    ptile, psuper, plive, cbox, tri, aux, rp, *, ray_tile, tc, n_sub,
    kernel_kw, interpret,
):
    S = ptile.shape[0]
    collect_stats = kernel_kw["collect_stats"]
    kernel = functools.partial(_kernel, tc=tc, n_sub=n_sub, **kernel_kw)
    out_specs = [
        pl.BlockSpec((1, ray_tile),
                     lambda s, pt, pc, pv: (0, pt[s]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ray_tile),
                     lambda s, pt, pc, pv: (0, pt[s]),
                     memory_space=pltpu.VMEM),
    ]
    # vma for mixed-varying operands (geometry sharding: tables vary
    # over 'geo' while rays vary over 'rays'): with check_vma shard_map
    # pallas_call cannot infer the output's varying axes, so declare
    # them as the union of the inputs'.
    vma = set()
    for a in (ptile, psuper, plive, cbox, tri, aux):
        vma |= set(getattr(jax.typeof(a), "vma", ()) or ())
    sds_kw = {"vma": frozenset(vma)} if vma else {}
    out_shape = [
        jax.ShapeDtypeStruct((1, rp), jnp.float32, **sds_kw),
        jax.ShapeDtypeStruct((1, rp), jnp.int32, **sds_kw),
    ]
    if collect_stats:
        out_specs.append(
            pl.BlockSpec((1, 2), lambda s, pt, pc, pv: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((1, 2), jnp.float32, **sds_kw)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((None, 16, n_sub * tc),
                         lambda s, pt, pc, pv: (pc[s], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n_sub, 8),
                         lambda s, pt, pc, pv: (pc[s], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, ray_tile),
                         lambda s, pt, pc, pv: (0, pt[s]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(ptile, psuper, plive, tri, cbox.reshape(-1, n_sub, 8), aux)
    if collect_stats:
        return out
    return out[0], out[1], jnp.zeros((1, 2), jnp.float32)


def _intersect_tables_impl(
    tb: "IntersectTables",
    ro: jnp.ndarray,   # (3, R) rows
    rd: jnp.ndarray,   # (3, R) rows
    t_limit: jnp.ndarray | None,
    *,
    backface_culling: bool,
    use_root_filter: bool,
    anyhit: bool,
    collect_stats: bool,
    ray_tile: int | None,
    interpret: bool,
):
    """Run the chunked intersection kernel over prebuilt tables.
    Mesh-agnostic core shared by the single-mesh wrapper
    (bruteforce_mesh_pallas) and the fused multi-mesh oracle
    (intersect_fused): the kernel only sees Morton-ordered chunk
    tables, so multi-mesh fusion is pure table concatenation. Returns
    (t_best (R,), raw_tri (R,), box_tests, tri_tests) where raw_tri is
    the PADDED CHUNK-SPACE triangle id ((super*n_sub + sub)*tc + row;
    -1 = miss / not occluded); callers own the id remap."""
    R = ro.shape[1]
    tri_chunk = tb.tri_chunk
    n_sub = tb.n_sub
    n_super = tb.sbox.shape[0]

    if ray_tile is None:
        ray_tile = (ANYHIT_RAY_TILE if anyhit else None) or DEFAULT_RAY_TILE
    # Power-of-two <= fallback tile: the kernel's lane-slice loop
    # (`range(br // _MAX_COMPUTE_LANES)`) and the coarse-fallback
    # retiling (`rp // ray_tile` with rp a multiple of 4096) both
    # require it — a 1536-ray tile would silently skip rays 1024-1535
    # of every tile. Guard the env knob / argument explicitly.
    if ray_tile < 8 or ray_tile > _FALLBACK_RAY_TILE or (
        ray_tile & (ray_tile - 1)
    ):
        raise ValueError(
            f"ray_tile must be a power of two in [8, {_FALLBACK_RAY_TILE}],"
            f" got {ray_tile}"
        )
    n_tiles = -(-R // ray_tile)
    rp = n_tiles * ray_tile
    # The dense fallback needs static capacity for EVERY (tile, super)
    # pair; if that table would strain SMEM at the fine tiling, the
    # fallback re-tiles coarsely (<= 16 wide tiles, lane-sliced in the
    # kernel), and the ray padding must accommodate both tilings.
    fine_fb_ok = n_tiles * n_super * 12 <= _FINE_FB_LIMIT
    if not fine_fb_ok:
        m = -(-rp // _FALLBACK_RAY_TILE)
        nt_fb = min(16, m)
        fb_tile = _FALLBACK_RAY_TILE * (-(-m // nt_fb))
        rp = nt_fb * fb_tile
        n_tiles = rp // ray_tile
    r_pad = rp - R

    t0 = jnp.full((R,), FLT_MAX, jnp.float32)
    if t_limit is not None:
        t0 = jnp.minimum(t0, t_limit)
    ro_p, rd_p = ro, rd
    if r_pad:
        ro_p = jnp.pad(ro, ((0, 0), (0, r_pad)))
        rd_p = jnp.pad(rd, ((0, 0), (0, r_pad)), constant_values=1.0)
        # Padded lanes are born resolved (t0 = -1, the done marker):
        # the pre-pass and the per-step culls treat them as dead, so
        # they add no live pairs and trigger no Moller-Trumbore work
        # (a 0 pad left origin-crossing chunks live for every padded
        # tile). Their outputs are sliced off below.
        t0 = jnp.pad(t0, (0, r_pad), constant_values=-1.0)
    invT = 1.0 / rd_p
    aux = jnp.concatenate(
        [ro_p, rd_p, invT, t0[None, :],
         jnp.zeros((6, rp), jnp.float32)],
        axis=0,
    )  # (16, Rp)

    sg = jax.lax.stop_gradient
    ro_t = sg(ro_p).reshape(3, n_tiles, ray_tile).swapaxes(0, 1)
    inv_t = sg(invT).reshape(3, n_tiles, ray_tile).swapaxes(0, 1)
    t0_t = sg(t0).reshape(n_tiles, ray_tile)
    torder, counts, total = _tile_tables(ro_t, inv_t, t0_t, tb.sbox)
    # Under shard_map the live-pair count is DEVICE-VARYING, and a
    # lax.cond on a varying predicate stops being a real branch — the
    # compiled program pays the all-pairs fallback every call
    # (measured 5.2x on the sharded flagship: 5.8 -> 1.1 M rays/s at
    # 1920x1080). Replicating the predicate with a pmax over the
    # varying axes (one scalar all-reduce) restores true branching;
    # every shard then takes the max-needed ladder rung, which is
    # correct (capacity is an upper bound) and within-noise of the
    # per-shard rung on coherent ray shards.
    vma = getattr(jax.typeof(total), "vma", None) or frozenset()
    if vma:
        total = jax.lax.pmax(total, tuple(vma))

    kernel_kw = dict(
        backface_culling=backface_culling,
        use_root_filter=use_root_filter,
        anyhit=anyhit,
        collect_stats=collect_stats,
    )
    call = functools.partial(
        _pallas_call, cbox=tb.cbox, tri=tb.tri, aux=aux, rp=rp,
        tc=tri_chunk, n_sub=n_sub, kernel_kw=kernel_kw,
        interpret=interpret,
    )

    def bucket_call(s_cap):
        pt, pc, pv = _pair_tables(torder, counts, s_cap)
        return call(pt, pc, pv, ray_tile=ray_tile)

    if fine_fb_ok:
        def fallback_call():
            return bucket_call(n_tiles * n_super)
    else:
        def fallback_call():
            # Always-correct all-pairs capacity at a coarse tiling
            # (<= 16 wide tiles keep the (nt_fb * Cs) tables in SMEM).
            nt_fb = rp // fb_tile
            to_fb, ct_fb, _ = _tile_tables(
                sg(ro_p).reshape(3, nt_fb, fb_tile).swapaxes(0, 1),
                sg(invT).reshape(3, nt_fb, fb_tile).swapaxes(0, 1),
                sg(t0).reshape(nt_fb, fb_tile),
                tb.sbox,
            )
            pt, pc, pv = _pair_tables(to_fb, ct_fb, nt_fb * n_super)
            return call(pt, pc, pv, ray_tile=fb_tile)

    buckets = [
        m * n_tiles for m in _S_BUCKETS if m * n_tiles < n_tiles * n_super
    ]
    if not buckets:
        # No ladder rungs below all-pairs: take the fallback directly
        # (== the fine all-pairs call when its SMEM tables fit, the
        # coarse <=16-wide retiling otherwise — small-n_super meshes
        # with huge batched-shadow ray counts hit the latter).
        t_out, tri_out, stats = fallback_call()
    else:
        def make_branch(s_cap, inner):
            return lambda: jax.lax.cond(
                total <= s_cap, lambda: bucket_call(s_cap), inner
            )

        branch = fallback_call
        for s_cap in reversed(buckets):
            branch = make_branch(s_cap, branch)
        t_out, tri_out, stats = branch()

    return t_out[0, :R], tri_out[0, :R], stats[0, 1], stats[0, 0]


def bruteforce_mesh_pallas(
    mesh,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    t_limit: jnp.ndarray | None = None,
    *,
    backface_culling: bool = True,
    tri_chunk: int | None = None,
    use_root_filter: bool = True,
    ray_tile: int | None = None,
    interpret: bool = False,
    tables: "IntersectTables | None" = None,
    mode: str = "closest",
    collect_stats: bool = False,
    rays_row: bool = False,
):
    """Closest hit (mode="closest") or occlusion query (mode="any") over
    all mesh triangles, fused on-chip. Interface matches
    ops.bruteforce.bruteforce_mesh; in any-hit mode the returned tri is
    0 where the ray is occluded within t_limit and -1 otherwise (t is
    FLT_MAX). Pass prebuilt `tables` (build_intersect_tables) to skip
    host-side table construction (required under jit — the build is
    host numpy); table content is independent of every render flag.
    Returns (t, tri, box_tests, tri_tests) with
    box/tri test counters accumulated honestly on-device when
    collect_stats=True (0 otherwise — the counting serializes the
    kernel's scalar pipeline, so it is opt-in like the reference's
    collectStatistics flag).

    rays_row=True takes ro/rd as (3, R) rows (the integrator's (3, B)
    layout) and skips the (R, 3) <-> (3, R) relayouts entirely — the
    kernel operands are row-major anyway."""
    T = int(mesh.v.shape[0])
    if not rays_row:
        ro = ro.T  # (3, R) — all internal layouts are row-major
        rd = rd.T
    R = ro.shape[1]
    anyhit = mode == "any"
    if T == 0:
        z = jnp.zeros((), jnp.int32)
        return (
            jnp.full((R,), FLT_MAX, jnp.float32),
            jnp.full((R,), -1, jnp.int32),
            z, z,
        )

    if tables is None:
        if tri_chunk is None:
            tri_chunk = default_tri_chunk(T)
        tables = build_intersect_tables(mesh, tri_chunk=tri_chunk)
    else:
        if tri_chunk is not None:
            assert tables.tri_chunk == tri_chunk
    perm = tables.perm

    t_best, tri_best, box_tests, tri_tests = _intersect_tables_impl(
        tables, ro, rd, t_limit,
        backface_culling=backface_culling,
        use_root_filter=use_root_filter,
        anyhit=anyhit,
        collect_stats=collect_stats,
        ray_tile=ray_tile,
        interpret=interpret,
    )
    if anyhit:
        return (
            jnp.full((R,), FLT_MAX, jnp.float32),
            tri_best,
            box_tests,
            tri_tests,
        )
    if perm is None:
        tri_remap = tri_best
    else:
        tri_remap = perm[jnp.maximum(tri_best, 0)].astype(jnp.int32)
    tri_best = jnp.where(tri_best >= 0, tri_remap, -1)
    found = tri_best >= 0
    t_best = jnp.where(found, t_best, FLT_MAX)
    return t_best, tri_best, box_tests, tri_tests


def _slice_tables_supers(t: IntersectTables, lo: int,
                         hi: int) -> IntersectTables:
    """Static super-chunk range [lo, hi) of a table set — the kernel
    is shard-size-agnostic (see parallel.geoshard), so a slice is a
    smaller, self-contained table. perm is dropped: slices are only
    used for any-hit queries, which never map triangle ids back."""
    return IntersectTables(
        t.tri_chunk, t.n_sub, None,
        t.tri[lo:hi],
        t.cbox[lo * t.n_sub: hi * t.n_sub],
        t.sbox[lo:hi],
    )


def anyhit_two_phase(mesh, tables: IntersectTables, ro3, rd3, t_limit,
                     *, frac: float, backface_culling: bool,
                     use_root_filter: bool, collect_stats: bool,
                     interpret: bool):
    """Two-phase any-hit with mid-pass shadow-ray compaction
    (settings.anyhit_compact_frac; VERDICT r4 next-step 3).

    Phase 1 queries the first round(frac*Cs) super chunks. Rays it
    occludes are RETIRED: the survivors are repacked densely via a
    cumsum permutation (unresolved lanes first — scatter, not sort),
    so in phase 2 (the remaining supers) the resolved majority
    occupies trailing all-dead ray tiles whose t_limit = -1 generates
    ZERO live (tile, super) pairs in the exact pre-cull — the kernel's
    work shrinks with the resolved fraction instead of its tile
    coverage. Returns (tri, box_tests, tri_tests) with the
    bruteforce_mesh_pallas any-hit contract (tri >= 0 = occluded).

    The permutation costs two (3, Q) scatters + one gather per mesh
    query; the A/B against the single-pass kernel lives in
    tools/bench_anyhit_ab.py --compact (docs/PERF.md adjudicates)."""
    cs = tables.sbox.shape[0]
    k = max(1, min(cs - 1, int(round(cs * frac))))
    q = ro3.shape[1]
    kw = dict(mode="any", rays_row=True,
              backface_culling=backface_culling,
              use_root_filter=use_root_filter,
              collect_stats=collect_stats, interpret=interpret)
    t1 = _slice_tables_supers(tables, 0, k)
    _, tri1, bt1, tt1 = bruteforce_mesh_pallas(
        mesh, ro3, rd3, t_limit, tables=t1, tri_chunk=t1.tri_chunk, **kw
    )
    occ1 = tri1 >= 0

    # Dense stable partition: destination slot per lane (a full
    # permutation of 0..Q-1), unresolved lanes first.
    unres = ~occ1
    iu = jnp.cumsum(unres.astype(jnp.int32)) - 1
    n_un = jnp.sum(unres.astype(jnp.int32))
    ir = jnp.cumsum(occ1.astype(jnp.int32)) - 1
    pos = jnp.where(unres, iu, n_un + ir)
    ro_p = jnp.zeros_like(ro3).at[:, pos].set(ro3)
    rd_p = jnp.zeros_like(rd3).at[:, pos].set(rd3)
    tl = t_limit if t_limit is not None else jnp.full((q,), _FMAX,
                                                      jnp.float32)
    tl_p = (
        jnp.zeros((q,), jnp.float32)
        .at[pos].set(jnp.where(occ1, -1.0, tl))
    )

    t2 = _slice_tables_supers(tables, k, cs)
    _, tri2p, bt2, tt2 = bruteforce_mesh_pallas(
        mesh, ro_p, rd_p, tl_p, tables=t2, tri_chunk=t2.tri_chunk, **kw
    )
    occ = occ1 | (tri2p >= 0)[pos]
    tri = jnp.where(occ, 0, -1).astype(jnp.int32)
    return tri, bt1 + bt2, tt1 + tt2


class FusedTables:
    """Concatenated multi-mesh chunk tables: ONE kernel dispatch per
    ray block intersects EVERY mesh in the scene.

    The reference's per-object closest-hit loop
    (src/scene.cpp:724-756) costs nothing per extra object; a per-mesh
    Pallas launch costs a full tile pre-cull + Mosaic dispatch each —
    an N-mesh scene paid N of them per bounce. But the kernel is
    mesh-agnostic: it walks Morton-ordered chunk tables, so fusing N
    meshes is pure table concatenation along the super-chunk axis
    (every mesh built with the SAME (tri_chunk, n_sub) so the static
    block shapes agree). One shared pre-cull sees all meshes' super
    AABBs; per-tile live lists naturally skip meshes the tile's rays
    never approach.

    `geo` is a plain IntersectTables over the concatenated chunks;
    `idmap` is the raw-id remap — rows [mesh sub index, global column
    into the scene's concatenated (30, T_total) vgeoT] indexed by the
    kernel's padded chunk-space triangle id. Padded slots alias their
    mesh's LAST real row (np.minimum(arange, t_i - 1) clamps upward;
    they are zero triangles and can never be returned).
    """

    def __init__(self, geo: IntersectTables, idmap, n_meshes: int,
                 any_clipped: bool, t_total: int):
        self.geo = geo
        self.idmap = idmap          # (2, n_pad_total) i32
        self.n_meshes = n_meshes
        self.any_clipped = any_clipped
        self.t_total = t_total

    def tree_flatten(self):
        return (
            (self.geo, self.idmap),
            (self.n_meshes, self.any_clipped, self.t_total),
        )

    @classmethod
    def tree_unflatten(cls, static, dyn):
        return cls(dyn[0], dyn[1], *static)


jax.tree_util.register_pytree_node(
    FusedTables,
    lambda t: t.tree_flatten(),
    FusedTables.tree_unflatten,
)


def build_fused_tables(host_meshes, clipped_flags, include=None,
                       tri_chunk: int | None = None,
                       n_sub: int | None = None,
                       as_numpy: bool = False):
    """Concatenate per-mesh chunk tables into one FusedTables.

    host_meshes: sequence of host-side mesh views (numpy .v (T, 3, 3),
    .reach_lo/.reach_hi (T, 3), .morton_perm or None) in scene sub
    order — ALL meshes, including excluded ones (their triangle counts
    still advance the global vgeoT column offset so idmap columns line
    up with the scene's concatenated vgeoT).
    clipped_flags[i]: mesh i's AABB pokes outside the reference's root
    box (MeshData.clipped_by_root). Unclipped meshes get their RAW
    triangle bounds substituted for the reach rows, which makes the
    kernel's root filter an exact no-op for them — so one global
    use_root_filter flag (use_ac and any_clipped) reproduces the
    per-mesh `use_ac and clipped_by_root` gating exactly.
    include: optional bool per mesh (e.g. the shadow tables exclude
    transparent meshes, scene.cpp:733-734). Default: all.

    Returns None when no included mesh has triangles. Host-side numpy
    (same reasoning as build_intersect_tables)."""
    import numpy as np

    n = len(host_meshes)
    if include is None:
        include = [True] * n
    ts = [int(m.v.shape[0]) for m in host_meshes]
    t_total_inc = sum(t for t, inc in zip(ts, include) if inc)
    if t_total_inc == 0:
        return None
    # One chunk shape for every mesh, sized by the INCLUDED total (the
    # pre-pass and SMEM tables scale with the fused super count);
    # tri_chunk/n_sub override for the any-hit chunk-shape experiment.
    tc = tri_chunk or default_tri_chunk(t_total_inc)
    n_sub = n_sub or DEFAULT_SUB_PER_SUPER

    tris, cboxes, sboxes, mids, vids = [], [], [], [], []
    vofs = 0
    any_clipped = False
    for i, m in enumerate(host_meshes):
        t_i = ts[i]
        if not include[i] or t_i == 0:
            vofs += t_i
            continue
        any_clipped = any_clipped or bool(clipped_flags[i])
        if clipped_flags[i]:
            mm = m
        else:
            # Raw triangle bounds: the literal reference slab against a
            # triangle's own AABB accepts every accepted M-T hit, so
            # the root filter cannot reject anything for this mesh.
            import types

            v = np.asarray(m.v)
            mm = types.SimpleNamespace(
                v=m.v, reach_lo=v.min(axis=1), reach_hi=v.max(axis=1),
                morton_perm=getattr(m, "morton_perm", None),
            )
        # as_numpy: the per-mesh tables are concatenated on the host
        # below — materializing each on device first costs a full
        # device->host round-trip per mesh for nothing.
        p = build_intersect_tables(mm, tri_chunk=tc, n_sub=n_sub,
                                   as_numpy=True)
        tris.append(p.tri)
        cboxes.append(p.cbox)
        sboxes.append(p.sbox)
        n_pad = p.tri.shape[0] * n_sub * tc
        local = np.minimum(np.arange(n_pad), t_i - 1)
        perm = getattr(m, "morton_perm", None)
        if perm is not None:
            local = np.asarray(perm)[local]
        mids.append(np.full((n_pad,), i, np.int32))
        vids.append((vofs + local).astype(np.int32))
        vofs += t_i

    idmap = np.stack(
        [np.concatenate(mids), np.concatenate(vids)], axis=0
    )  # (2, n_pad_total)
    # as_numpy keeps the fused tables HOST-side for the geo-sharded
    # path: shard_map's sharded in_specs then transfer each device only
    # ITS table shard, instead of staging the full O(T_total) arrays on
    # one device first (which would defeat the beyond-HBM mode).
    wrap = (lambda a: a) if as_numpy else jnp.asarray
    geo = IntersectTables(
        tc, n_sub, None,
        wrap(np.concatenate(tris, axis=0)),
        wrap(np.concatenate(cboxes, axis=0)),
        wrap(np.concatenate(sboxes, axis=0)),
    )
    return FusedTables(geo, wrap(idmap), n, any_clipped, vofs)


def intersect_fused(
    ft: FusedTables,
    ro: jnp.ndarray,   # (3, R) rows
    rd: jnp.ndarray,   # (3, R) rows
    t_limit: jnp.ndarray | None = None,
    *,
    mode: str = "closest",
    backface_culling: bool = True,
    use_root_filter: bool = True,
    collect_stats: bool = False,
    ray_tile: int | None = None,
    interpret: bool = False,
):
    """One kernel dispatch over ALL fused meshes.

    mode="closest": returns (t (R,), mid (R,), vid (R,), box_tests,
    tri_tests) — mid is the winning mesh's scene sub index (-1 = miss),
    vid the global column into the concatenated vgeoT (clamped to 0 on
    miss so it is always gather-safe). Cross-mesh ties at bit-equal t
    resolve by chunk visit order, the same caveat as in-mesh ties.

    mode="any": returns (occluded (R,) bool, box_tests, tri_tests) —
    occlusion within t_limit by any fused mesh (rays entering with
    t_limit < 0 are pre-done and cost nothing, the trace_occlusion
    progressive-pruning contract)."""
    anyhit = mode == "any"
    t_best, raw, box_tests, tri_tests = _intersect_tables_impl(
        ft.geo, ro, rd, t_limit,
        backface_culling=backface_culling,
        use_root_filter=use_root_filter,
        anyhit=anyhit,
        collect_stats=collect_stats,
        ray_tile=ray_tile,
        interpret=interpret,
    )
    if anyhit:
        return raw >= 0, box_tests, tri_tests
    found = raw >= 0
    mv = ft.idmap[:, jnp.maximum(raw, 0)]  # (2, R)
    mid = jnp.where(found, mv[0], -1)
    vid = jnp.where(found, mv[1], 0)
    t_best = jnp.where(found, t_best, FLT_MAX)
    return t_best, mid, vid, box_tests, tri_tests
