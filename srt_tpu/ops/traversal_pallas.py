"""Production TPU intersection kernel: cluster-culled Woop intersection.

This is the speed-of-light replacement for the reference's per-thread
stack traversal (``Intersects``, ray_intersects.glsl:99-133), redesigned
for the VPU's 8x128 lanes instead of SIMT threads:

* Triangles are kept in **BVH order** (spatially coherent; the builder
  already reorders primitives, bvh.h:66-72) and chunked into clusters of
  128 — one cluster fills the VPU lane dimension exactly; 16 consecutive
  clusters form a **supercluster** (2,048 triangles).
* Culling is hierarchical and two-kernel: a cheap **cull kernel**
  slab-tests each ray tile against every supercluster AABB and emits a
  compacted, **near-to-far ordered** list of active supers (rank + select
  matmuls in-kernel — no sort, no gather); the **intersect kernel** walks
  exactly that list, slab-tests each super's 16 cluster AABBs against the
  rays' *current best t*, and bit-gates the per-cluster Woop evaluation.
  A shrinking tile-best-t scalar gate skips far supers outright once every
  ray has a hit — the TPU analog of ordered BVH descent with zero
  divergence inside a tile.
* Intersection uses the **Woop unit-triangle transform**: a precomputed
  affine map per triangle turns the test into ~24 fused multiply-adds per
  (ray, triangle) — about half the arithmetic of Moller-Trumbore and with
  far fewer [tile, 128] temporaries, which is what the VPU actually
  bottlenecks on.
* The kernel only selects the winning triangle index per ray (fp32
  candidate search, with a small edge epsilon so grazing hits at shared
  triangle edges are not dropped); the caller re-derives exact (t, u, v)
  for the winner with one exact Moller-Trumbore evaluation outside the
  kernel, so precision matches the dense path.

Scene data (the Woop table, [13, T]) lives in VMEM for models up to
~218k triangles; larger (Airplane-class) models keep the table in HBM
and the intersect kernel double-buffer DMAs each processed super's
16-cluster block, prefetching the next ordered list entry under the
current one's compute (``stream=True``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srt_tpu.ops import intersect

CLUSTER = 128          # triangles per cluster == VPU lane width
SUPER = 16             # clusters per supercluster (word-packable in f32)
DEFAULT_TILE = 512     # rays per kernel tile
DEN_EPS_SCALE = intersect.MT_PARALLEL_EPS  # parallel-ray determinant eps
T_EPS = intersect.MT_HIT_EPS
EDGE_EPS = 1e-4        # candidate acceptance slop at shared edges
BIG = 3.0e37   # finite miss sentinel (inf would NaN in 0*inf)


# ---------------------------------------------------------------------------
# Host-side precompute
# ---------------------------------------------------------------------------

def build_woop(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """Per-triangle world->unit-triangle affine transforms.

    Returns [13, T] float32: rows 0-3 the x-row (3 linear coefficients +
    translation), rows 4-7 y-row, 8-11 z-row, row 12 the per-triangle
    parallel-epsilon for the z-row denominator (|det|-scaled so the
    parallel test matches Moller-Trumbore's ``|a| < 1e-4``,
    ray_intersects.glsl:73).  Degenerate triangles get eps = +inf (never
    hit).  Computed in float64 for a well-conditioned inverse.
    """
    v0 = np.asarray(v0, np.float64)
    e1 = np.asarray(v1, np.float64) - v0
    e2 = np.asarray(v2, np.float64) - v0
    n = np.cross(e1, e2)
    t_count = v0.shape[0]

    a = np.stack([e1, e2, n], axis=-1)              # [T, 3, 3] columns
    det = np.linalg.det(a)
    ok = np.abs(det) > 1e-18
    a_safe = np.where(ok[:, None, None], a, np.eye(3)[None])
    a_inv = np.linalg.inv(a_safe)                   # [T, 3, 3]
    trans = -np.einsum("tij,tj->ti", a_inv, v0)     # [T, 3]

    out = np.zeros((13, t_count), np.float64)
    for r in range(3):
        out[4 * r + 0] = a_inv[:, r, 0]
        out[4 * r + 1] = a_inv[:, r, 1]
        out[4 * r + 2] = a_inv[:, r, 2]
        out[4 * r + 3] = trans[:, r]
    # MT's parallel check is |dot(d, n)| < eps; our denominator is
    # d_z' = dot(d, n) / |n|^2, so the threshold scales by 1/|n|^2.
    n2 = np.einsum("ti,ti->t", n, n)
    eps = np.where(ok, DEN_EPS_SCALE / np.maximum(n2, 1e-30), np.inf)
    out[12] = eps
    return out.astype(np.float32)


def build_clusters(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                   cluster: int = CLUSTER):
    """AABBs of consecutive ``cluster``-triangle chunks (BVH order).
    Returns (cmin [C, 3], cmax [C, 3]); T must be a multiple of cluster."""
    t_count = v0.shape[0]
    assert t_count % cluster == 0, "pad triangles to the cluster size first"
    c = t_count // cluster

    def chunk(arr):
        return np.asarray(arr, np.float32).reshape(c, cluster, 3)

    lo = np.minimum(np.minimum(chunk(v0).min(1), chunk(v1).min(1)),
                    chunk(v2).min(1))
    hi = np.maximum(np.maximum(chunk(v0).max(1), chunk(v1).max(1)),
                    chunk(v2).max(1))
    return lo, hi


# ---------------------------------------------------------------------------
# Cull kernel: supercluster slab test + entry-ordered compacted super lists.
#
# Superclusters are groups of SUPER=16 consecutive clusters (2,048 triangles
# in BVH order).  Per ray tile this kernel slab-tests the rays against every
# supercluster AABB, ranks the hit supers by their nearest entry distance
# (pairwise-compare matmuls — S is small), and emits a compacted,
# near-to-far ORDERED list of (super index, entry distance) plus a count.
# The intersect kernel walks exactly that list, so its per-tile scalar work
# is O(active supers), not O(total clusters), and the front-to-back order
# makes its shrinking-t gate an effective BVH-style early-out.
#
# (Computing slab tests with plain jnp broadcasting triggers a catastrophic
# XLA compile-time pathology on this backend; everything stays in Pallas.)
# ---------------------------------------------------------------------------

def _cull_kernel(rays_ref, sb_ref, clist_ref, elist_ref, counts_ref,
                 ebuf_ref, amax_ref, *, tile: int, s_count: int):
    """rays_ref [8*tile, 8] VMEM (ox oy oz dx dy dz t_max pad); sb_ref
    [8, S] VMEM super bounds (rows: min xyz, max xyz, pad, pad); outputs
    clist_ref [8, S] int32 / elist_ref [8, S] f32 (row ``sub`` is tile row
    sub's ordered super list, list slots on the lane axis) and counts_ref
    [8, 1] int32.

    One program computes 8 tile rows (per-program launch overhead measured
    ~6 us; 8 rows amortize it)."""
    s = s_count
    # Mosaic iota must be integer-typed; cast for the f32 rank arithmetic.
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1).astype(jnp.float32)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0).astype(jnp.float32)
    ident = (jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
             ).astype(jnp.float32)
    dn = (((1,), (1,)), ((), ()))  # contract lane axes: [8,S] -> [S,8]

    def r(j):
        return sb_ref[j:j + 1, :]                     # [1, S]

    # Pass 1: per-row super slab tests -> masked entry distances [8, S].
    # All-dead rows (every t_max == 0: terminated paths packed together by
    # the integrator's bounce sort) skip the slab work outright — by the
    # last bounces most rows are dead.
    for sub in range(8):
        rays = rays_ref[sub * tile:(sub + 1) * tile, :]
        t_max = rays[:, 6:7]
        amax_ref[0, 0] = jnp.max(t_max)
        ebuf_ref[sub:sub + 1, :] = jnp.full((1, s), BIG, jnp.float32)

        @pl.when(amax_ref[0, 0] > 0.0)
        def _slab(sub=sub, rays=rays, t_max=t_max):
            ox = rays[:, 0:1]
            oy = rays[:, 1:2]
            oz = rays[:, 2:3]
            inv_x = 1.0 / rays[:, 3:4]
            inv_y = 1.0 / rays[:, 4:5]
            inv_z = 1.0 / rays[:, 5:6]

            t0x = (r(0) - ox) * inv_x
            t1x = (r(3) - ox) * inv_x
            t0y = (r(1) - oy) * inv_y
            t1y = (r(4) - oy) * inv_y
            t0z = (r(2) - oz) * inv_z
            t1z = (r(5) - oz) * inv_z
            t_near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.minimum(t0z, t1z))
            t_far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                            jnp.maximum(t0y, t1y)),
                                jnp.maximum(t0z, t1z))
            # Entry bound: max(t_near, 0), NOT exit-if-inside (the
            # reference IntersectsBox quirk, ray_intersects.glsl:49-58):
            # a box entered from INSIDE whose exit exceeds the range
            # bound can still hold nearer candidates - the exit is no
            # lower bound on candidate t; 0 is.
            sel = jnp.maximum(t_near, 0.0)
            hit = (t_near <= t_far) & (t_far >= 0.0) & (sel < t_max)
            ebuf_ref[sub:sub + 1, :] = jnp.min(
                jnp.where(hit, sel, BIG), axis=0, keepdims=True)

    # Pass 2: rank active supers by entry distance (ties by index), then
    # build the one-hot selection matrix M[c, j] = (rank[c] == j) & occ[c]
    # and reduce it against index / entry vectors — a gather-free,
    # sort-free compaction that also front-to-back orders the list.
    # Supers live on sublanes, output list slots on lanes; the two
    # [8, S] -> [S, 8] relayouts ride the MXU via one identity dot each
    # (per-row dots measured ~1 us apiece — batching them 8x matters).
    e_all = ebuf_ref[:]                               # [8, S]
    occ_all = (e_all < BIG).astype(jnp.float32)
    counts_ref[:] = jnp.sum(occ_all, axis=1, keepdims=True).astype(jnp.int32)
    # precision=HIGHEST: at the TPU default (bf16 inputs) the relayout
    # rounds the entry distances, which desynchronizes the exact-equality
    # tie-break below -> rank collisions -> two supers summed into one
    # list slot and another slot dropped (observed as lost hits on v5e).
    hi = jax.lax.Precision.HIGHEST
    e_t = jax.lax.dot_general(ident, e_all, dn, precision=hi,
                              preferred_element_type=jnp.float32)   # [S, 8]
    o_t = jax.lax.dot_general(ident, occ_all, dn, precision=hi,
                              preferred_element_type=jnp.float32)
    for sub in range(8):
        entry = e_all[sub:sub + 1, :]                 # [1, S]
        occ = occ_all[sub:sub + 1, :]
        e_s = e_t[:, sub:sub + 1]                     # [S, 1]
        o_s = o_t[:, sub:sub + 1]
        # before[c, j] = active j strictly nearer than c (ties by index).
        before = jnp.where(
            (entry < e_s) | ((entry == e_s) & (iota_l < iota_s)), occ, 0.0)
        rank_s = jnp.sum(before, axis=1, keepdims=True)        # [S, 1]
        m = jnp.where((rank_s == iota_l) & (o_s > 0), 1.0, 0.0)  # [S, S]
        clist = jnp.sum(m * iota_s, axis=0, keepdims=True)     # [1, S]
        elist = jnp.sum(m * jnp.where(o_s > 0, e_s, 0.0),
                        axis=0, keepdims=True)
        clist_ref[sub:sub + 1, :] = clist.astype(jnp.int32)
        elist_ref[sub:sub + 1, :] = elist


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _launch_cull(rays, sbounds, tile: int, interpret: bool):
    n_tiles = rays.shape[0] // tile
    assert n_tiles % 8 == 0
    s = sbounds.shape[1]
    kernel = functools.partial(_cull_kernel, tile=tile, s_count=s)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles // 8,),
        in_specs=[
            pl.BlockSpec((8 * tile, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, s), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, s), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, s), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1), jnp.int32),
        ],
        out_specs=[
            pl.BlockSpec((8, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((8, s), jnp.float32),
                        pltpu.SMEM((1, 1), jnp.float32)],
        interpret=interpret,
    )(rays, sbounds)


# ---------------------------------------------------------------------------
# Per-ray cull kernel: the binned-traversal front end.
#
# Same slab math as _cull_kernel's pass 1, but the [tile, S] masked entry
# distances are written out PER RAY instead of being reduced to a tile
# union.  The binned pair expansion (``pallas_model_hit(binned=True)``)
# groups the (ray, super) pairs super-major so each intersect-kernel tile
# holds 128 rays that all need the SAME super — late-bounce tiles stop
# paying for the union of 128 divergent footprints (measured r3: bounces
# 3-4 union 34-36 of 50 supers per 128-ray tile while each ray needs only
# a handful; tile-level culling is structurally done at that point).
# ---------------------------------------------------------------------------

GROUP = 8   # rays per bin-granule: glue costs shrink 8x vs per-ray pairs
            # (transpose/cumsum/scatter/gather are all measured-slow XLA
            # ops on this backend); the bounce sort makes 8 consecutive
            # rays near-coherent, so a group's union footprint stays close
            # to a single ray's.


def _cull_perray_kernel(rays_ref, sb_ref, e_ref, amax_ref, *, tile: int,
                        s_count: int):
    """rays_ref [8*tile, 8] VMEM; sb_ref [8, S] VMEM super bounds; e_ref
    [8*tile/GROUP, S] out — per-GROUP (8 consecutive rays, sorted ->
    near-coherent) super entry distance, BIG = no ray in the group needs
    the super.  All-dead rows (terminated paths packed last by the bounce
    sort) write only the BIG fill."""
    s = s_count
    gpt = tile // GROUP   # groups per tile row

    def r(j):
        return sb_ref[j:j + 1, :]                     # [1, S]

    for sub in range(8):
        rays = rays_ref[sub * tile:(sub + 1) * tile, :]
        t_max = rays[:, 6:7]
        amax_ref[0, 0] = jnp.max(t_max)
        e_ref[sub * gpt:(sub + 1) * gpt, :] = jnp.full(
            (gpt, s), BIG, jnp.float32)

        @pl.when(amax_ref[0, 0] > 0.0)
        def _slab(sub=sub, rays=rays, t_max=t_max):
            ox = rays[:, 0:1]
            oy = rays[:, 1:2]
            oz = rays[:, 2:3]
            inv_x = 1.0 / rays[:, 3:4]
            inv_y = 1.0 / rays[:, 4:5]
            inv_z = 1.0 / rays[:, 5:6]
            t0x = (r(0) - ox) * inv_x
            t1x = (r(3) - ox) * inv_x
            t0y = (r(1) - oy) * inv_y
            t1y = (r(4) - oy) * inv_y
            t0z = (r(2) - oz) * inv_z
            t1z = (r(5) - oz) * inv_z
            t_near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.minimum(t0z, t1z))
            t_far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                            jnp.maximum(t0y, t1y)),
                                jnp.maximum(t0z, t1z))
            # Entry bound: max(t_near, 0), NOT exit-if-inside (the
            # reference IntersectsBox quirk, ray_intersects.glsl:49-58):
            # a box entered from INSIDE whose exit exceeds the range
            # bound can still hold nearer candidates - the exit is no
            # lower bound on candidate t; 0 is.
            sel = jnp.maximum(t_near, 0.0)
            hit = (t_near <= t_far) & (t_far >= 0.0) & (sel < t_max)
            e_ray = jnp.where(hit, sel, BIG)          # [tile, S]
            e_ref[sub * gpt:(sub + 1) * gpt, :] = jnp.min(
                e_ray.reshape(gpt, GROUP, s), axis=1)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _launch_cull_perray(rays, sbounds, tile: int, interpret: bool):
    n_tiles = rays.shape[0] // tile
    assert n_tiles % 8 == 0
    s = sbounds.shape[1]
    kernel = functools.partial(_cull_perray_kernel, tile=tile, s_count=s)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles // 8,),
        in_specs=[
            pl.BlockSpec((8 * tile, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, s), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((rays.shape[0] // GROUP, s),
                                       jnp.float32),
        out_specs=pl.BlockSpec((8 * tile // GROUP, s), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        interpret=interpret,
    )(rays, sbounds)


def _pair_capacity(n_groups: int, s: int, gpt: int, factor: int) -> int:
    """Static (group, super) pair capacity: ``factor`` slots per group,
    rounded to whole 8-tile SMEM windows of ``gpt`` groups each."""
    cap = min(factor * n_groups, n_groups * s + s * gpt)
    return -(-cap // (gpt * 8)) * (gpt * 8)


def _binned_pairs(e_group, gpt: int, p_cap: int):
    """Group the per-GROUP super occupancy into super-major pair tiles.

    Returns (pair_grp [P] int32 — group id per pair slot, padding =
    n_groups; tile_super [P/gpt, 1]; tile_counts [P/gpt, 1]; total —
    slots the expansion actually needed, > P means overflow).
    Gather/sort-free: per-super counts -> tile-padded cumsum offsets,
    per-(super, group) rank via one row cumsum, one scatter of group ids
    (out-of-capacity positions drop).  Every pair tile belongs to exactly
    ONE super, so the intersect kernel runs it with a trivial
    single-entry list."""
    n_groups, s = e_group.shape
    occ = (e_group < BIG).T.astype(jnp.int32)         # [S, G] super-major
    cnt = jnp.sum(occ, axis=1)                        # [S]
    cnt_pad = ((cnt + gpt - 1) // gpt) * gpt
    ends = jnp.cumsum(cnt_pad)
    offs = ends - cnt_pad
    rank = jnp.cumsum(occ, axis=1) - 1                # [S, G]
    pos = jnp.where(occ > 0, offs[:, None] + rank, p_cap)
    grp_ids = jax.lax.broadcasted_iota(jnp.int32, (s, n_groups), 1)
    pair_grp = jnp.full((p_cap,), n_groups, jnp.int32).at[
        pos.reshape(-1)].set(grp_ids.reshape(-1), mode="drop")
    n_ptiles = p_cap // gpt
    tile_start = jnp.arange(n_ptiles, dtype=jnp.int32) * gpt
    tile_super = jnp.minimum(
        jnp.searchsorted(ends, tile_start, side="right").astype(jnp.int32),
        s - 1)[:, None]
    tile_counts = (tile_start < ends[-1]).astype(jnp.int32)[:, None]
    return pair_grp, tile_super, tile_counts, ends[-1]


# ---------------------------------------------------------------------------
# Per-group walk ("pgwalk"): in-kernel binned traversal at GROUP=8-ray
# granularity — the r4 incoherent-bounce production mode.
#
# The r3 binned pipeline was exact but glue-bound: expanding (ray, super)
# pairs ran as XLA transpose/cumsum/scatter/gather (tens of ms each at
# 262k rays) and super-major grouping doubled kernel work.  pgwalk keeps
# rays in their sorted wavefront order (NO expansion, NO gather, NO
# combine scatter) and moves the footprint selection entirely into two
# kernels:
#
# * ``_cull_gmask_kernel`` slab-tests every ray against every CLUSTER
#   AABB (chunked — [tile, C] temporaries past ~600 clusters blow the
#   VMEM stack, CLAUDE.md), reduces occupancy to GROUP granularity, and
#   bit-packs each group's 16 per-super cluster bits into one int32 word
#   via a single [C, S] matmul (exact integer arithmetic on the MXU,
#   precision=HIGHEST).  Output: mask [G, S] int32 — group g needs
#   cluster 16*s+k iff bit k of mask[g, s].
# * ``_pgwalk_kernel`` walks, per group of 8 rays, exactly the clusters
#   its mask names: the per-iteration work is one [8, 128] Woop block —
#   a single native vreg — so a group pays for ITS footprint, not the
#   union of 128 divergent ones (r3 measured: late-bounce tiles union
#   34-36 of 50 supers while each ray needs ~5).  All gating decisions
#   are SMEM scalar reads computed at cull time: the walk contains no
#   vector->scalar round trips at all.
#
# The per-thread early-out of the reference walk
# (ray_intersects.glsl:99-133) that tile unions forfeit is recovered
# here at 8-ray granularity.  Tie rule: clusters are walked in ascending
# index order with strict t <, so exact-t ties resolve to the smallest
# triangle index (the dense path's argmin rule; the tiled walk resolves
# cross-super ties to the nearest-entry super instead — identical up to
# exact fp32 t ties).
# ---------------------------------------------------------------------------

CHUNK_C = 256  # cluster-slab chunk (lanes) for the gmask cull


def _cull_gmask_kernel(rays_ref, cb8_ref, w_ref, mask_ref, amax_ref, *,
                       tile: int, c_pad: int, s_count: int):
    """rays_ref [8*tile, 8] VMEM; cb8_ref [8, Cp] VMEM per-cluster bounds
    (rows: min xyz, max xyz, pad, pad; padding clusters carry NaN boxes —
    every slab compare false); w_ref [Cp, S] VMEM bitpack matrix
    (w[c, c//16] = 2^(c mod 16), zero rows for padding); mask_ref
    [8*tile/GROUP, S] int32 out.  All-dead rows write only the zero fill.
    """
    s = s_count
    gpt = tile // GROUP
    n_chunks = c_pad // CHUNK_C
    hi = jax.lax.Precision.HIGHEST
    dn = (((1,), (0,)), ((), ()))

    for sub in range(8):
        rays = rays_ref[sub * tile:(sub + 1) * tile, :]
        t_max = rays[:, 6:7]
        amax_ref[0, 0] = jnp.max(t_max)
        mask_ref[sub * gpt:(sub + 1) * gpt, :] = jnp.zeros(
            (gpt, s), jnp.int32)

        @pl.when(amax_ref[0, 0] > 0.0)
        def _slab(sub=sub, rays=rays, t_max=t_max):
            ox = rays[:, 0:1]
            oy = rays[:, 1:2]
            oz = rays[:, 2:3]
            inv_x = 1.0 / rays[:, 3:4]
            inv_y = 1.0 / rays[:, 4:5]
            inv_z = 1.0 / rays[:, 5:6]
            acc = None
            for ch in range(n_chunks):
                lo = ch * CHUNK_C

                def r(q, lo=lo):
                    return cb8_ref[q:q + 1, lo:lo + CHUNK_C]   # [1, CHUNK]

                t0x = (r(0) - ox) * inv_x
                t1x = (r(3) - ox) * inv_x
                t0y = (r(1) - oy) * inv_y
                t1y = (r(4) - oy) * inv_y
                t0z = (r(2) - oz) * inv_z
                t1z = (r(5) - oz) * inv_z
                t_near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                                 jnp.minimum(t0y, t1y)),
                                     jnp.minimum(t0z, t1z))
                t_far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                                jnp.maximum(t0y, t1y)),
                                    jnp.maximum(t0z, t1z))
                # Entry bound: max(t_near, 0), NOT exit-if-inside (the
                # reference IntersectsBox quirk, ray_intersects.glsl:49-58):
                # a box entered from INSIDE whose exit exceeds the range
                # bound can still hold nearer candidates - the exit is no
                # lower bound on candidate t; 0 is.
                sel = jnp.maximum(t_near, 0.0)
                hit_c = (t_near <= t_far) & (t_far >= 0.0) & (sel < t_max)
                occ = jnp.where(hit_c, 1.0, 0.0)            # [tile, CHUNK]
                occ_g = jnp.max(occ.reshape(gpt, GROUP, CHUNK_C), axis=1)
                part = jax.lax.dot_general(
                    occ_g, w_ref[lo:lo + CHUNK_C, :], dn, precision=hi,
                    preferred_element_type=jnp.float32)      # [gpt, S]
                acc = part if acc is None else acc + part
            mask_ref[sub * gpt:(sub + 1) * gpt, :] = acc.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _launch_cull_gmask(rays, cb8, w_bp, tile: int, interpret: bool):
    n_tiles = rays.shape[0] // tile
    assert n_tiles % 8 == 0
    c_pad, s = w_bp.shape
    kernel = functools.partial(_cull_gmask_kernel, tile=tile, c_pad=c_pad,
                               s_count=s)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles // 8,),
        in_specs=[
            pl.BlockSpec((8 * tile, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, s), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((rays.shape[0] // GROUP, s),
                                       jnp.int32),
        out_specs=pl.BlockSpec((8 * tile // GROUP, s), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        interpret=interpret,
    )(rays, cb8, w_bp)


def _cull_pg2_kernel(rays_ref, cb8_ref, w_ref, clist_ref, bits_ref,
                     counts_ref, mf_ref, amax_ref, *,
                     tile: int, c_pad: int, s_count: int,
                     group: int = GROUP):
    """pgwalk v2 cull: per-GROUP compacted (super, cluster bits) lists in
    ascending SUPER INDEX order.

    rays_ref [8*tile, 8] VMEM; cb8_ref [8, Cp] cluster bounds; w_ref
    [Cp, S] bitpack matrix.  Outputs, per group of ``group`` consecutive
    rays: clist [G, S] int32 (active super ids, ascending), bits [G, S]
    int32 (the listed super's 16 cluster-occupancy bits, aligned with
    clist), counts [G, 1] int32.  Scratch mf [8*tile/group, S] f32 holds
    the per-group cluster-bit values for the whole program so the
    rank-select relayout dots batch all groups at once.

    r5 redesign: the r4 version also slab-tested superclusters and
    emitted NEAR-TO-FAR ordered lists — but the per-group walk has no
    entry gate (the r4 phase-2 gate measured slower), so entry order
    only affects exact-t ties.  Index order needs no entry distances:
    the super slab pass is gone, ranks come from ONE batched
    strictly-lower-triangular matmul over all groups (rank = number of
    active supers with smaller index), and the per-group placement is a
    2-op one-hot build + 2 reduce matmuls.  Tie rule BONUS: ascending
    walk order + the walk's strict t< merge resolves exact-t ties to the
    smallest triangle index — the dense path's argmin rule (the r4
    near-to-far order resolved them to the nearest-entry super instead).
    """
    s = s_count
    gpt = tile // group
    n_chunks = c_pad // CHUNK_C
    hi = jax.lax.Precision.HIGHEST
    dn = (((1,), (0,)), ((), ()))
    dn_t = (((1,), (1,)), ((), ()))
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1).astype(
        jnp.float32)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0).astype(
        jnp.float32)
    ident = (jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
             ).astype(jnp.float32)
    # slt[c', c] = 1 for c' < c: rank = occ @ slt counts actives below.
    slt = (jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
           < jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
           ).astype(jnp.float32)

    # Phase A: per-group cluster-occupancy bit values (chunked slab +
    # exact integer bitpack matmul).
    for sub in range(8):
        rays = rays_ref[sub * tile:(sub + 1) * tile, :]
        t_max = rays[:, 6:7]
        amax_ref[0, 0] = jnp.max(t_max)
        rows = slice(sub * gpt, (sub + 1) * gpt)
        mf_ref[rows, :] = jnp.zeros((gpt, s), jnp.float32)

        @pl.when(amax_ref[0, 0] > 0.0)
        def _slab(sub=sub, rays=rays, t_max=t_max, rows=rows):
            inv_x = 1.0 / rays[:, 3:4]
            inv_y = 1.0 / rays[:, 4:5]
            inv_z = 1.0 / rays[:, 5:6]
            # fma form: t0 = box*inv - o*inv with o*inv hoisted — one
            # fused op per bound instead of (sub, mul) (r5 slab diet).
            oix = rays[:, 0:1] * inv_x
            oiy = rays[:, 1:2] * inv_y
            oiz = rays[:, 2:3] * inv_z

            acc = None
            for ch in range(n_chunks):
                lo = ch * CHUNK_C

                def r(q, lo=lo):
                    return cb8_ref[q:q + 1, lo:lo + CHUNK_C]

                t0x = r(0) * inv_x - oix
                t1x = r(3) * inv_x - oix
                t0y = r(1) * inv_y - oiy
                t1y = r(4) * inv_y - oiy
                t0z = r(2) * inv_z - oiz
                t1z = r(5) * inv_z - oiz
                t_near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                                 jnp.minimum(t0y, t1y)),
                                     jnp.minimum(t0z, t1z))
                t_far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                                jnp.maximum(t0y, t1y)),
                                    jnp.maximum(t0z, t1z))
                # Entry bound: max(t_near, 0), NOT exit-if-inside (the
                # reference IntersectsBox quirk, ray_intersects.glsl:49-58):
                # a box entered from INSIDE whose exit exceeds the range
                # bound can still hold nearer candidates - the exit is no
                # lower bound on candidate t; 0 is.
                sel = jnp.maximum(t_near, 0.0)
                hit_c = (t_near <= t_far) & (t_far >= 0.0) & (sel < t_max)
                occ = jnp.where(hit_c, 1.0, 0.0)
                occ_g = jnp.max(occ.reshape(gpt, group, CHUNK_C), axis=1)
                part = jax.lax.dot_general(
                    occ_g, w_ref[lo:lo + CHUNK_C, :], dn, precision=hi,
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
            mf_ref[rows, :] = acc

    # Phase C: batched index-order rank, per-group one-hot select.
    mf_all = mf_ref[:]                                     # [G_blk, S]
    occ_all = (mf_all > 0.0).astype(jnp.float32)
    counts_ref[:] = jnp.sum(occ_all, axis=1,
                            keepdims=True).astype(jnp.int32)
    ranks = jax.lax.dot_general(occ_all, slt, dn, precision=hi,
                                preferred_element_type=jnp.float32)
    # Inactive supers get rank S (never matches a list slot).
    rank_key = jnp.where(occ_all > 0.0, ranks, float(s))
    r_t = jax.lax.dot_general(ident, rank_key, dn_t, precision=hi,
                              preferred_element_type=jnp.float32)  # [S,Gb]
    m_t = jax.lax.dot_general(ident, mf_all, dn_t, precision=hi,
                              preferred_element_type=jnp.float32)
    for g in range(8 * (tile // group)):
        r_s = r_t[:, g:g + 1]                              # [S, 1]
        m = jnp.where(r_s == iota_l, 1.0, 0.0)             # [S, S]
        clist_ref[g:g + 1, :] = jnp.sum(
            m * iota_s, axis=0, keepdims=True).astype(jnp.int32)
        bits_ref[g:g + 1, :] = jnp.sum(
            m * m_t[:, g:g + 1], axis=0, keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile", "interpret", "group"))
def _launch_cull_pg2(rays, cb8, w_bp, tile: int, interpret: bool,
                     group: int = GROUP):
    n_tiles = rays.shape[0] // tile
    assert n_tiles % 8 == 0 and tile % group == 0
    c_pad, s = w_bp.shape
    g_blk = 8 * tile // group
    kernel = functools.partial(_cull_pg2_kernel, tile=tile, c_pad=c_pad,
                               s_count=s, group=group)
    n_groups = rays.shape[0] // group
    return pl.pallas_call(
        kernel,
        grid=(n_tiles // 8,),
        in_specs=[
            pl.BlockSpec((8 * tile, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, s), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_groups, s), jnp.int32),
            jax.ShapeDtypeStruct((n_groups, s), jnp.int32),
            jax.ShapeDtypeStruct((n_groups, 1), jnp.int32),
        ],
        out_specs=[
            pl.BlockSpec((g_blk, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_blk, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_blk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((g_blk, s), jnp.float32),
                        pltpu.SMEM((1, 1), jnp.float32)],
        interpret=interpret,
    )(rays, cb8, w_bp)


def _popcount16(v):
    """Scalar popcount of a value < 2^16 (int32 ops only — used to turn
    an isolated low bit into its index without transcendentals)."""
    v = v - ((v >> 1) & 0x5555)
    v = (v & 0x3333) + ((v >> 2) & 0x3333)
    v = (v + (v >> 4)) & 0x0F0F
    return (v + (v >> 8)) & 0x1F


def _pgwalk2_kernel(clist_ref, bits_ref, counts_ref, rays_ref,
                    woop_ref, out_t_ref, out_i_ref, bt_ref, bi_ref,
                    *stream_refs,
                    any_hit: bool, group: int = GROUP, ewidth: int = 2,
                    stream: bool = False):
    """pgwalk v2: walk each group's compacted (super, bits) list.

    Per list entry, clusters are visited by iterated lowest-set-bit
    extraction — every inner iteration is a productive [8, 128] Woop
    evaluation, no gate-only scans (v1 burned ~230 scalar iterations per
    group on empty gates + bit tests; here iterations == footprint).
    TWO clusters are evaluated per iteration as independent chains and
    merged with one select pass: a single [8, 128] eval is LATENCY-bound
    (one 24-FMA chain on one vreg), so pairing nearly doubles
    throughput; an odd tail duplicates the last cluster, which the
    strict t< merge makes a no-op.  Tie rule (r5): entries arrive in
    ascending super-index order (see ``_cull_pg2_kernel``), so the
    strict t< merge resolves exact-t ties to the smallest triangle
    index — the dense path's argmin rule exactly.

    ``stream=True`` (r5): the Airplane-class large-scene mode — the Woop
    table stays in HBM and each listed super's 16-cluster block (128 KB)
    is double-buffer DMA'd into VMEM scratch, prefetching the group's
    NEXT list entry under the current entry's evals (the compacted list
    is its own prefetch schedule, exactly like the tiled kernel's stream
    mode).  The 8 group walks run sequentially, so each group warms up
    its entry-0 DMA before its loop; ``pend`` tracks the one
    possibly-dangling prefetch per group for the drain (scratch
    semaphores persist across grid steps).  stream_refs = (wbuf
    [2, SUPER, 16, CLUSTER] VMEM, dma_sem [2], pend [1, 1] SMEM)."""
    if stream:
        wbuf_ref, dma_sem, pend_ref = stream_refs

        def _group_dma(g, j, slot):
            s_idx = clist_ref[g, j]
            return pltpu.make_async_copy(
                woop_ref.at[pl.ds(s_idx * SUPER, SUPER)],
                wbuf_ref.at[slot],
                dma_sem.at[slot],
            )

    lane = jax.lax.broadcasted_iota(jnp.int32, (group, CLUSTER), 1)

    for g in range(8):
        sl = slice(g * group, (g + 1) * group)
        rays = rays_ref[sl, :]
        ox = rays[:, 0:1]
        oy = rays[:, 1:2]
        oz = rays[:, 2:3]
        dx = rays[:, 3:4]
        dy = rays[:, 4:5]
        dz = rays[:, 5:6]
        # Cap at BIG: invalid eval lanes carry t_cand = BIG, which must
        # never strictly beat the no-hit bound (t_max may be +inf when
        # the kernel is driven directly without the root-AABB clip).
        t_max = jnp.minimum(rays[:, 6:7], BIG)
        t_lo = rays[:, 7:8] if any_hit else None
        # Dead/empty groups (no listed supers: all-dead rays, or live
        # rays missing the whole model) pay only these two writes — the
        # [G, 128] scratch init, the walk and the epilogue reduce are
        # gated off (r5; shadow batches have many all-miss groups).
        out_t_ref[sl, :] = t_max
        out_i_ref[sl, :] = jnp.full((group, 1), -1, jnp.int32)

        def eval_cluster(w, c):
            """One [8, 128] Woop evaluation of row block ``w`` ([16, 128],
            VMEM-resident table slice or streamed buffer) for global
            cluster id ``c`` -> (t_cand, idx) with t_cand = BIG for
            invalid lanes.  Pure (no ref writes) so parallel evals stay
            independent chains.  Affine rows are folded as nested fmas
            (translation seeds the chain)."""

            def r(q):
                return w[q:q + 1, :]

            zo = ox * r(8) + (oy * r(9) + (oz * r(10) + r(11)))
            zd = dx * r(8) + (dy * r(9) + dz * r(10))
            parallel = jnp.abs(zd) <= r(12)
            den = jnp.where(parallel, 1.0, zd)
            inv = pl.reciprocal(den, approx=True)
            inv = inv * (2.0 - den * inv)
            t = -zo * inv
            xo = ox * r(0) + (oy * r(1) + (oz * r(2) + r(3)))
            xd = dx * r(0) + (dy * r(1) + dz * r(2))
            u = xo + t * xd
            yo = ox * r(4) + (oy * r(5) + (oz * r(6) + r(7)))
            yd = dx * r(4) + (dy * r(5) + dz * r(6))
            v = yo + t * yd
            mm = jnp.minimum(jnp.minimum(u, v),
                             (1.0 + 2 * EDGE_EPS) - u - v)
            valid = (mm >= -EDGE_EPS) & (~parallel) & (t > T_EPS)
            if any_hit:
                valid = valid & (t > t_lo)
            return jnp.where(valid, t, BIG), c * CLUSTER + lane

        def entry_body(j, carry, g=g, sl=sl):
            bits0 = bits_ref[g, j]
            s_idx = clist_ref[g, j]
            base = s_idx * SUPER
            if stream:
                slot = jax.lax.rem(j, 2)
                _group_dma(g, j, slot).wait()
                pend_ref[0, 0] = -1

                @pl.when(j + 1 < counts_ref[g, 0])
                def _prefetch(g=g, j=j):
                    _group_dma(g, j + 1, jax.lax.rem(j + 1, 2)).start()
                    pend_ref[0, 0] = j + 1

            def bits_cond(b):
                return b != 0

            def bits_body(b):
                # Extract up to ``ewidth`` set bits; exhausted slots
                # duplicate the previous cluster (the strict t< merge
                # makes the duplicate a no-op).  All ewidth evals are
                # independent chains — one merge pass at the end keeps
                # the sequential ascending-index semantics.
                ks = []
                prev_k = jnp.int32(0)
                for w in range(ewidth):
                    lsb = b & (-b)
                    k = _popcount16(lsb - 1)
                    if w == 0:
                        k_w = k
                        b = b & (b - 1)
                    else:
                        has = b != 0
                        k_w = jnp.where(has, k, prev_k)
                        b = jnp.where(has, b & (b - 1), 0)
                    ks.append(k_w)
                    prev_k = k_w

                if stream:
                    evals = [eval_cluster(wbuf_ref[slot, k], base + k)
                             for k in ks]
                else:
                    evals = [eval_cluster(woop_ref[base + k], base + k)
                             for k in ks]
                bt = bt_ref[sl, :]
                bi = bi_ref[sl, :]
                for t_w, i_w in evals:
                    w_m = t_w < bt          # t_w = BIG when invalid
                    bt = jnp.where(w_m, t_w, bt)
                    bi = jnp.where(w_m, i_w, bi)
                bt_ref[sl, :] = bt
                bi_ref[sl, :] = bi
                return b

            jax.lax.while_loop(bits_cond, bits_body, bits0)
            return carry

        # (Tried and rejected, r4: a phase-2 entry gate — walk 4 entries,
        # one vector->scalar sync for the group's weakest best-t, then
        # skip entries whose ordered entry distance exceeds it.  Measured
        # 3-6% SLOWER on bounces 3-4: the max-over-group bound is
        # dominated by whichever ray is still unresolved, so the gate
        # almost never fires while its sync + per-entry compare always
        # cost.  Per-ray gates need per-ray granularity, which is the
        # tiled walk's regime, not this one.)
        @pl.when(counts_ref[g, 0] > 0)
        def _walk_group(g=g, sl=sl, t_max=t_max):
            bt_ref[sl, :] = jnp.broadcast_to(t_max, (group, CLUSTER))
            bi_ref[sl, :] = jnp.full((group, CLUSTER), jnp.int32(2 ** 30),
                                     jnp.int32)
            if stream:
                _group_dma(g, 0, 0).start()   # warm up this group's pipe
                pend_ref[0, 0] = 0
            jax.lax.fori_loop(0, counts_ref[g, 0], entry_body, 0)
            if stream:
                # Every entry body runs (no gate), so each issued DMA is
                # normally waited in-body; the drain is a guard for the
                # scratch semaphore across groups/grid steps.
                @pl.when(pend_ref[0, 0] >= 0)
                def _drain(g=g):
                    jp = pend_ref[0, 0]
                    _group_dma(g, jp, jax.lax.rem(jp, 2)).wait()
                    pend_ref[0, 0] = -1

            best_t = bt_ref[sl, :]
            best_i = bi_ref[sl, :]
            t_min = jnp.min(best_t, axis=1, keepdims=True)
            hit = t_min < t_max
            i_cand = jnp.where(best_t <= t_min, best_i, jnp.int32(2 ** 30))
            i_min = jnp.min(i_cand, axis=1, keepdims=True)
            out_t_ref[sl, :] = t_min
            out_i_ref[sl, :] = jnp.where(hit, i_min, -1)


@functools.partial(jax.jit, static_argnames=("interpret", "any_hit",
                                             "group", "ewidth", "stream"))
def _launch_pgwalk2(clist, bits, counts, rays, woop,
                    interpret: bool, any_hit: bool = False,
                    group: int = GROUP, ewidth: int = 2,
                    stream: bool = False):
    n_groups = rays.shape[0] // group
    assert n_groups % 8 == 0
    s = clist.shape[1]
    if stream:
        assert woop.shape[0] % SUPER == 0, \
            "stream mode needs the Woop table padded to whole supers"
    kernel = functools.partial(_pgwalk2_kernel, any_hit=any_hit,
                               group=group, ewidth=ewidth, stream=stream)
    scratch = [pltpu.VMEM((8 * group, CLUSTER), jnp.float32),
               pltpu.VMEM((8 * group, CLUSTER), jnp.int32)]
    if stream:
        scratch += [
            pltpu.VMEM((2, SUPER, 16, CLUSTER), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1, 1), jnp.int32),
        ]
    return pl.pallas_call(
        kernel,
        grid=(n_groups // 8,),
        in_specs=[
            pl.BlockSpec((8, s), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, s), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8 * group, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if stream else pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_groups * group, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_groups * group, 1), jnp.int32),
        ],
        out_specs=[
            pl.BlockSpec((8 * group, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * group, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(clist, bits, counts, rays, woop)


def _pgwalk_kernel(mask_ref, rays_ref, woop_ref, out_t_ref, out_i_ref,
                   bt_ref, bi_ref, *, s_count: int, any_hit: bool = False):
    """Per-group cluster walk.  mask_ref [8, S] int32 SMEM (row g = group
    g's per-super cluster bit words); rays_ref [8*GROUP, 8] VMEM; woop_ref
    [C, 16, 128] VMEM; outs [8*GROUP, 1]; bt/bi [8*GROUP, 128] VMEM
    scratch.  One program = 8 groups = 64 rays; the 8 group walks are
    statically unrolled so every SMEM list read indexes a static row
    (the compile-proven pattern — dynamic-row SMEM reads inside dynamic
    fori crashed Mosaic, ROADMAP r2)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (GROUP, CLUSTER), 1)

    for g in range(8):
        sl = slice(g * GROUP, (g + 1) * GROUP)
        rays = rays_ref[sl, :]
        ox = rays[:, 0:1]
        oy = rays[:, 1:2]
        oz = rays[:, 2:3]
        dx = rays[:, 3:4]
        dy = rays[:, 4:5]
        dz = rays[:, 5:6]
        t_max = rays[:, 6:7]
        t_lo = rays[:, 7:8] if any_hit else None  # any-hit t_min bound
        bt_ref[sl, :] = jnp.broadcast_to(t_max, (GROUP, CLUSTER))
        bi_ref[sl, :] = jnp.full((GROUP, CLUSTER), jnp.int32(2 ** 30),
                                 jnp.int32)

        def super_body(j, carry, g=g, sl=sl, ox=ox, oy=oy, oz=oz,
                       dx=dx, dy=dy, dz=dz):
            m = mask_ref[g, j]

            @pl.when(m > 0)
            def _s():
                def cl_body(k, c2):
                    @pl.when(((m >> k) & 1) > 0)
                    def _c():
                        c = j * SUPER + k
                        best_t = bt_ref[sl, :]
                        best_i = bi_ref[sl, :]
                        w = woop_ref[c]                   # [16, 128]

                        def r(q):
                            return w[q:q + 1, :]

                        zo = ox * r(8) + oy * r(9) + oz * r(10) + r(11)
                        zd = dx * r(8) + dy * r(9) + dz * r(10)
                        parallel = jnp.abs(zd) <= r(12)
                        den = jnp.where(parallel, 1.0, zd)
                        inv = pl.reciprocal(den, approx=True)
                        inv = inv * (2.0 - den * inv)     # Newton refine
                        t = -zo * inv
                        xo = ox * r(0) + oy * r(1) + oz * r(2) + r(3)
                        xd = dx * r(0) + dy * r(1) + dz * r(2)
                        u = xo + t * xd
                        yo = ox * r(4) + oy * r(5) + oz * r(6) + r(7)
                        yd = dx * r(4) + dy * r(5) + dz * r(6)
                        v = yo + t * yd
                        mm = jnp.minimum(jnp.minimum(u, v),
                                         (1.0 + 2 * EDGE_EPS) - u - v)
                        valid = (
                            (mm >= -EDGE_EPS)
                            & (~parallel)
                            & (t > T_EPS)
                            & (t < best_t)
                        )
                        if any_hit:
                            valid = valid & (t > t_lo)
                        bi_ref[sl, :] = jnp.where(
                            valid, c * CLUSTER + lane, best_i)
                        bt_ref[sl, :] = jnp.where(valid, t, best_t)
                    return c2

                jax.lax.fori_loop(0, SUPER, cl_body, 0)
            return carry

        jax.lax.fori_loop(0, s_count, super_body, 0)

        # Per-group epilogue: lane min + smallest-index tie rule.
        best_t = bt_ref[sl, :]
        best_i = bi_ref[sl, :]
        t_min = jnp.min(best_t, axis=1, keepdims=True)
        hit = t_min < t_max
        i_cand = jnp.where(best_t <= t_min, best_i, jnp.int32(2 ** 30))
        i_min = jnp.min(i_cand, axis=1, keepdims=True)
        out_t_ref[sl, :] = t_min
        out_i_ref[sl, :] = jnp.where(hit, i_min, -1)


@functools.partial(jax.jit, static_argnames=("interpret", "any_hit"))
def _launch_pgwalk(mask, rays, woop, interpret: bool,
                   any_hit: bool = False):
    n_groups = rays.shape[0] // GROUP
    assert n_groups % 8 == 0
    s = mask.shape[1]
    kernel = functools.partial(_pgwalk_kernel, s_count=s, any_hit=any_hit)
    return pl.pallas_call(
        kernel,
        grid=(n_groups // 8,),
        in_specs=[
            pl.BlockSpec((8, s), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8 * GROUP, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_groups * GROUP, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_groups * GROUP, 1), jnp.int32),
        ],
        out_specs=[
            pl.BlockSpec((8 * GROUP, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * GROUP, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((8 * GROUP, CLUSTER), jnp.float32),
                        pltpu.VMEM((8 * GROUP, CLUSTER), jnp.int32)],
        interpret=interpret,
    )(mask, rays, woop)


# ---------------------------------------------------------------------------
# Intersect kernel: walk the ordered super list with a shrinking-t gate.
# ---------------------------------------------------------------------------

def _intersect_kernel(counts_ref, clist_ref, elist_ref, rays_ref, cb_ref,
                      woop_ref, out_t_ref, out_i_ref, *rest,
                      tile: int, any_hit: bool, stream: bool,
                      count_evals: bool = False):
    """One ray tile vs its active superclusters of one model.

    counts_ref: [8, 1] int32 SMEM (8-row window, this tile's row is
                program_id % 8) — number of active supers;
    clist_ref:  [8, S] int32 SMEM — near-to-far ordered super indices;
    elist_ref:  [8, S] f32 SMEM — matching super entry distances;
    rays_ref:   [tile, 8] VMEM — ox oy oz dx dy dz t_max pad;
    cb_ref:     [S, 8, 16] VMEM — per-super cluster AABBs (rows: min xyz,
                max xyz, pad, pad; SUPER=16 clusters on the lane axis);
                padded clusters carry inverted boxes so they never pass;
    woop_ref:   [C, 16, 128] VMEM — per-cluster Woop rows (13 used);
                dynamic indexing stays on the untiled leading axis;
    scratch:    bt/bi [tile, 128] running lane minima; rb [tile, 1] f32
                per-ray best t (refreshed once per processed super — the
                cluster slab gate may see it one super stale, which only
                admits extra clusters, never drops hits); tbm [1, 1] f32
                SMEM (tile best-t gate: max over rays of rb); word [1, 1]
                int32 SMEM (per-super cluster bits); done [1, 1] int32
                SMEM (any-hit mode: 1 once every ray is resolved).

    ``any_hit=True`` is the shadow-ray mode (``CheckLightOccluded``,
    raytrace_compute.glsl:167-176): after each processed super the kernel
    checks whether every ray already found *some* hit inside its t_max (or
    is dead) and, once true, skips all remaining supers at one scalar
    compare each — the first-accepted-hit early-out the closest-hit walk
    cannot take.

    The gate is the TPU analog of ordered BVH descent: supers arrive
    near-to-far, so once every ray in the tile has a hit, tbm collapses to
    the tile's worst best-t and all farther supers skip at ~1 scalar
    compare each (``Intersects`` early-out parity,
    ray_intersects.glsl:99-133).

    ``stream=True`` is the large-scene mode (Airplane-class, > ~218k
    triangles): the Woop table stays in HBM and each processed super's
    16-cluster block (128 KB) is DMA'd into a double-buffered VMEM
    scratch, prefetching the NEXT list entry while the current one
    computes — the ordered super list is its own prefetch schedule.  The
    gates are monotone (elist ascends, tbm only shrinks, any-hit ``done``
    is sticky), so issuing super j+1's DMA inside super j's gated body
    pairs every issue with exactly one wait; ``pend`` tracks the one
    possibly-dangling prefetch for the post-loop drain (scratch
    semaphores persist across grid steps — a leftover signal would hand
    the next tile a stale block).  stream_refs = (wbuf [2, SUPER, 16,
    CLUSTER] VMEM, dma_sem [2], pend [1,1] SMEM).

    ``count_evals=True`` (instrumentation, off in production) adds an
    SMEM counters output [8, 2] int32 — per tile: supers processed (gate
    passed) and clusters evaluated (popcount of the per-super cluster
    word) — the ground truth for the roofline analysis
    (tools/eval_counts.py, ROADMAP).
    """
    rest = list(rest)
    ctr_ref = rest.pop(0) if count_evals else None
    ec_ref = rest.pop() if count_evals else None
    bt_ref, bi_ref, rb_ref, tbm_ref, word_ref, done_ref = rest[:6]
    stream_refs = rest[6:]
    if stream:
        wbuf_ref, dma_sem, pend_ref = stream_refs

    row = jax.lax.rem(pl.program_id(0), 8)
    if count_evals:
        ec_ref[0, 0] = 0
        ec_ref[0, 1] = 0
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, CLUSTER), 1)
    ox = rays_ref[:, 0:1]
    oy = rays_ref[:, 1:2]
    oz = rays_ref[:, 2:3]
    dx = rays_ref[:, 3:4]
    dy = rays_ref[:, 4:5]
    dz = rays_ref[:, 5:6]
    t_max = rays_ref[:, 6:7]
    t_lo = rays_ref[:, 7:8] if any_hit else None  # any-hit t_min bound

    # Default outputs; overwritten when the tile has active supers.  Tiles
    # whose rays are all dead (t_max == 0, set by the integrator for
    # terminated paths) cost only these two writes.
    out_t_ref[:] = t_max
    out_i_ref[:] = jnp.full((tile, 1), -1, jnp.int32)

    if stream:
        pend_ref[0, 0] = -1  # scratch persists across grid steps: reset

        def woop_dma(j, slot):
            s_idx = clist_ref[row, j]
            return pltpu.make_async_copy(
                woop_ref.at[pl.ds(s_idx * SUPER, SUPER)],
                wbuf_ref.at[slot],
                dma_sem.at[slot],
            )

    def super_body(j, carry):
        # Shrinking-t gate: skip the super outright when its nearest entry
        # is beyond every ray's current best hit (and, in any-hit mode,
        # once every ray is resolved).
        gate = elist_ref[row, j] < tbm_ref[0, 0]
        if any_hit:
            gate = gate & (done_ref[0, 0] == 0)

        @pl.when(gate)
        def _do_super():
            s_idx = clist_ref[row, j]
            if stream:
                # Monotone gates guarantee block j's DMA was issued (by
                # body j-1 or the pre-loop warmup).  Wait it, then start
                # j+1's prefetch so it rides under this super's compute.
                slot = jax.lax.rem(j, 2)
                woop_dma(j, slot).wait()
                pend_ref[0, 0] = -1

                @pl.when(j + 1 < counts_ref[row, 0])
                def _prefetch():
                    woop_dma(j + 1, jax.lax.rem(j + 1, 2)).start()
                    pend_ref[0, 0] = j + 1
            b = cb_ref[s_idx]                     # [8, 16]
            ray_best = rb_ref[:]                  # [tile, 1]

            def br(q):
                return b[q:q + 1, :]              # [1, 16]

            inv_x = 1.0 / dx
            inv_y = 1.0 / dy
            inv_z = 1.0 / dz
            t0x = (br(0) - ox) * inv_x
            t1x = (br(3) - ox) * inv_x
            t0y = (br(1) - oy) * inv_y
            t1y = (br(4) - oy) * inv_y
            t0z = (br(2) - oz) * inv_z
            t1z = (br(5) - oz) * inv_z
            t_near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.minimum(t0z, t1z))
            t_far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                            jnp.maximum(t0y, t1y)),
                                jnp.maximum(t0z, t1z))
            # Entry bound: max(t_near, 0), NOT exit-if-inside (the
            # reference IntersectsBox quirk, ray_intersects.glsl:49-58):
            # a box entered from INSIDE whose exit exceeds the range
            # bound can still hold nearer candidates - the exit is no
            # lower bound on candidate t; 0 is.
            sel = jnp.maximum(t_near, 0.0)
            enters = (t_near <= t_far) & (t_far >= 0.0) & (sel < ray_best)
            occ16 = jnp.any(enters, axis=0, keepdims=True)        # [1, 16]
            # Exact powers of two via integer shifts (jnp.exp2 is inexact
            # on some backends — exp2(15) = 32767.98 — and the truncating
            # int cast below would then drop the top cluster bits).
            pw = (jnp.int32(1) << jax.lax.broadcasted_iota(
                jnp.int32, (1, SUPER), 1)).astype(jnp.float32)
            word_ref[0, 0] = jnp.sum(
                jnp.where(occ16, pw, 0.0)).astype(jnp.int32)
            w_bits = word_ref[0, 0]
            if count_evals:
                ec_ref[0, 0] = ec_ref[0, 0] + 1
                ec_ref[0, 1] = ec_ref[0, 1] + jnp.sum(
                    jnp.where(occ16, 1.0, 0.0)).astype(jnp.int32)

            for k in range(SUPER):
                @pl.when(((w_bits >> k) & 1) > 0)
                def _cluster(k=k):
                    c = s_idx * SUPER + k
                    best_t = bt_ref[:]
                    best_i = bi_ref[:]
                    base = c * CLUSTER
                    if stream:
                        w = wbuf_ref[jax.lax.rem(j, 2), k]   # [16, 128]
                    else:
                        w = woop_ref[c]           # [16, 128]

                    def r(q):
                        return w[q:q + 1, :]      # [1, 128]

                    # NOTE: tried as six thin [tile,4]x[4,128] MXU dots —
                    # 6x SLOWER on v5e (Mosaic lowers tiny-K dots badly);
                    # broadcast FMAs on the VPU are the right form here.
                    zo = ox * r(8) + oy * r(9) + oz * r(10) + r(11)
                    zd = dx * r(8) + dy * r(9) + dz * r(10)
                    parallel = jnp.abs(zd) <= r(12)
                    den = jnp.where(parallel, 1.0, zd)
                    inv = pl.reciprocal(den, approx=True)
                    # One Newton step: the approx reciprocal is ~8-bit;
                    # without refinement the u/v window test rejects true
                    # edge hits (observed: kernel picks farther winners).
                    inv = inv * (2.0 - den * inv)
                    t = -zo * inv
                    xo = ox * r(0) + oy * r(1) + oz * r(2) + r(3)
                    xd = dx * r(0) + dy * r(1) + dz * r(2)
                    u = xo + t * xd
                    yo = ox * r(4) + oy * r(5) + oz * r(6) + r(7)
                    yd = dx * r(4) + dy * r(5) + dz * r(6)
                    v = yo + t * yd

                    # Barycentric window as a single min-compare: u, v and
                    # (1 + 2e) - u - v all >= -e.
                    m = jnp.minimum(jnp.minimum(u, v),
                                    (1.0 + 2 * EDGE_EPS) - u - v)
                    valid = (
                        (m >= -EDGE_EPS)
                        & (~parallel)
                        & (t > T_EPS)
                        & (t < best_t)
                    )
                    if any_hit:
                        valid = valid & (t > t_lo)
                    bi_ref[:] = jnp.where(valid, base + lane, best_i)
                    bt_ref[:] = jnp.where(valid, t, best_t)

            # Tighten the gates: per-ray best t (one lane reduce, shared
            # by the next super's cluster slab) and its max over rays.
            # Rays that miss everything keep t_max (inf) and disable the
            # tile gate — correct, just slower at silhouettes.
            rb = jnp.min(bt_ref[:], axis=1, keepdims=True)
            rb_ref[:] = rb
            tbm_ref[0, 0] = jnp.max(rb)
            if any_hit:
                # A ray is resolved when it found some hit inside t_max OR
                # is dead (t_max <= 0; dead lanes have rb == t_max == 0, so
                # the strict compare alone would never let mixed live/dead
                # tiles take the early-out).
                done_ref[0, 0] = jnp.all(
                    (rb < t_max) | (t_max <= 0.0)).astype(jnp.int32)

        return carry

    @pl.when(counts_ref[row, 0] > 0)
    def _process():
        bt_ref[:] = jnp.broadcast_to(t_max, (tile, CLUSTER))
        bi_ref[:] = jnp.full((tile, CLUSTER), jnp.int32(2 ** 30), jnp.int32)
        rb_ref[:] = t_max
        tbm_ref[0, 0] = BIG
        if any_hit:
            done_ref[0, 0] = 0
        if stream:
            woop_dma(0, 0).start()   # warm up the pipeline
            pend_ref[0, 0] = 0
        jax.lax.fori_loop(0, counts_ref[row, 0], super_body, 0)
        if stream:
            # Drain the one possibly-unwaited prefetch (issued by the last
            # gated body, gated off before its wait) so the semaphore is
            # clean for the next grid step.
            @pl.when(pend_ref[0, 0] >= 0)
            def _drain():
                jp = pend_ref[0, 0]
                woop_dma(jp, jax.lax.rem(jp, 2)).wait()
                pend_ref[0, 0] = -1
        best_t = bt_ref[:]
        best_i = bi_ref[:]
        t_min = jnp.min(best_t, axis=1, keepdims=True)
        hit = t_min < t_max
        # Smallest triangle index among lanes attaining the minimum.
        i_cand = jnp.where(best_t <= t_min, best_i, jnp.int32(2 ** 30))
        i_min = jnp.min(i_cand, axis=1, keepdims=True)
        out_t_ref[:] = t_min
        out_i_ref[:] = jnp.where(hit, i_min, -1)

    if count_evals:
        ctr_ref[row, 0] = ec_ref[0, 0]
        ctr_ref[row, 1] = ec_ref[0, 1]


@functools.partial(jax.jit,
                   static_argnames=("tile", "interpret", "any_hit",
                                    "stream", "count_evals"))
def _launch(counts, clist, elist, rays, cbounds, woop, tile: int,
            interpret: bool, any_hit: bool = False, stream: bool = False,
            count_evals: bool = False):
    """counts [n_tiles, 1], clist/elist [n_tiles, S], rays [n_tiles*tile, 8],
    cbounds [S, 8, 16], woop [C, 16, 128]; one tile per program; SMEM
    windows are 8-column blocks (Mosaic block-shape constraint), the kernel
    reads its own column via program_id % 8.

    ``stream=True``: the Woop table stays in HBM (its cluster count must
    be a multiple of SUPER) and per-super blocks are double-buffer DMA'd
    by the kernel — the Airplane-class large-scene mode."""
    n_tiles = rays.shape[0] // tile
    assert n_tiles % 8 == 0
    s = clist.shape[1]
    if stream:
        assert woop.shape[0] % SUPER == 0, \
            "stream mode needs the Woop table padded to whole supers"
    kernel = functools.partial(_intersect_kernel, tile=tile, any_hit=any_hit,
                               stream=stream, count_evals=count_evals)
    woop_space = pl.ANY if stream else pltpu.VMEM
    scratch = [
        pltpu.VMEM((tile, CLUSTER), jnp.float32),
        pltpu.VMEM((tile, CLUSTER), jnp.int32),
        pltpu.VMEM((tile, 1), jnp.float32),
        pltpu.SMEM((1, 1), jnp.float32),
        pltpu.SMEM((1, 1), jnp.int32),
        pltpu.SMEM((1, 1), jnp.int32),
    ]
    if stream:
        scratch += [
            pltpu.VMEM((2, SUPER, 16, CLUSTER), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1, 1), jnp.int32),
        ]
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles * tile, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles * tile, 1), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((tile, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if count_evals:
        out_shape.append(jax.ShapeDtypeStruct((n_tiles, 2), jnp.int32))
        out_specs.append(pl.BlockSpec((8, 2), lambda i: (i // 8, 0),
                                      memory_space=pltpu.SMEM))
        scratch.append(pltpu.SMEM((1, 2), jnp.int32))
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, 1), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, s), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, s), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # Full cluster-AABB table: its leading dim is the scene's
            # super count, NOT the list width s (the binned mode passes
            # 1-slot lists whose entries index anywhere in the table).
            pl.BlockSpec((cbounds.shape[0], 8, SUPER), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=woop_space),
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(counts, clist, elist, rays, cbounds, woop)


# ---------------------------------------------------------------------------
# Model-hit wrapper (the mesh_hit_fn strategy entry point)
# ---------------------------------------------------------------------------

def _exact_refine(scene, idx, origins, dirs):
    """Exact single-triangle Moller-Trumbore for the kernel's winners so
    t/u/v precision matches the dense path.  origins/dirs [3, N]."""
    from srt_tpu.ops import vec

    i = jnp.maximum(idx, 0)
    v0 = scene.tri_v0[i].T                                  # [3, N]
    e1 = scene.tri_v1[i].T - v0
    e2 = scene.tri_v2[i].T - v0
    h = vec.cross(dirs, e2)
    a = jnp.sum(e1 * h, axis=0)
    parallel = jnp.abs(a) < intersect.MT_PARALLEL_EPS
    f = 1.0 / jnp.where(parallel, 1.0, a)
    s = origins - v0
    u = f * jnp.sum(s * h, axis=0)
    q = vec.cross(s, e1)
    v = f * jnp.sum(dirs * q, axis=0)
    t = f * jnp.sum(e2 * q, axis=0)
    return t, u, v


# Largest per-model Woop table kept VMEM-resident: ~8 KB per 128-triangle
# cluster on a 16 MB-VMEM chip leaves ~1,700 clusters (~218k triangles)
# alongside the kernel's scratch; larger models stream from HBM.
STREAM_THRESHOLD_CLUSTERS = 1700


def pallas_model_hit(scene, b: int, origins, dirs, t_best,
                     tile: int = DEFAULT_TILE, any_hit: bool = False,
                     refine: bool = True, stream=None,
                     binned: bool = False, pair_factor: int = 8,
                     count_evals: bool = False, t_min: float = 0.0):
    """Closest hit of rays against model ``b``; drop-in for the dense/bvh
    strategies in models/mesh.py.  origins/dirs are [3, N] (component-first
    wavefront layout, ops/vec.py).  Returns (t [N], tri_idx [N], u, v).

    ``any_hit=True`` is the shadow-ray fast path: skips the exact (t,u,v)
    refinement (only the hit/miss answer and the kernel's candidate t are
    returned).  ``refine=False`` returns the kernel's fp32 candidate t with
    zero u/v — the multi-model caller (models/mesh.py) re-derives exact
    (t, u, v) once for the cross-model winner, saving per-model vertex
    gathers (row gathers cost ~ms per 256k rays on TPU).

    ``binned=True`` switches to RAY-SUPERCLUSTER BINNED traversal — the
    incoherent-bounce mode: a per-ray cull writes each ray's super
    occupancy, (ray, super) pairs are grouped super-major into whole
    kernel tiles (each tile = 128 rays x ONE super), and per-ray results
    are segment-min combined.  Work becomes O(sum of per-ray footprints)
    instead of O(tiles x union-of-128-footprints); the price is the loss
    of the cross-super shrinking-t gate, which primaries rely on — keep
    the default tiled walk for coherent bounces.  Pairs are binned at
    GROUP=8-consecutive-ray granularity (the bounce sort makes those
    near-coherent; per-ray pairs were measured glue-bound — transpose/
    cumsum/scatter/gather each cost tens of ms at 262k rays on this
    backend, and grouping cuts all four 8x).  Pair capacity is the
    static ``pair_factor`` slots/group; if a launch needs more, a
    ``lax.cond`` falls back to the tiled walk, so results are exact
    either way (rays with footprints beyond capacity are never silently
    truncated).

    Differentiability: the kernel is a pure *candidate search* — its
    outputs are the discrete winning triangle id and an fp32 candidate t
    that is always replaced by the exact refine for accepted hits.  Every
    kernel operand is therefore wrapped in ``stop_gradient`` and gradients
    flow solely through the refine (here or in models/mesh.py), which
    differentiates t/u/v w.r.t. vertices, frames, and ray geometry — the
    path-space gradient SURVEY.md section 7.7 specifies for the traversal
    step (reference hot loop: ray_intersects.glsl:99-133)."""
    from srt_tpu.models.mesh import transform_rays

    if scene.woop is None:
        raise ValueError(
            "scene was uploaded without Pallas tables; use "
            "flatten_models(..., pad_to=128) + upload()"
        )
    lo = scene.model_first_tri[b]
    count = scene.model_padded_tri_count[b]
    assert count % CLUSTER == 0
    c_lo = lo // CLUSTER
    n_clusters = count // CLUSTER
    # Airplane-class models exceed the VMEM-resident table: switch to the
    # HBM-streaming kernel (per-super double-buffered DMA; see
    # _intersect_kernel).  ``stream`` overrides for tests/tuning.
    if stream is None:
        stream = n_clusters > STREAM_THRESHOLD_CLUSTERS

    o_m, d_m = transform_rays(scene.frames[b], origins, dirs)
    n = origins.shape[1]
    pad = (-n) % (tile * 8)  # n_tiles must be a multiple of the SMEM window
    npad = n + pad

    sg = jax.lax.stop_gradient

    # Root-AABB t-clip: a ray's hits can only lie inside the model's
    # bounding box, so its traversal window ends at the box-exit distance.
    # Miss-bound bounce rays (t_max = inf) and shadow rays toward far
    # lights get tight per-ray bounds, which the cull occupancy, the
    # per-ray cluster gate, and the shrinking-t gate all exploit; rays
    # that miss the box entirely become dead lanes (t_max = 0) and their
    # tiles are skipped outright.  (NaN from an on-boundary origin with an
    # axis-parallel direction conservatively kills the ray — measure-zero,
    # same convention as the slab kernels.)
    root_lo = sg(jnp.min(scene.cluster_min[c_lo:c_lo + n_clusters], axis=0))
    root_hi = sg(jnp.max(scene.cluster_max[c_lo:c_lo + n_clusters], axis=0))
    inv_d = 1.0 / sg(d_m)
    tb0 = (root_lo[:, None] - sg(o_m)) * inv_d
    tb1 = (root_hi[:, None] - sg(o_m)) * inv_d
    bt_near = jnp.max(jnp.minimum(tb0, tb1), axis=0)
    bt_far = jnp.min(jnp.maximum(tb0, tb1), axis=0)
    t_clip = jnp.where((bt_near <= bt_far) & (bt_far >= 0.0),
                       bt_far * (1.0 + 1e-4) + 1e-3, 0.0)
    t_eff = jnp.minimum(
        jnp.broadcast_to(jnp.asarray(t_best, jnp.float32), (n,)), t_clip)

    # Any-hit mode threads the caller's t_min lower bound into the kernel
    # (rays column 7) so every mode — tiled early-out, binned, pgwalk —
    # applies the epsilon to candidates identically BEFORE selecting the
    # returned hit: a sub-t_min self-hit can no longer satisfy the
    # early-out / win the min and flip occlusion between modes (r3
    # advisor).  Closest-hit keeps the T_EPS-only kernel test so all
    # traversal strategies (dense/bvh/pallas) stay bit-compatible.
    t_min_any = t_min if any_hit else 0.0

    def padded(x, fill=0.0):
        return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad),),
                       constant_values=fill)

    o_p = padded(o_m)
    d_p = padded(d_m, 1.0)
    t_p = padded(t_eff, 0.0)

    # Assembled component-first ([8, Np], lane-dense) then transposed once
    # into the kernel's [Np, 8] operand layout.  stop_gradient: the kernels
    # are non-differentiable candidate searches; gradients flow through the
    # exact refine of the winner only (see docstring).
    rays8 = sg(jnp.concatenate(
        [o_p, d_p, t_p[None, :],
         jnp.broadcast_to(jnp.asarray(t_min_any, jnp.float32),
                          (1, npad))], axis=0
    ).T)
    woop_slice = sg(scene.woop[c_lo:c_lo + n_clusters])
    if stream:
        # The streaming DMA copies whole SUPER-cluster blocks: pad the
        # table to full supers (zero blocks: eps row 0 -> |zd| <= 0 is
        # always true -> parallel -> never a hit; their cluster AABBs are
        # NaN boxes below, so they are bit-gated off anyway).
        w_pad = (-n_clusters) % SUPER
        if w_pad:
            woop_slice = jnp.pad(woop_slice,
                                 ((0, w_pad), (0, 0), (0, 0)))

    # Super/cluster AABB tables for the cull + intersect kernels.  Clusters
    # pad to a full super; the padding for the per-cluster slab table is
    # NaN boxes (every slab comparison is false -> guaranteed miss, for any
    # ray direction — an "inverted" box would slab-test as a huge one), so
    # the bit-gated Woop branch never reads past the model's real cluster
    # range.  The super min/max reduction instead pads with +/-BIG
    # identities so partial supers keep their real bounds.
    cmin = sg(scene.cluster_min[c_lo:c_lo + n_clusters])
    cmax = sg(scene.cluster_max[c_lo:c_lo + n_clusters])
    s_count = -(-n_clusters // SUPER)  # ceil
    c_pad = s_count * SUPER - n_clusters
    cmin_n = jnp.pad(cmin, ((0, c_pad), (0, 0)), constant_values=jnp.nan)
    cmax_n = jnp.pad(cmax, ((0, c_pad), (0, 0)), constant_values=jnp.nan)
    # [S, 8, 16]: rows 0-2 min xyz, 3-5 max xyz, 6-7 pad.
    cb = jnp.concatenate([
        cmin_n.reshape(s_count, SUPER, 3).transpose(0, 2, 1),
        cmax_n.reshape(s_count, SUPER, 3).transpose(0, 2, 1),
        jnp.zeros((s_count, 2, SUPER), jnp.float32),
    ], axis=1)
    cmin_p = jnp.pad(cmin, ((0, c_pad), (0, 0)), constant_values=BIG)
    cmax_p = jnp.pad(cmax, ((0, c_pad), (0, 0)), constant_values=-BIG)
    smin = cmin_p.reshape(s_count, SUPER, 3).min(axis=1)       # [S, 3]
    smax = cmax_p.reshape(s_count, SUPER, 3).max(axis=1)
    sbounds = jnp.concatenate(
        [smin.T, smax.T, jnp.zeros((2, s_count), jnp.float32)], axis=0
    )                                                          # [8, S]

    interpret = jax.default_backend() != "tpu"
    if count_evals and binned:
        raise ValueError("count_evals instrumentation covers the tiled "
                         "walk only")
    pg_group, pg_width = GROUP, 2
    if isinstance(binned, str) and binned.startswith("pg2:"):
        parts = binned.split(":")
        pg_group = int(parts[1])
        if len(parts) > 2:
            pg_width = int(parts[2])
        binned = "pg2"
    if binned in ("pg", "pg2") and s_count > 1 \
            and (binned == "pg2" or not stream):
        # Per-group walk: cluster-occupancy bit masks from the gmask cull
        # drive a per-8-ray-group cluster walk — no pair expansion, no
        # gather/scatter, rays stay in wavefront order (see the pgwalk
        # section above).  "pg2" adds compacted index-ordered lists and
        # the W-wide ILP eval (the production variant; r5 also handles
        # HBM-streamed Airplane-class tables via per-entry double-buffer
        # DMA — the cull only ever touches the VMEM-resident AABB
        # tables, so it is unchanged); "pg" keeps the mask-scan walk for
        # comparison (VMEM-resident only).
        c_cpad = -(-n_clusters // CHUNK_C) * CHUNK_C
        nan_pad = ((0, c_cpad - n_clusters), (0, 0))
        cmin_c = jnp.pad(cmin, nan_pad, constant_values=jnp.nan)
        cmax_c = jnp.pad(cmax, nan_pad, constant_values=jnp.nan)
        cb8 = jnp.concatenate(
            [cmin_c.T, cmax_c.T, jnp.zeros((2, c_cpad), jnp.float32)],
            axis=0)                                        # [8, Cp]
        c_idx = jnp.arange(c_cpad)
        # Exact powers of two via integer shifts: jnp.exp2 is INEXACT on
        # this backend (exp2(15) = 32767.98) and the truncating int cast
        # after the bitpack matmul would silently drop bits.
        pow2 = (jnp.int32(1) << (c_idx % SUPER)).astype(jnp.float32)
        w_bp = jnp.where(
            (c_idx[:, None] < n_clusters)
            & (c_idx[:, None] // SUPER
               == jnp.arange(s_count)[None, :]),
            pow2[:, None], 0.0).astype(jnp.float32)        # [Cp, S]
        if binned == "pg2":
            clist, bits, counts = _launch_cull_pg2(
                rays8, cb8, w_bp, tile, interpret,
                group=pg_group)
            out_t, out_i = _launch_pgwalk2(clist, bits, counts,
                                           rays8, woop_slice, interpret,
                                           any_hit=any_hit,
                                           group=pg_group,
                                           ewidth=pg_width,
                                           stream=stream)
        else:
            mask = _launch_cull_gmask(rays8, cb8, w_bp, tile, interpret)
            out_t, out_i = _launch_pgwalk(mask, rays8, woop_slice,
                                          interpret, any_hit=any_hit)
    elif binned and s_count > 1 and not stream:
        e_group = _launch_cull_perray(rays8, sbounds, tile, interpret)
        n_groups = npad // GROUP
        gpt = tile // GROUP
        p_cap = _pair_capacity(n_groups, s_count, gpt, pair_factor)
        pair_grp, tile_super, tile_counts, total = _binned_pairs(
            e_group, gpt, p_cap)
        # Group-blocked ray rows: one gather row = GROUP whole rays.
        rays_grp = rays8.reshape(n_groups, GROUP * 8)
        dead_grp = jnp.tile(
            jnp.array([0., 0., 0., 1., 1., 1., 0., 0.], jnp.float32),
            (1, GROUP))
        rays_grp_ext = jnp.concatenate([rays_grp, dead_grp], axis=0)
        # Per-pair-slot ray ids for the segment-min combine (padding
        # groups map to the npad.. overflow rows of the seg buffers).
        pair_ray = (pair_grp[:, None] * GROUP + jnp.arange(
            GROUP, dtype=jnp.int32)[None, :]).reshape(-1)
        miss_i32 = jnp.int32(2 ** 30)

        def _run_binned(_):
            pr = rays_grp_ext[pair_grp].reshape(p_cap * GROUP, 8)
            elist0 = jnp.zeros((p_cap // gpt, 1), jnp.float32)
            pt, pi = _launch(tile_counts, tile_super, elist0, pr, cb,
                             woop_slice, tile, interpret, any_hit=any_hit,
                             stream=False)
            pt, pi = pt[:, 0], pi[:, 0]
            pt = jnp.where(pi >= 0, pt, jnp.inf)
            seg_t = jnp.full((npad + GROUP,), jnp.inf).at[pair_ray].min(pt)
            # Winner = smallest triangle index among pairs attaining the
            # per-ray min t — the tiled kernel's WITHIN-super lane tie
            # rule.  ACROSS supers the tiled walk's strict per-lane
            # ``t < best_t`` update lets the nearest-ENTRY super keep an
            # exact-t tie instead; the two modes are therefore identical
            # up to exact fp32 t ties across superclusters (measure-zero;
            # the refined u/v/normal can differ there).
            win = (pi >= 0) & (pt <= seg_t[pair_ray])
            seg_i = jnp.full((npad + GROUP,), miss_i32).at[pair_ray].min(
                jnp.where(win, pi, miss_i32))
            hit_m = seg_i[:npad] < miss_i32
            t_out = jnp.where(hit_m, seg_t[:npad], rays8[:, 6])[:, None]
            i_out = jnp.where(hit_m, seg_i[:npad], -1)[:, None]
            return t_out, i_out

        def _run_tiled(_):
            clist, elist, counts = _launch_cull(rays8, sbounds, tile,
                                                interpret)
            return _launch(counts, clist, elist, rays8, cb, woop_slice,
                           tile, interpret, any_hit=any_hit, stream=False)

        out_t, out_i = jax.lax.cond(total <= p_cap, _run_binned, _run_tiled,
                                    0)
    else:
        if s_count == 1:
            # Single-super scenes (<= 2,048 triangles): the ordered-list
            # cull is pure overhead — synthesize the trivial list and let
            # the intersect kernel's own cluster slab do all the culling.
            # Dead tiles still skip via a cheap XLA alive-reduce.
            n_tiles = npad // tile
            alive = (rays8[:, 6].reshape(n_tiles, tile).max(axis=1) > 0.0)
            counts = alive.astype(jnp.int32)[:, None]
            clist = jnp.zeros((n_tiles, 1), jnp.int32)
            elist = jnp.zeros((n_tiles, 1), jnp.float32)
        else:
            clist, elist, counts = _launch_cull(rays8, sbounds, tile,
                                                interpret)
        res = _launch(counts, clist, elist, rays8, cb, woop_slice,
                      tile, interpret, any_hit=any_hit,
                      stream=stream, count_evals=count_evals)
        if count_evals:
            out_t, out_i, ctr = res
        else:
            out_t, out_i = res
    out_t = out_t[:n, 0]
    out_i = out_i[:n, 0]

    hit = out_i >= 0
    idx = jnp.where(hit, out_i + lo, -1)
    if any_hit or not refine:
        zeros = jnp.zeros_like(out_t)
        out = (jnp.where(hit, out_t, jnp.inf), idx, zeros, zeros)
        return out + (ctr,) if count_evals else out
    t, u, v = _exact_refine(scene, idx, o_m, d_m)
    t = jnp.where(hit, t, jnp.inf)
    out = (t, idx, jnp.where(hit, u, 0.0), jnp.where(hit, v, 0.0))
    return out + (ctr,) if count_evals else out
