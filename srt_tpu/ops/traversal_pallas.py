"""Production TPU intersection kernel: cluster-culled Woop intersection.

This is the speed-of-light replacement for the reference's per-thread
stack traversal (``Intersects``, ray_intersects.glsl:99-133), redesigned
for the VPU's 8x128 lanes instead of SIMT threads:

* Triangles are kept in **BVH order** (spatially coherent; the builder
  already reorders primitives, bvh.h:66-72) and chunked into clusters of
  128 — one cluster fills the VPU lane dimension exactly.
* Culling is two-phase: an XLA-side slab test of every ray against every
  cluster AABB produces, per ray tile, a **compacted list of active
  clusters**; the kernel loops over exactly those clusters — the TPU
  analog of BVH early-out with zero divergence inside a tile and no
  wasted loop iterations on skipped clusters.
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

Scene data (the Woop table, [13, T]) lives in VMEM for scenes up to
~200k triangles; larger scenes stream per-cluster via the same layout
(future work, see ROADMAP).
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
DEFAULT_TILE = 512     # rays per kernel tile
DEN_EPS_SCALE = intersect.MT_PARALLEL_EPS  # parallel-ray determinant eps
T_EPS = intersect.MT_HIT_EPS
EDGE_EPS = 1e-4        # candidate acceptance slop at shared edges


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
# The kernel
# ---------------------------------------------------------------------------

def _intersect_kernel(count_ref, active_ref, rays_ref, woop_ref,
                      out_t_ref, out_i_ref, bt_ref, bi_ref, *, tile: int):
    """One ray tile vs its active clusters of one model.

    count_ref:  [8, 1] int32 SMEM — active clusters per tile (8-row window,
                this tile's row is program_id % 8); only used to skip
                all-dead / no-overlap tiles outright;
    active_ref: [8, C] int32 SMEM — per-cluster occupancy bits (1 = some
                ray in the tile enters the cluster AABB); inactive clusters
                are skipped with a branch, which replaces the host-side
                argsort compaction (the XLA sort cost ~1.4 ms per call);
    rays_ref:   [tile, 8] VMEM — ox oy oz dx dy dz t_max pad;
    woop_ref:   [C, 16, 128] VMEM — per-cluster Woop rows (13 used, padded
                to 16 sublanes) so cluster selection is a dynamic index on
                the untiled leading axis, which Mosaic handles cheaply
                (dynamic *lane*-axis slices explode compile time);
    outputs [tile, 1] f32 / int32.
    """
    row = jax.lax.rem(pl.program_id(0), 8)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, CLUSTER), 1)
    ox = rays_ref[:, 0:1]
    oy = rays_ref[:, 1:2]
    oz = rays_ref[:, 2:3]
    dx = rays_ref[:, 3:4]
    dy = rays_ref[:, 4:5]
    dz = rays_ref[:, 5:6]
    t_max = rays_ref[:, 6:7]

    # Default outputs; overwritten when the tile has active clusters.
    # Tiles whose rays are all dead (t_max == 0, set by the integrator for
    # terminated paths) cost only these two writes.
    out_t_ref[:] = t_max
    out_i_ref[:] = jnp.full((tile, 1), -1, jnp.int32)

    n_clusters = woop_ref.shape[0]

    def cluster_body(c, carry):
        # Lane-wise running minima held in VMEM scratch, mutated in place —
        # skipped clusters cost one SMEM read + branch, no state copies
        # (a lax.cond carrying [tile, 128] state copies it per iteration).
        @pl.when(active_ref[row, c] > 0)
        def _intersect_cluster():
            best_t = bt_ref[:]
            best_i = bi_ref[:]
            base = c * CLUSTER
            w = woop_ref[c]                       # [16, 128]

            def r(j):
                return w[j:j + 1, :]              # [1, 128]

            zo = ox * r(8) + oy * r(9) + oz * r(10) + r(11)
            zd = dx * r(8) + dy * r(9) + dz * r(10)
            parallel = jnp.abs(zd) <= r(12)
            den = jnp.where(parallel, 1.0, zd)
            inv = pl.reciprocal(den, approx=True)
            inv = inv * (2.0 - den * inv)         # one Newton step
            t = -zo * inv
            xo = ox * r(0) + oy * r(1) + oz * r(2) + r(3)
            xd = dx * r(0) + dy * r(1) + dz * r(2)
            u = xo + t * xd
            yo = ox * r(4) + oy * r(5) + oz * r(6) + r(7)
            yd = dx * r(4) + dy * r(5) + dz * r(6)
            v = yo + t * yd

            valid = (
                (~parallel)
                & (t > T_EPS)
                & (u >= -EDGE_EPS) & (v >= -EDGE_EPS)
                & (u + v <= 1.0 + 2 * EDGE_EPS)
                & (t < best_t)
            )
            bi_ref[:] = jnp.where(valid, base + lane, best_i)
            bt_ref[:] = jnp.where(valid, t, best_t)

        return carry

    @pl.when(count_ref[row, 0] > 0)
    def _process():
        bt_ref[:] = jnp.broadcast_to(t_max, (tile, CLUSTER))
        bi_ref[:] = jnp.full((tile, CLUSTER), jnp.int32(2 ** 30), jnp.int32)
        jax.lax.fori_loop(0, n_clusters, cluster_body, 0)
        best_t = bt_ref[:]
        best_i = bi_ref[:]
        t_min = jnp.min(best_t, axis=1, keepdims=True)
        hit = t_min < t_max
        # Smallest triangle index among lanes attaining the minimum.
        i_cand = jnp.where(best_t <= t_min, best_i, jnp.int32(2 ** 30))
        i_min = jnp.min(i_cand, axis=1, keepdims=True)
        out_t_ref[:] = t_min
        out_i_ref[:] = jnp.where(hit, i_min, -1)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _launch(counts, active, rays, woop, tile: int, interpret: bool):
    """counts [n_tiles, 1], active [n_tiles, C], rays [n_tiles*tile, 8];
    one tile per program; SMEM windows are 8-row blocks (Mosaic block-shape
    constraint), the kernel reads its own row via program_id % 8."""
    n_tiles = rays.shape[0] // tile
    assert n_tiles % 8 == 0
    n_clusters = active.shape[1]
    kernel = functools.partial(_intersect_kernel, tile=tile)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, 1), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, n_clusters), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((woop.shape[0], 16, CLUSTER), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * tile, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * tile, 1), jnp.int32),
        ],
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, CLUSTER), jnp.float32),
            pltpu.VMEM((tile, CLUSTER), jnp.int32),
        ],
        interpret=interpret,
    )(counts, active, rays, woop)


# ---------------------------------------------------------------------------
# Occupancy kernel: per-(tile, cluster) slab test, reduced over the tile.
#
# Computing this with plain jnp broadcasting triggers a catastrophic XLA
# compile-time pathology on the TPU backend (minutes for a [N, C] slab
# test + reduce); as a Pallas kernel it compiles in ~1 s and runs faster.
# ---------------------------------------------------------------------------

def _occupancy_kernel(rays_ref, bounds_ref, occ_ref, *, tile: int):
    """rays_ref [8*tile, 8] VMEM; bounds_ref [8, C] VMEM (rows: min xyz,
    max xyz, pad, pad); occ_ref [8, C] int32 VMEM — row ``sub`` is 1 when
    any ray in sub-tile ``sub`` enters the cluster AABB closer than its
    t_max (``IntersectsBox`` semantics, ray_intersects.glsl:49-58).

    One program computes 8 tile rows: at one tile per program the grid was
    512 tiny programs and per-program launch overhead dominated (3.1 ms for
    ~30 us of compute at 512x512); 8 tiles per program amortizes it 8x."""

    def r(j):
        return bounds_ref[j:j + 1, :]                 # [1, C]

    for sub in range(8):
        rays = rays_ref[sub * tile:(sub + 1) * tile, :]
        ox = rays[:, 0:1]
        oy = rays[:, 1:2]
        oz = rays[:, 2:3]
        inv_x = 1.0 / rays[:, 3:4]
        inv_y = 1.0 / rays[:, 4:5]
        inv_z = 1.0 / rays[:, 5:6]
        t_max = rays[:, 6:7]

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
        sel = jnp.where(t_near >= 0.0, t_near, t_far)
        hit = (t_near <= t_far) & (t_far >= 0.0) & (sel < t_max)
        occ = jnp.any(hit, axis=0, keepdims=True)         # [1, C]
        occ_ref[sub:sub + 1, :] = occ.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _launch_occupancy(rays, bounds, tile: int, interpret: bool):
    n_tiles = rays.shape[0] // tile
    assert n_tiles % 8 == 0
    n_clusters = bounds.shape[1]
    kernel = functools.partial(_occupancy_kernel, tile=tile)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles // 8,),
        in_specs=[
            pl.BlockSpec((8 * tile, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n_clusters), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((n_tiles, n_clusters), jnp.int32),
        out_specs=pl.BlockSpec((8, n_clusters), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rays, bounds)


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


def pallas_model_hit(scene, b: int, origins, dirs, t_best,
                     tile: int = DEFAULT_TILE, any_hit: bool = False,
                     refine: bool = True):
    """Closest hit of rays against model ``b``; drop-in for the dense/bvh
    strategies in models/mesh.py.  origins/dirs are [3, N] (component-first
    wavefront layout, ops/vec.py).  Returns (t [N], tri_idx [N], u, v).

    ``any_hit=True`` is the shadow-ray fast path: skips the exact (t,u,v)
    refinement (only the hit/miss answer and the kernel's candidate t are
    returned).  ``refine=False`` returns the kernel's fp32 candidate t with
    zero u/v — the multi-model caller (models/mesh.py) re-derives exact
    (t, u, v) once for the cross-model winner, saving per-model vertex
    gathers (row gathers cost ~ms per 256k rays on TPU).

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

    o_m, d_m = transform_rays(scene.frames[b], origins, dirs)
    n = origins.shape[1]
    pad = (-n) % (tile * 8)  # n_tiles must be a multiple of the SMEM window
    npad = n + pad

    def padded(x, fill=0.0):
        return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad),),
                       constant_values=fill)

    o_p = padded(o_m)
    d_p = padded(d_m, 1.0)
    t_p = padded(jnp.broadcast_to(jnp.asarray(t_best, jnp.float32), (n,)), 0.0)

    # Assembled component-first ([8, Np], lane-dense) then transposed once
    # into the kernel's [Np, 8] operand layout.  stop_gradient: the kernels
    # are non-differentiable candidate searches; gradients flow through the
    # exact refine of the winner only (see docstring).
    sg = jax.lax.stop_gradient
    rays8 = sg(jnp.concatenate(
        [o_p, d_p, t_p[None, :], jnp.zeros((1, npad), jnp.float32)], axis=0
    ).T)
    woop_slice = sg(scene.woop[c_lo:c_lo + n_clusters])

    # Cluster occupancy per tile (Pallas; see _occupancy_kernel), then a
    # cheap compaction of each tile's hit set into an active-cluster list.
    cmin = scene.cluster_min[c_lo:c_lo + n_clusters]
    cmax = scene.cluster_max[c_lo:c_lo + n_clusters]
    bounds = sg(jnp.concatenate(
        [cmin.T, cmax.T, jnp.zeros((2, n_clusters), jnp.float32)], axis=0
    ))                                                  # [8, C]
    interpret = jax.default_backend() != "tpu"
    occ_tile = _launch_occupancy(rays8, bounds, tile, interpret)  # [tiles, C]
    counts = occ_tile.sum(axis=1, dtype=jnp.int32)[:, None]       # [tiles, 1]

    out_t, out_i = _launch(counts, occ_tile, rays8, woop_slice, tile, interpret)
    out_t = out_t[:n, 0]
    out_i = out_i[:n, 0]

    hit = out_i >= 0
    idx = jnp.where(hit, out_i + lo, -1)
    if any_hit or not refine:
        zeros = jnp.zeros_like(out_t)
        return jnp.where(hit, out_t, jnp.inf), idx, zeros, zeros
    t, u, v = _exact_refine(scene, idx, o_m, d_m)
    t = jnp.where(hit, t, jnp.inf)
    return t, idx, jnp.where(hit, u, 0.0), jnp.where(hit, v, 0.0)
