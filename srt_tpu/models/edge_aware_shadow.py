"""Shadow-boundary gradients for MESH occluders.

The mesh analog of ``edge_aware.soft_shadow_fn`` (spheres): the binary
occlusion test (``CheckLightOccluded``,
/root/reference/shaders/raytrace_compute.glsl:167-176) gives occluder
geometry seen ONLY through its shadow exactly zero path-space gradient.
This module replaces it with a coverage ramp in the shadow ray's signed
**silhouette penetration**:

* For every occluder triangle, intersect the shadow segment with the
  triangle's PLANE (no hit window) and measure the signed world-space
  distance from the plane point to the triangle's nearest edge line —
  ``pen = min_k(bary_k * h_k)`` where ``h_k`` is the triangle height
  over edge k (``2 * area / |edge_k|``).  Positive = the segment pierces
  the triangle's interior by that margin; negative = it misses, passing
  ``|pen|`` outside the nearest edge.
* ``pen_best = max`` over triangles whose plane point lies inside the
  clipped segment.  At INTERIOR mesh edges the neighboring triangle's
  penetration takes over before the first goes negative, so the max is
  continuous and positive across the surface — only at true SILHOUETTE
  edges (including boundary edges) does ``pen_best`` cross zero.  The
  silhouette structure therefore emerges from the max itself; no
  adjacency table is consulted.
* ``mult = clip(0.5 - pen_best / band, 0, 1)``: deep inside the shadow
  -> 0 (hard-shadow parity), fully lit -> 1, smooth across the boundary
  on BOTH sides.  As ``band -> 0`` this converges to the binary test.

``pen`` is differentiable w.r.t. the occluder's shared vertex buffer
(through ``tri_v0/v1/v2``; wire ``mesh.with_positions`` for vertex
optimization), so d(image)/d(vertices) carries the shadow-boundary term
that finite differences confirm (tests/test_mesh_shadow_boundary.py).

Cost: dense O(rays x triangles) per model, like the sphere module's
O(rays x spheres) — an inverse-rendering tool, not the forward-bench
path (``ray_tile`` bounds the working set).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from srt_tpu.models.mesh import MeshScene, transform_rays
from srt_tpu.ops import vec
from srt_tpu.ops.vec import bc

BIG = 3.0e37


def _segment_penetration(scene: MeshScene, b: int, o_m, d_m, t_min, dist):
    """Max signed silhouette penetration of segment (o_m, d_m, [t_min,
    dist]) over model ``b``'s triangles.  o_m/d_m [3, N] model space
    (d_m unit for rigid frames); returns [N]."""
    lo = scene.model_first_tri[b]
    hi = lo + scene.model_tri_count[b]
    v0 = scene.tri_v0[lo:hi]                            # [T, 3]
    e1 = scene.tri_v1[lo:hi] - v0                       # [T, 3]
    e2 = scene.tri_v2[lo:hi] - v0

    # Unwindowed Moller-Trumbore: plane hit t and barycentrics for EVERY
    # triangle (the windowed kernel masks the near-miss data this module
    # exists to use).  cross(d, e2) per (ray, tri): [N, T, 3].
    d_t = d_m.T                                          # [N, 3]
    hN = jnp.cross(d_t[:, None, :], e2[None, :, :])      # [N, T, 3]
    a = jnp.einsum("tj,ntj->nt", e1, hN)                 # [N, T]
    parallel = jnp.abs(a) < 1e-7
    f = 1.0 / jnp.where(parallel, 1.0, a)
    s = o_m.T[:, None, :] - v0[None, :, :]               # [N, T, 3]
    u = f * jnp.einsum("ntj,ntj->nt", s, hN)
    q = jnp.cross(s, e1[None, :, :])                     # [N, T, 3]
    v = f * jnp.einsum("nj,ntj->nt", d_t, q)
    t = f * jnp.einsum("tj,ntj->nt", e2, q)
    w = 1.0 - u - v

    # Triangle heights over each edge: h_k = 2A / |edge_k|.
    n_t = jnp.cross(e1, e2)                              # [T, 3]
    area2 = jnp.sqrt(jnp.maximum(jnp.sum(n_t * n_t, axis=1), 1e-30))
    e12 = scene.tri_v2[lo:hi] - scene.tri_v1[lo:hi]

    def height(edge):
        return area2 / jnp.sqrt(
            jnp.maximum(jnp.sum(edge * edge, axis=1), 1e-30))

    h_u = height(e2)      # bary u = 0 on edge (v0, v2)
    h_v = height(e1)      # bary v = 0 on edge (v0, v1)
    h_w = height(e12)     # bary w = 0 on edge (v1, v2)

    pen = jnp.minimum(jnp.minimum(u * h_u[None, :], v * h_v[None, :]),
                      w * h_w[None, :])                  # [N, T] signed
    in_seg = (~parallel) & (t > t_min) & (t < dist[:, None])
    return jnp.max(jnp.where(in_seg, pen, -BIG), axis=1)


def mesh_soft_shadow_fn(scene: MeshScene, band: float,
                        ray_tile: int = 0):
    """Build a ``shadow_fn`` for ``pathtracer.bounce_step``: continuous
    light visibility with silhouette-penetration ramps (see module
    docstring).  ``band`` is the ramp width in world units; ``ray_tile``
    > 0 processes shadow rays in ``lax.map`` tiles to bound the [N, T]
    working set."""

    def pen_all(p, d, t_min, dist):
        pen = jnp.full(p.shape[1:2], -BIG)
        for b in range(scene.num_models):
            o_m, d_m = transform_rays(scene.frames[b], p, d)
            pen = jnp.maximum(
                pen, _segment_penetration(scene, b, o_m, d_m, t_min, dist))
        return pen

    def fn(closest_hit, p, l_pos, t_min, active):
        delta = l_pos - p
        dist2 = vec.norm2(delta)
        dist = jnp.sqrt(jnp.where(dist2 > 0.0, dist2, 1.0))
        d = delta / bc(jnp.maximum(dist, 1e-8))

        if ray_tile and p.shape[1] > ray_tile:
            n = p.shape[1]
            pad = (-n) % ray_tile
            p_p = jnp.pad(p, ((0, 0), (0, pad)))
            d_p = jnp.pad(d, ((0, 0), (0, pad)), constant_values=1.0)
            dist_p = jnp.pad(dist, (0, pad))
            tiles = (n + pad) // ray_tile
            pen = jax.lax.map(
                lambda args: pen_all(args[0], args[1], t_min, args[2]),
                (p_p.reshape(3, tiles, ray_tile).transpose(1, 0, 2),
                 d_p.reshape(3, tiles, ray_tile).transpose(1, 0, 2),
                 dist_p.reshape(tiles, ray_tile)),
            ).reshape(-1)[:n]
        else:
            pen = pen_all(p, d, t_min, dist)

        mult = jnp.clip(0.5 - pen / jnp.maximum(band, 1e-6), 0.0, 1.0)
        if active is not None:
            mult = jnp.where(active, mult, 1.0)
        return mult

    return fn
