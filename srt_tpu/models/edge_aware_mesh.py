"""Edge-aware (silhouette) visibility gradients for MESH scenes.

The mesh analog of models/edge_aware.py: path-space gradients treat the
hit/miss decision as fixed, so vertex optimization stalls at mesh
silhouettes — the boundary term lives in the step functions of the
traversal (``IntersectsTriangle``'s hit window,
/root/reference/shaders/ray_intersects.glsl:61-96, dispatched from
``CheckHit``, raytrace_compute.glsl:122-165).  Where the sphere version
uses the closed-form silhouette (radius minus impact parameter), a mesh
silhouette is a set of EDGES: an edge is on the silhouette when its two
adjacent triangles face opposite ways w.r.t. the ray (or it is a
boundary edge).  This module reparameterizes primary visibility with a
one-pixel coverage ramp driven by the perpendicular distance from the
ray to the nearest silhouette edge of the HIT triangle:

* ``sdf``   = min over silhouette edges e of dist(ray, line(e)), a
  differentiable function of the shared vertex buffer (``positions``)
  through the edge endpoints — its gradient is the boundary term;
* ``cov``   = clip(sdf / footprint, 0, 1), footprint = one pixel at the
  hit distance;
* radiance  = cov * hit-path radiance + (1 - cov) * background radiance,
  where the background is the same ray re-traced from beyond the winning
  model's root AABB — exactly "this pixel without the winning model".

Pixels whose hit triangle has no silhouette edge get cov = 1 and are
bit-identical to the plain renderer (tested); only the one-pixel band
at silhouettes blends.

Scope and limits (documented, not hidden):
* primary visibility only — shadow boundaries and silhouettes seen in
  reflections remain path-space (same as the sphere module);
* the background continuation removes the whole WINNING MODEL along the
  ray (root-AABB exit).  For a single watertight model against a
  background this is exact; for strongly concave self-occluding models
  the continuation may skip a farther front surface of the same model
  (the sphere version has the same convexity assumption via its far
  quadric root);
* silhouette edges are searched on the hit triangle only (the nearest
  one-ring edge in practice: at a silhouette the hit triangle IS an edge
  triangle whenever triangles are not much smaller than a pixel);
* model frames are assumed rigid (no scale), so model-space distances
  are world distances.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from srt_tpu.camera import derive_viewport, generate_rays
from srt_tpu.config import CameraConfig, RenderConfig
from srt_tpu.models.mesh import MeshScene, mesh_hit_fn, transform_rays
from srt_tpu.models.pathtracer import trace_wavefront
from srt_tpu.ops import rng as rng_ops
from srt_tpu.ops import vec
from srt_tpu.ops.rng import ArrayStream, KeyStream
from srt_tpu.ops.vec import bc
from srt_tpu.scene import Lights

BIG = 3.0e37


def _primary_winner(scene: MeshScene, origins, dirs, t_min, method: str):
    """Closest hit across models with the winning indices exposed:
    (hit [N] bool, t [N], tri_idx [N], model_idx [N])."""
    from srt_tpu.models import mesh as mesh_mod

    n = origins.shape[1]
    best_t = jnp.full((n,), jnp.inf)
    best_i = jnp.full((n,), -1, jnp.int32)
    best_b = jnp.zeros((n,), jnp.int32)
    for b in range(scene.num_models):
        if method == "pallas":
            from srt_tpu.ops.traversal_pallas import pallas_model_hit
            t, i, _, _ = pallas_model_hit(scene, b, origins, dirs, best_t,
                                          refine=False)
        else:
            t, i, _, _ = mesh_mod._dense_model_hit(scene, b, origins, dirs,
                                                   best_t)
        better = (i != -1) & (t < best_t) & (t > t_min)
        best_t = jnp.where(better, t, best_t)
        best_i = jnp.where(better, i, best_i)
        best_b = jnp.where(better, b, best_b)
    return best_i != -1, best_t, jnp.maximum(best_i, 0), best_b


def _tri_normal(scene: MeshScene, tri, pos):
    """Geometric normal (unnormalized) of triangles ``tri`` [N] from the
    shared vertex buffer — differentiable w.r.t. positions."""
    vidx = scene.tri_vidx[tri]                       # [N, 3]
    a = pos[vidx[:, 0]].T                            # [3, N]
    b = pos[vidx[:, 1]].T
    c = pos[vidx[:, 2]].T
    return a, b, c, vec.cross(b - a, c - a)


def silhouette_sdf(scene: MeshScene, tri_idx, o_m, d_m):
    """Perpendicular distance from the (model-space) ray to the nearest
    SILHOUETTE edge of the hit triangle; BIG when none of its edges is a
    silhouette.  Differentiable w.r.t. ``scene.positions`` through the
    edge endpoints and adjacent-face normals.

    o_m/d_m: [3, N] model-space rays; tri_idx: [N] global triangle ids.
    """
    pos = scene.positions
    a, b, c, n_hit = _tri_normal(scene, tri_idx, pos)
    f_hit = jnp.sum(n_hit * d_m, axis=0)             # facing sign
    adj = scene.tri_adj[tri_idx]                     # [N, 3]

    sdf = jnp.full(tri_idx.shape, BIG)
    corners = (a, b, c)
    for k in range(3):
        p0 = corners[k]
        p1 = corners[(k + 1) % 3]
        adj_k = adj[:, k]
        _, _, _, n_adj = _tri_normal(scene, jnp.maximum(adj_k, 0), pos)
        f_adj = jnp.sum(n_adj * d_m, axis=0)
        # Silhouette: boundary edge, or the neighbor faces the other way.
        sil = (adj_k < 0) | (f_hit * f_adj <= 0.0)
        # Ray-to-edge-line distance: m = e x d, dist = |m . (p0 - o)|/|m|.
        e = p1 - p0
        m = vec.cross(e, d_m)
        m2 = jnp.sum(m * m, axis=0)
        ok = m2 > 1e-20
        inv = jax.lax.rsqrt(jnp.where(ok, m2, 1.0))
        dist = jnp.abs(jnp.sum(m * (p0 - o_m), axis=0)) * inv
        dist = jnp.where(ok, dist, BIG)   # edge parallel to ray: no band
        sdf = jnp.minimum(sdf, jnp.where(sil, dist, BIG))
    return sdf


def _model_exit_t(scene: MeshScene, b, o_m, d_m):
    """Far intersection of the ray with model ``b``'s root AABB (the BVH
    root node bounds); 0 when the ray misses the box (then the
    continuation origin degenerates to the ray origin, but such rays
    cannot have hit the model anyway)."""
    root = scene.model_first_node[b]
    lo = scene.node_min[root][:, None]
    hi = scene.node_max[root][:, None]
    inv = 1.0 / d_m
    t0 = (lo - o_m) * inv
    t1 = (hi - o_m) * inv
    t_near = jnp.max(jnp.minimum(t0, t1), axis=0)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=0)
    hit = (t_near <= t_far) & (t_far >= 0.0)
    return jnp.where(hit, t_far, 0.0)


def trace_edge_aware_mesh(scene: MeshScene, lights: Lights,
                          cam: CameraConfig, cfg: RenderConfig, stream,
                          band: float = 1.0, method: str = "dense"):
    """One image sample with reparameterized primary mesh visibility.

    ``band`` is the coverage ramp width in pixels (at the hit distance).
    Returns linear radiance [H, W, 3].  Both traces consume the SAME
    uniform block, so the blend is between two correlated estimates and
    the image is deterministic given the stream.
    """
    if scene.tri_adj is None:
        raise ValueError("scene has no tri_adj: re-flatten with the "
                         "current utils/flatten.py")
    n = cam.width * cam.height
    vp = derive_viewport(cam)
    jitter = stream.take(2)
    origins, dirs = generate_rays(vp, cam.width, cam.height, jitter)

    n_bounces = cfg.max_depth + cfg.rr_bounces
    u_block = stream.take(n_bounces * rng_ops.bounce_slots(lights.count))

    hit_fn = mesh_hit_fn(scene, method=method)
    color_main = trace_wavefront(hit_fn, lights, origins, dirs,
                                 ArrayStream(u_block.T), cfg)

    p_hit, t_hit, tri_idx, model_idx = _primary_winner(
        scene, origins, dirs, cfg.t_min, method)

    # Silhouette distance + continuation start, per winning model
    # (where-chained over the model directory, like models/mesh.py).
    sdf = jnp.full((n,), BIG)
    t_exit = jnp.zeros((n,))
    for b in range(scene.num_models):
        o_m, d_m = transform_rays(scene.frames[b], origins, dirs)
        sdf_b = silhouette_sdf(scene, tri_idx, o_m, d_m)
        ex_b = _model_exit_t(scene, b, o_m, d_m)
        sel = model_idx == b
        sdf = jnp.where(sel, sdf_b, sdf)
        t_exit = jnp.where(sel, ex_b, t_exit)

    # One-pixel world-space footprint at the hit distance ("reference"
    # viewport: 1x1 at focus_dist, camera.py/derive_viewport).  Rigid
    # frames assumed: model-space sdf == world distance.
    fp = band * jnp.maximum(t_hit, 1e-3) / (
        cam.focus_dist * min(cam.width, cam.height))
    cov = jnp.clip(sdf / fp, 0.0, 1.0)

    # Background: the same ray continued from beyond the winning model's
    # root box — "this pixel without the winning model".
    d_hat = vec.normalize(dirs)
    o_bg = origins + bc(jnp.where(p_hit, t_exit + cfg.t_min, 0.0)) * d_hat
    color_bg = trace_wavefront(hit_fn, lights, o_bg, dirs,
                               ArrayStream(u_block.T), cfg)

    blend = jnp.where(p_hit, cov, 1.0)
    radiance = bc(blend) * color_main + bc(1.0 - blend) * color_bg
    return radiance.T.reshape(cam.height, cam.width, 3)


def render_edge_aware_mesh(scene: MeshScene, lights: Lights,
                           cam: CameraConfig, cfg: RenderConfig, key,
                           band: float = 1.0, method: str = "dense"):
    """spp-accumulated edge-aware mesh render (pathtracer.render
    semantics)."""
    n = cam.height * cam.width

    def one_sample(s):
        stream = KeyStream(jax.random.fold_in(key, s), n)
        return trace_edge_aware_mesh(scene, lights, cam, cfg, stream,
                                     band=band, method=method)

    if cfg.spp == 1:
        return one_sample(0)
    acc = jax.lax.map(one_sample, jnp.arange(cfg.spp))
    return jnp.mean(acc, axis=0)
