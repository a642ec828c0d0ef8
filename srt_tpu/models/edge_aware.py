"""Edge-aware (silhouette) visibility gradients for sphere scenes.

Path-space gradients (models/pathtracer.py) treat the hit/miss decision as
fixed, so moving geometry gets zero gradient from pixels where visibility
flips — the silhouette boundary term (SURVEY.md hard-part #2; the step
functions live in ``CheckHit``/``CheckLightOccluded``,
raytrace_compute.glsl:122-176).  This module supplies that term by
**reparameterizing primary visibility**: the hard silhouette of the
primary hit is replaced by a one-pixel-wide analytic coverage ramp that
blends the hit path's radiance with the EXACT background radiance — the
same ray re-traced from just beyond the winning sphere's far intersection
(radiance is invariant along a ray, so the continuation is exactly "this
pixel without the winning sphere", including later bounces that do see
the sphere).

The rendered image is then continuous AND differentiable in sphere
centers/radii across silhouettes: the coverage factor's gradient is the
boundary term (the approach of differentiable rasterizers' analytic
antialiasing, specialized to spheres where the silhouette is closed-form).
Forward cost is ~2x primary (one extra full trace); the un-blended
renderer stays bit-exact with the reference semantics, so this path is
opt-in.

Scope: primary-visibility silhouettes, plus (opt-in,
``soft_shadow_band``) SHADOW boundaries via a penetration-ramp occlusion
multiplier plugged into the integrator's ``shadow_fn`` hook, plus
(``trace_edge_aware_reflection``) SECONDARY silhouettes seen in
deterministic MIRROR reflections.  Remaining gap: silhouettes behind
stochastic (rough/diffuse) bounces are still path-space only — they
need edge sampling in the integrator proper (roadmap).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from srt_tpu.camera import derive_viewport, generate_rays
from srt_tpu.config import CameraConfig, RenderConfig
from srt_tpu.models.pathtracer import spheres_hit_fn, trace_wavefront
from srt_tpu.ops import rng as rng_ops
from srt_tpu.ops import vec
from srt_tpu.ops.rng import ArrayStream, KeyStream
from srt_tpu.ops.vec import bc
from srt_tpu.scene import Lights, Spheres


def _winner_silhouette(spheres: Spheres, origins, dirs, widx):
    """Per-ray silhouette data of the winning sphere.

    Returns (sdf [N] = r - impact_parameter, positive inside the
    silhouette; along [N] = distance to the closest approach;
    t_exit [N] = far quadric root, where the continuation ray starts).
    All differentiable w.r.t. centers/radii/rays.
    """
    from srt_tpu.ops.gather import take_small_t
    c = take_small_t(spheres.center, widx)                  # [3, N]
    r = take_small_t(spheres.radius[:, None], widx)[0]      # [N]
    d = vec.normalize(dirs)
    oc = c - origins
    along = jnp.sum(oc * d, axis=0)
    perp2 = jnp.maximum(vec.norm2(oc) - along * along, 0.0)
    b = jnp.sqrt(jnp.where(perp2 > 0.0, perp2, 1.0))
    b = jnp.where(perp2 > 0.0, b, 0.0)                      # NaN-safe grad
    sdf = r - b
    half2 = jnp.maximum(r * r - perp2, 0.0)
    half = jnp.sqrt(jnp.where(half2 > 0.0, half2, 1.0))
    half = jnp.where(half2 > 0.0, half, 0.0)
    return sdf, along, along + half


def soft_shadow_fn(spheres: Spheres, band: float):
    """Reparameterized occlusion for ``bounce_step``'s ``shadow_fn`` hook:
    the binary shadow test (``CheckLightOccluded``,
    raytrace_compute.glsl:167-176) becomes a coverage ramp in the
    occluder's silhouette penetration, so SHADOW boundaries carry
    gradients w.r.t. occluder centers/radii — the shadow-boundary analog
    of the primary-silhouette reparameterization below.

    ``band`` is the ramp width in world units.  For each shadow segment
    the most-occluding sphere is the one with the largest penetration
    ``r - impact_parameter`` among spheres whose closest approach lies
    inside the segment; mult = clip(0.5 - pen/band, 0, 1): deep inside
    the silhouette -> 0 (hard-shadow parity), outside -> 1, smooth
    across the boundary.  As band -> 0 this converges to the binary
    test (up to the half-width at the exact silhouette)."""

    def fn(closest_hit, p, l_pos, t_min, active):
        delta = l_pos - p
        dist2 = vec.norm2(delta)
        dist = jnp.sqrt(jnp.where(dist2 > 0.0, dist2, 1.0))
        d = delta / bc(jnp.maximum(dist, 1e-8))
        oc = spheres.center.T[:, None, :] - p[:, :, None]   # [3, N, S]
        along = jnp.sum(oc * d[:, :, None], axis=0)         # [N, S]
        perp2 = jnp.maximum(
            jnp.sum(oc * oc, axis=0) - along * along, 0.0)
        b = jnp.sqrt(jnp.where(perp2 > 0.0, perp2, 1.0))
        b = jnp.where(perp2 > 0.0, b, 0.0)                  # NaN-safe grad
        pen = spheres.radius[None, :] - b
        in_seg = (along > t_min) & (along < dist[:, None])
        pen_best = jnp.max(jnp.where(in_seg, pen, -jnp.inf), axis=1)
        mult = jnp.clip(0.5 - pen_best / jnp.maximum(band, 1e-6),
                        0.0, 1.0)
        if active is not None:
            mult = jnp.where(active, mult, 1.0)
        return mult

    return fn


def trace_edge_aware(spheres: Spheres, lights: Lights, cam: CameraConfig,
                     cfg: RenderConfig, stream, band: float = 1.0,
                     soft_shadow_band: float = 0.0):
    """One image sample with reparameterized primary visibility.

    ``band`` is the coverage ramp width in pixels (at the sphere's
    distance).  ``soft_shadow_band`` > 0 additionally reparameterizes
    SHADOW boundaries (world-unit ramp; see ``soft_shadow_fn``).  Returns
    linear radiance [H, W, 3].  Both traces consume the SAME uniform
    block, so the blend is between two correlated estimates and the image
    is deterministic given the stream.
    """
    n = cam.width * cam.height
    vp = derive_viewport(cam)
    jitter = stream.take(2)
    origins, dirs = generate_rays(vp, cam.width, cam.height, jitter)

    n_bounces = cfg.max_depth + cfg.rr_bounces
    u_block = stream.take(n_bounces * rng_ops.bounce_slots(lights.count))

    shadow = (soft_shadow_fn(spheres, soft_shadow_band)
              if soft_shadow_band > 0.0 else None)
    hit_fn = spheres_hit_fn(spheres)
    color_main = trace_wavefront(hit_fn, lights, origins, dirs,
                                 ArrayStream(u_block.T), cfg,
                                 shadow_fn=shadow)

    # Primary winner + its silhouette coverage.
    from srt_tpu.ops import intersect
    p_hit, _p_t, widx = intersect.sphere_hit(
        origins, dirs, spheres.center, spheres.radius, cfg.t_min,
        jnp.full((n,), jnp.inf),
    )
    sdf, along, t_exit = _winner_silhouette(spheres, origins, dirs, widx)
    # One-pixel world-space footprint at the closest approach distance
    # ("reference" viewport: 1x1 at focus_dist, camera.py/derive_viewport).
    fp = band * jnp.maximum(along, 1e-3) / (
        cam.focus_dist * min(cam.width, cam.height))
    cov = jnp.clip(sdf / fp, 0.0, 1.0)

    # Exact background radiance: continuation of the same ray from beyond
    # the winner's far intersection.  World hit points are unchanged, so
    # the continuation's radiance (and its path-space gradients) match a
    # trace with the winner removed for this ray only.
    d_hat = vec.normalize(dirs)
    o_bg = origins + bc(jnp.where(p_hit, t_exit + cfg.t_min, 0.0)) * d_hat
    color_bg = trace_wavefront(hit_fn, lights, o_bg, dirs,
                               ArrayStream(u_block.T), cfg,
                               shadow_fn=shadow)

    blend = jnp.where(p_hit, cov, 1.0)
    radiance = bc(blend) * color_main + bc(1.0 - blend) * color_bg
    return radiance.T.reshape(cam.height, cam.width, 3)


def trace_edge_aware_reflection(spheres: Spheres, lights: Lights,
                                cam: CameraConfig, cfg: RenderConfig,
                                stream, band: float = 1.0):
    """One image sample with reparameterized SECONDARY (reflected)
    visibility — the remaining silhouette term the primary module
    documents as open: objects seen IN A MIRROR contribute zero
    path-space gradient at their reflected silhouette (the step lives in
    the bounce loop's ``CheckHit``, raytrace_compute.glsl:122-165, at
    bounce depth 2).

    Scope: pixels whose bounce-1 lobe is DETERMINISTIC — mirror
    materials (metalness 1, roughness 0, the integrator's forced-spec
    path) — get the reflected winner's silhouette replaced by a coverage
    ramp; all other pixels are bit-identical to the plain renderer.  The
    construction runs the REAL integrator bounce for depth 1
    (``bounce_step``: direct lighting, lobe selection, reflection ray),
    then traces the remaining depth twice from the bounce ray — once as
    is, once continued past the reflected winner's far intersection —
    and blends by the winner's silhouette coverage at the reflected
    footprint (pixel size at camera->mirror->object distance).  Both
    continuation traces consume the SAME slot block the one-jit scan
    would, so radiometry matches ``trace_wavefront`` exactly away from
    the band (tested).  Stochastic (rough/diffuse) bounces remain
    path-space: their silhouette term needs edge sampling in the
    integrator proper (ROADMAP).
    """
    import dataclasses

    from srt_tpu.models.pathtracer import bounce_step
    from srt_tpu.ops import intersect
    from srt_tpu.ops.gather import take_small_t

    n = cam.width * cam.height
    vp = derive_viewport(cam)
    jitter = stream.take(2)
    origins, dirs = generate_rays(vp, cam.width, cam.height, jitter)

    n_bounces = cfg.max_depth + cfg.rr_bounces
    assert n_bounces >= 2, "reflected silhouettes need depth >= 2"
    d_slots = rng_ops.bounce_slots(lights.count)
    u_block = stream.take(n_bounces * d_slots)          # [B*D, N]

    hit_fn = spheres_hit_fn(spheres)

    # Bounce 1 = the real integrator body (direct light, lobe, next ray).
    init = (origins, dirs, jnp.ones((3, n), jnp.float32),
            jnp.zeros((3, n), jnp.float32), jnp.ones((n,), bool),
            jnp.arange(n, dtype=jnp.int32))
    carry1, _ = bounce_step(hit_fn, lights, cfg, init, 0,
                            u_block[:d_slots], sort=False)
    o2, d2, thr1, color1, alive1, _pix = carry1[:6]

    # Remaining depth from the bounce ray: same slots, shifted cfg so
    # Russian roulette fires at the same absolute depths.
    cfg_rest = dataclasses.replace(cfg, max_depth=cfg.max_depth - 1)
    rest = u_block[d_slots:]
    l2_hit = trace_wavefront(hit_fn, lights, o2, d2,
                             ArrayStream(rest.T), cfg_rest)

    # Reflected winner + silhouette coverage at the reflected footprint.
    p_hit1, t1, w1 = intersect.sphere_hit(
        origins, dirs, spheres.center, spheres.radius, cfg.t_min,
        jnp.full((n,), jnp.inf))
    metal1 = take_small_t(spheres.materials.metalness[:, None], w1)[0]
    rough1 = take_small_t(spheres.materials.roughness[:, None], w1)[0]
    mirror1 = p_hit1 & (metal1 == 1.0) & (rough1 == 0.0)

    hit2, _t2, w2 = intersect.sphere_hit(
        o2, d2, spheres.center, spheres.radius, cfg.t_min,
        jnp.full((n,), jnp.inf))
    sdf2, along2, t_exit2 = _winner_silhouette(spheres, o2, d2, w2)
    fp = band * jnp.maximum(t1 + along2, 1e-3) / (
        cam.focus_dist * min(cam.width, cam.height))
    cov2 = jnp.clip(sdf2 / fp, 0.0, 1.0)

    d2_hat = vec.normalize(d2)
    o2_bg = o2 + bc(jnp.where(hit2, t_exit2 + cfg.t_min, 0.0)) * d2_hat
    l2_bg = trace_wavefront(hit_fn, lights, o2_bg, d2,
                            ArrayStream(rest.T), cfg_rest)

    blend = jnp.where(mirror1 & alive1 & hit2, cov2, 1.0)
    l2 = bc(blend) * l2_hit + bc(1.0 - blend) * l2_bg
    radiance = color1 + jnp.where(bc(alive1), thr1 * l2, 0.0)
    return radiance.T.reshape(cam.height, cam.width, 3)


def render_edge_aware(spheres: Spheres, lights: Lights, cam: CameraConfig,
                      cfg: RenderConfig, key, band: float = 1.0):
    """spp-accumulated edge-aware render (pathtracer.render semantics)."""
    n = cam.height * cam.width

    def one_sample(s):
        stream = KeyStream(jax.random.fold_in(key, s), n)
        return trace_edge_aware(spheres, lights, cam, cfg, stream, band=band)

    if cfg.spp == 1:
        return one_sample(0)
    acc = jax.lax.map(one_sample, jnp.arange(cfg.spp))
    return jnp.mean(acc, axis=0)
