"""Edge-aware visibility gradients (SURVEY.md hard-part #2): with the
reparameterized primary silhouette, finite differences of the renderer
match analytic gradients WITHOUT a decision-stable-pixel mask — the
silhouette boundary term is captured by the coverage ramp."""

import jax
import jax.numpy as jnp
import numpy as np

from srt_tpu.config import CameraConfig, RenderConfig
from srt_tpu.models import pathtracer
from srt_tpu.models.edge_aware import trace_edge_aware
from srt_tpu.ops import rng as rng_ops
from srt_tpu.ops.rng import ArrayStream
from srt_tpu.scene import default_sphere_scene, sphere_scene_lights

CAM = CameraConfig(width=24, height=20, origin=(0, 0, 0), look_at=(0, 0, -1))
CFG = RenderConfig(max_depth=2, rr_bounces=0)


def setup():
    spheres = default_sphere_scene()
    lights = sphere_scene_lights()
    n = CAM.width * CAM.height
    n_slots = rng_ops.total_slots(lights.count, CFG.max_depth + CFG.rr_bounces)
    uniforms = rng_ops.host_uniforms(seed=9, n_rays=n, n_slots=n_slots)
    return spheres, lights, jnp.asarray(uniforms)


def render_ea(spheres, lights, uniforms):
    return trace_edge_aware(spheres, lights, CAM, CFG,
                            ArrayStream(uniforms), band=1.0)


def test_edge_aware_matches_plain_away_from_silhouettes():
    """The blend only touches silhouette-band pixels; the interior is
    bit-identical to the reference-semantics renderer."""
    spheres, lights, uniforms = setup()
    plain = pathtracer.trace_with_uniforms(
        pathtracer.spheres_hit_fn(spheres), lights, CAM, CFG, uniforms)
    ea = render_ea(spheres, lights, uniforms)
    diff = np.abs(np.asarray(plain) - np.asarray(ea)).max(axis=2)
    # Most pixels untouched; the touched ones form a thin band.
    assert (diff == 0.0).mean() > 0.7
    assert (diff > 0.0).sum() > 10  # the band exists


def test_radius_grad_matches_fd_without_mask():
    """d(mean image)/d(radius) including the silhouette term: FD over the
    WHOLE image (no stable-pixel mask) matches jax.grad."""
    spheres, lights, uniforms = setup()

    def loss(dr):
        s = spheres.replace(radius=spheres.radius.at[3].add(dr))
        return jnp.mean(render_ea(s, lights, uniforms))

    g = float(jax.grad(loss)(jnp.float32(0.0)))
    eps = 2e-3
    fd = (float(loss(jnp.float32(eps))) - float(loss(jnp.float32(-eps)))) / (2 * eps)
    assert np.isfinite(g)
    # The boundary term dominates here; a path-space-only gradient misses
    # most of it (checked below), so agreement is the real signal.
    assert abs(g - fd) <= 0.1 * max(0.05, abs(fd)), f"analytic {g} vs fd {fd}"


def test_center_grad_matches_fd_without_mask():
    spheres, lights, uniforms = setup()

    def loss(dx):
        s = spheres.replace(center=spheres.center.at[3, 0].add(dx))
        return jnp.mean(render_ea(s, lights, uniforms))

    g = float(jax.grad(loss)(jnp.float32(0.0)))
    eps = 2e-3
    fd = (float(loss(jnp.float32(eps))) - float(loss(jnp.float32(-eps)))) / (2 * eps)
    assert np.isfinite(g)
    assert abs(g - fd) <= 0.1 * max(0.05, abs(fd)), f"analytic {g} vs fd {fd}"


def test_boundary_term_is_material():
    """The silhouette term the plain renderer cannot see is a substantial
    fraction of the radius gradient (i.e. this module adds information,
    it does not just reproduce path-space gradients)."""
    spheres, lights, uniforms = setup()

    def loss_plain(dr):
        s = spheres.replace(radius=spheres.radius.at[3].add(dr))
        return jnp.mean(pathtracer.trace_with_uniforms(
            pathtracer.spheres_hit_fn(s), lights, CAM, CFG, uniforms))

    def loss_ea(dr):
        s = spheres.replace(radius=spheres.radius.at[3].add(dr))
        return jnp.mean(render_ea(s, lights, uniforms))

    g_plain = float(jax.grad(loss_plain)(jnp.float32(0.0)))
    g_ea = float(jax.grad(loss_ea)(jnp.float32(0.0)))
    # At this scene/resolution the interior term dominates the radius
    # gradient; the boundary term is a small but non-trivial correction.
    assert abs(g_ea - g_plain) > 0.02 * abs(g_ea)
    # ...and the correction is SIGNAL, not noise: adding the boundary term
    # must move the gradient TOWARD finite differences of the edge-aware
    # renderer — right sign, and the FD gap strictly shrinks.  (A noise
    # term would move in an arbitrary direction; the absolute 10% FD
    # agreement is asserted by test_radius_grad_matches_fd_without_mask.)
    eps = 2e-3
    fd = (float(loss_ea(jnp.float32(eps)))
          - float(loss_ea(jnp.float32(-eps)))) / (2 * eps)
    assert np.sign(g_ea - g_plain) == np.sign(fd - g_plain), (
        f"boundary term has the wrong sign: analytic {g_ea} vs fd {fd} "
        f"(plain {g_plain})")
    assert abs(g_ea - fd) < abs(g_plain - fd), (
        f"boundary term widens the FD gap: analytic {g_ea} vs fd {fd} "
        f"(plain {g_plain})")


def _shadow_scene():
    """A scene whose occluder touches the image ONLY through its shadow:
    diffuse ground, one bright overhead light, a small sphere between
    them, camera looking at the shadow patch."""
    from srt_tpu.scene import Lights, Spheres, make_materials
    mats = make_materials([
        ((0.9, 0.9, 0.9), (0.1, 0.1, 0.1), 0.8, 0.0, False),  # ground
        ((0.8, 0.2, 0.2), (0.1, 0.1, 0.1), 0.8, 0.0, False),  # occluder
    ])
    spheres = Spheres(
        center=jnp.asarray([(0.0, -100.5, -2.0), (0.2, 0.5, -2.0)],
                           jnp.float32),
        radius=jnp.asarray([100.0, 0.3], jnp.float32),
        materials=mats)
    lights = Lights(
        position=jnp.asarray([(0.0, 3.0, -2.0)], jnp.float32),
        color=jnp.asarray([(1.0, 1.0, 1.0)], jnp.float32),
        intensity=jnp.asarray([30.0], jnp.float32))
    cam = CameraConfig(width=24, height=20, origin=(0.0, 0.4, -0.8),
                       look_at=(0.0, -0.6, -2.0))
    cfg = RenderConfig(max_depth=1, rr_bounces=0)
    n = cam.width * cam.height
    n_slots = rng_ops.total_slots(lights.count, 1)
    uniforms = jnp.asarray(rng_ops.host_uniforms(31, n, n_slots))
    return spheres, lights, cam, cfg, uniforms


def test_soft_shadow_only_touches_boundary_band():
    """soft_shadow_band blends only a band around the shadow edge; deep
    shadow and fully lit pixels keep hard-shadow values."""
    spheres, lights, cam, cfg, uniforms = _shadow_scene()
    hard = trace_edge_aware(spheres, lights, cam, cfg,
                            ArrayStream(uniforms))
    soft = trace_edge_aware(spheres, lights, cam, cfg,
                            ArrayStream(uniforms), soft_shadow_band=0.25)
    d = np.abs(np.asarray(hard) - np.asarray(soft)).max(axis=2)
    assert (d > 0).sum() > 10                 # the penumbra band exists
    assert (d == 0.0).mean() > 0.5            # interior untouched


def test_shadow_boundary_grad_matches_fd():
    """d(mean image)/d(occluder center): path-space alone is EXACTLY zero
    (the occluder appears only through the occlusion step function,
    ``CheckLightOccluded``, raytrace_compute.glsl:167-176); the
    soft-shadow reparameterization supplies the boundary term and
    finite differences confirm it."""
    spheres, lights, cam, cfg, uniforms = _shadow_scene()

    def loss(dx, band):
        s = spheres.replace(center=spheres.center.at[1, 0].add(dx))
        return jnp.mean(trace_edge_aware(
            s, lights, cam, cfg, ArrayStream(uniforms),
            soft_shadow_band=band))

    g_plain = float(jax.grad(loss)(jnp.float32(0.0), 0.0))
    assert g_plain == 0.0                     # the zero-gradient problem

    g = float(jax.grad(loss)(jnp.float32(0.0), 0.25))
    eps = 3e-3
    fd = (float(loss(jnp.float32(eps), 0.25))
          - float(loss(jnp.float32(-eps), 0.25))) / (2 * eps)
    assert np.isfinite(g) and abs(g) > 0.01   # a real, nonzero term
    assert abs(g - fd) <= 0.05 * abs(fd), f"analytic {g} vs fd {fd}"


# ---------------------------------------------------------------------------
# Reflected (secondary) silhouettes — models/edge_aware.py
# trace_edge_aware_reflection
# ---------------------------------------------------------------------------

def _mirror_scene():
    """A mirror sphere in view; a matte sphere BEHIND the camera, visible
    only in the reflection."""
    from srt_tpu.scene import Lights, Spheres, make_materials
    spheres = Spheres(
        center=jnp.asarray([(0.0, 0.0, -3.0),      # mirror
                            (0.0, 0.6, 4.5)],      # matte, behind camera
                           jnp.float32),
        radius=jnp.asarray([1.5, 1.0], jnp.float32),
        materials=make_materials([
            ((0.9, 0.9, 0.9), (1.0, 1.0, 1.0), 0.0, 1.0, True),
            ((0.8, 0.2, 0.1), (0.2, 0.2, 0.2), 0.6, 0.0, True),
        ]),
    )
    lights = Lights(
        position=jnp.asarray([(2.0, 3.0, 0.0)], jnp.float32),
        color=jnp.asarray([(1.0, 1.0, 1.0)], jnp.float32),
        intensity=jnp.asarray([30.0], jnp.float32))
    cam = CameraConfig(width=28, height=24, origin=(0.0, 0.0, 1.0),
                       look_at=(0.0, 0.0, -3.0))
    cfg = RenderConfig(max_depth=2, rr_bounces=0)
    n = cam.width * cam.height
    n_slots = rng_ops.total_slots(lights.count, 2)
    uniforms = jnp.asarray(rng_ops.host_uniforms(41, n, n_slots))
    return spheres, lights, cam, cfg, uniforms


def test_reflection_trace_matches_plain_without_mirrors():
    """With no mirror materials the reflection module must reproduce the
    one-jit scan integrator (same RNG slots, same radiometry)."""
    from srt_tpu.models.edge_aware import trace_edge_aware_reflection
    spheres, lights, cam, cfg, uniforms = _shadow_scene()
    plain = pathtracer.trace_with_uniforms(
        pathtracer.spheres_hit_fn(spheres), lights, cam, cfg, uniforms)
    # depth >= 2 for the module
    import dataclasses
    cfg2 = dataclasses.replace(cfg, max_depth=2)
    n_slots = rng_ops.total_slots(lights.count, 2)
    n = cam.width * cam.height
    u2 = jnp.asarray(rng_ops.host_uniforms(31, n, n_slots))
    plain = pathtracer.trace_with_uniforms(
        pathtracer.spheres_hit_fn(spheres), lights, cam, cfg2, u2)
    ea = trace_edge_aware_reflection(spheres, lights, cam, cfg2,
                                     ArrayStream(u2))
    np.testing.assert_allclose(np.asarray(ea), np.asarray(plain),
                               rtol=2e-5, atol=1e-6)


def test_reflected_silhouette_grad_closes_fd_gap():
    """d(mean image)/d(matte sphere y): the matte sphere is visible ONLY
    in the mirror, so its reflected silhouette is a pure secondary
    visibility step — path-space FD disagrees with jax.grad; the
    reflection reparameterization closes the gap."""
    from srt_tpu.models.edge_aware import trace_edge_aware_reflection
    spheres, lights, cam, cfg, uniforms = _mirror_scene()

    def loss_plain(dy):
        s = spheres.replace(center=spheres.center.at[1, 1].add(dy))
        return jnp.mean(pathtracer.trace_with_uniforms(
            pathtracer.spheres_hit_fn(s), lights, cam, cfg, uniforms))

    def loss_ea(dy):
        s = spheres.replace(center=spheres.center.at[1, 1].add(dy))
        return jnp.mean(trace_edge_aware_reflection(
            s, lights, cam, cfg, ArrayStream(uniforms)))

    g_plain = float(jax.grad(loss_plain)(jnp.float32(0.0)))
    g_ea = float(jax.grad(loss_ea)(jnp.float32(0.0)))

    # 1) The reparameterized image is genuinely differentiable: its own
    # fine FD matches jax.grad.
    eps = 1e-3
    fd = (float(loss_ea(jnp.float32(eps)))
          - float(loss_ea(jnp.float32(-eps)))) / (2 * eps)
    assert np.isfinite(g_ea)
    assert abs(g_ea - fd) <= 0.05 * abs(fd) + 1e-6, f"ea {g_ea} vs fd {fd}"

    # 2) The reflected-silhouette term is material: path-space misses it
    # ~5x.  (A FINE plain FD also misses it — at sub-pixel eps no
    # visibility flips occur, so the step contributes nothing — which is
    # precisely the zero-measure pathology being fixed.)
    assert abs(g_ea - g_plain) > 2.0 * abs(g_plain)

    # 3) A COARSE plain FD (eps wide enough to cross many reflected-
    # silhouette flips) estimates the TRUE derivative including the
    # boundary term — and lands on the reparameterized gradient, not the
    # path-space one (measured: 0.000562 vs ea 0.000531 / plain 0.000104).
    ce = 0.05
    fd_coarse = (float(loss_plain(jnp.float32(ce)))
                 - float(loss_plain(jnp.float32(-ce)))) / (2 * ce)
    assert abs(fd_coarse - g_ea) < 0.33 * abs(fd_coarse - g_plain), (
        f"coarse fd {fd_coarse}: ea {g_ea}, plain {g_plain}")
