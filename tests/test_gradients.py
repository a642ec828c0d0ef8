"""Differentiable-rendering correctness: analytic gradients vs finite
differences (the BASELINE.md gradient metric).

Path-space gradients treat discrete decisions (hit ids, lobe choice, RR,
light pick) as fixed, so they are exact for pixels whose decisions don't
flip under the perturbation; silhouette pixels contribute boundary terms
that require edge sampling (SURVEY.md hard-part #2, future work).  Tests
therefore (a) use fixed injected uniforms so the estimator is a
deterministic function of parameters, and (b) restrict geometry-parameter
checks to decision-stable pixels.

Material/light parameters are checked against finite differences of the
*independent numpy oracle* (the CPU reference path); geometry parameters
against finite differences of the renderer itself on stable pixels.
"""

import jax
import jax.numpy as jnp
import numpy as np

from srt_tpu.config import CameraConfig, RenderConfig
from srt_tpu.models import pathtracer, reference_cpu
from srt_tpu.ops import rng as rng_ops
from srt_tpu.scene import default_sphere_scene, sphere_scene_lights
from tests.test_sphere_pathtracer import oracle_scene

CAM = CameraConfig(width=12, height=10, origin=(0, 0, 0), look_at=(0, 0, -1))
CFG = RenderConfig(max_depth=2, rr_bounces=0)


def setup():
    spheres = default_sphere_scene()
    lights = sphere_scene_lights()
    n = CAM.width * CAM.height
    n_slots = rng_ops.total_slots(lights.count, CFG.max_depth + CFG.rr_bounces)
    uniforms = rng_ops.host_uniforms(seed=5, n_rays=n, n_slots=n_slots)
    return spheres, lights, uniforms


def render_jax(spheres, lights, uniforms):
    return pathtracer.trace_with_uniforms(
        pathtracer.spheres_hit_fn(spheres), lights, CAM, CFG,
        jnp.asarray(uniforms),
    )


def render_oracle(spheres, lights, uniforms, **overrides):
    sc = oracle_scene(spheres, lights)
    for k, v in overrides.items():
        setattr(sc, k, v)
    return reference_cpu.render_image(
        sc, CAM.width, CAM.height, CAM.origin, CAM.look_at, uniforms,
        max_depth=CFG.max_depth, rr_bounces=CFG.rr_bounces,
    )


def test_albedo_grad_matches_oracle_fd():
    spheres, lights, uniforms = setup()

    def loss(albedo):
        s = spheres.replace(materials=spheres.materials.replace(albedo=albedo))
        return jnp.mean(render_jax(s, lights, uniforms))

    g = jax.grad(loss)(spheres.materials.albedo)

    eps = 1e-3
    a0 = np.asarray(spheres.materials.albedo).copy()
    # Check two entries: red sphere R channel, ground G channel.
    for (mi, ci) in [(3, 0), (1, 1)]:
        ap = a0.copy(); ap[mi, ci] += eps
        am = a0.copy(); am[mi, ci] -= eps
        fp = render_oracle(spheres, lights, uniforms, albedo=ap).mean()
        fm = render_oracle(spheres, lights, uniforms, albedo=am).mean()
        fd = (fp - fm) / (2 * eps)
        assert abs(float(g[mi, ci]) - fd) <= 2e-3 * max(1.0, abs(fd)), (
            f"albedo[{mi},{ci}]: analytic {float(g[mi, ci])} vs fd {fd}"
        )


def test_light_intensity_grad_matches_oracle_fd():
    spheres, lights, uniforms = setup()

    def loss(intensity):
        l2 = lights.replace(intensity=intensity)
        return jnp.mean(render_jax(spheres, l2, uniforms))

    g = jax.grad(loss)(lights.intensity)
    eps = 1e-2
    i0 = np.asarray(lights.intensity).copy()
    for li in range(2):
        ip = i0.copy(); ip[li] += eps
        im = i0.copy(); im[li] -= eps
        fp = render_oracle(spheres, lights, uniforms, lint=ip).mean()
        fm = render_oracle(spheres, lights, uniforms, lint=im).mean()
        fd = (fp - fm) / (2 * eps)
        assert abs(float(g[li]) - fd) <= 5e-3 * max(1.0, abs(fd)), (
            f"intensity[{li}]: analytic {float(g[li])} vs fd {fd}"
        )


def test_roughness_grad_matches_oracle_fd():
    spheres, lights, uniforms = setup()

    def loss(rough):
        s = spheres.replace(materials=spheres.materials.replace(roughness=rough))
        return jnp.mean(render_jax(s, lights, uniforms))

    g = jax.grad(loss)(spheres.materials.roughness)
    eps = 1e-3
    r0 = np.asarray(spheres.materials.roughness).copy()
    for mi in [2, 4]:  # green (0.3), yellow (0.7) — away from clamps
        rp = r0.copy(); rp[mi] += eps
        rm = r0.copy(); rm[mi] -= eps
        fp = render_oracle(spheres, lights, uniforms, rough=rp).mean()
        fm = render_oracle(spheres, lights, uniforms, rough=rm).mean()
        fd = (fp - fm) / (2 * eps)
        assert abs(float(g[mi]) - fd) <= 5e-3 * max(1.0, abs(fd)), (
            f"roughness[{mi}]: analytic {float(g[mi])} vs fd {fd}"
        )


def _stable_mask(spheres, lights, uniforms, perturb, eps):
    """Pixels whose primary-hit sphere id is identical under +/-eps."""
    def first_hit(s):
        from srt_tpu.camera import derive_viewport, generate_rays
        from srt_tpu.ops import intersect
        vp = derive_viewport(CAM)
        o, d = generate_rays(vp, CAM.width, CAM.height,
                             jnp.asarray(uniforms[:, :2]).T)
        hit, t, idx = intersect.sphere_hit(o, d, s.center, s.radius,
                                           CFG.t_min, jnp.full(o.shape[1], jnp.inf))
        return np.asarray(hit), np.asarray(jnp.where(hit, idx, -1))

    h0, i0 = first_hit(perturb(spheres, 0.0))
    hp, ip = first_hit(perturb(spheres, eps))
    hm, im = first_hit(perturb(spheres, -eps))
    return (i0 == ip) & (i0 == im)


def test_sphere_geometry_grad_matches_fd_on_stable_pixels():
    spheres, lights, uniforms = setup()
    eps = 1e-3

    def perturb_radius(s, dr):
        return s.replace(radius=s.radius.at[3].add(dr))

    stable = _stable_mask(spheres, lights, uniforms, perturb_radius, eps)
    mask = jnp.asarray(stable, jnp.float32)[:, None]
    assert stable.sum() > 50  # most pixels are stable

    def loss(dr):
        img = render_jax(perturb_radius(spheres, dr), lights, uniforms)
        return jnp.sum(img.reshape(-1, 3) * mask) / stable.sum()

    g = jax.grad(loss)(jnp.float32(0.0))
    fp = float(loss(jnp.float32(eps)))
    fm = float(loss(jnp.float32(-eps)))
    fd = (fp - fm) / (2 * eps)
    assert abs(float(g) - fd) <= 2e-2 * max(1.0, abs(fd)), (
        f"radius: analytic {float(g)} vs fd {fd}"
    )


def test_camera_origin_grad_is_finite_and_nonzero():
    """Camera pose is differentiable through ray generation."""
    spheres, lights, uniforms = setup()

    def loss(origin):
        stream = pathtracer.ArrayStream(jnp.asarray(uniforms))
        img = pathtracer.trace_image_sample(
            pathtracer.spheres_hit_fn(spheres), lights, CAM, CFG, stream,
            origin=origin,
        )
        return jnp.mean(img)

    g = jax.grad(loss)(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 1e-6
