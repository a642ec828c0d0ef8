"""Mesh shadow-boundary gradients (models/edge_aware_shadow.py).

The mesh analog of tests/test_visibility_gradients.py's shadow tests: an
occluder cube that the camera never sees casts a shadow on a ground
mesh.  Path-space gradients w.r.t. the occluder's vertices are EXACTLY
zero (the occluder appears only through ``CheckLightOccluded``'s step
function, raytrace_compute.glsl:167-176); the silhouette-penetration
ramp supplies the boundary term and finite differences confirm it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from srt_tpu.config import CameraConfig, RenderConfig
from srt_tpu.models import mesh as mesh_mod
from srt_tpu.models.edge_aware_shadow import mesh_soft_shadow_fn
from srt_tpu.models.pathtracer import trace_wavefront
from srt_tpu.ops import rng as rng_ops
from srt_tpu.ops.rng import ArrayStream
from srt_tpu.scene import Lights
from srt_tpu.utils import procgen
from srt_tpu.utils.flatten import flatten_models


def _scene():
    # Ground: a large thin box at y=-1; occluder: a unit cube hovering
    # between the light and the ground, OUT of the camera frustum.
    ground = procgen.cube(size=8.0, center=(0.0, -1.6, -2.0))
    occ = procgen.cube(size=1.0, center=(0.0, 1.5, -2.0))
    scene = mesh_mod.upload(flatten_models([ground, occ]))
    lights = Lights(
        position=jnp.asarray([(0.0, 4.0, -2.0)], jnp.float32),
        color=jnp.asarray([(1.0, 1.0, 1.0)], jnp.float32),
        intensity=jnp.asarray([40.0], jnp.float32))
    cam = CameraConfig(width=24, height=20, origin=(0.0, 0.2, -0.6),
                       look_at=(0.0, -1.0, -2.0))
    cfg = RenderConfig(max_depth=1, rr_bounces=0)
    n = cam.width * cam.height
    n_slots = rng_ops.total_slots(lights.count, 1)
    uniforms = jnp.asarray(rng_ops.host_uniforms(33, n, n_slots))
    # Occluder vertices are the ones above the ground (y > 0).
    occ_mask = (np.asarray(scene.positions)[:, 1] > 0.0).astype(np.float32)
    return scene, lights, cam, cfg, uniforms, jnp.asarray(occ_mask)


def _trace(scene, lights, cam, cfg, uniforms, shadow_fn):
    from srt_tpu.camera import derive_viewport, generate_rays
    vp = derive_viewport(cam)
    o, d = generate_rays(vp, cam.width, cam.height, uniforms[:, 0:2].T)
    hit = mesh_mod.mesh_hit_fn(scene, method="dense")
    return trace_wavefront(hit, lights, o, d,
                           ArrayStream(uniforms[:, 2:]), cfg,
                           shadow_fn=shadow_fn)


def test_mesh_soft_shadow_touches_only_boundary_band():
    scene, lights, cam, cfg, uniforms, _ = _scene()
    hard = np.asarray(_trace(scene, lights, cam, cfg, uniforms, None))
    soft = np.asarray(_trace(scene, lights, cam, cfg, uniforms,
                             mesh_soft_shadow_fn(scene, band=0.3)))
    d = np.abs(hard - soft).max(axis=0)
    assert (d > 0).sum() > 5                  # a penumbra band exists
    assert (d == 0.0).mean() > 0.5            # interior + lit untouched


def test_mesh_shadow_boundary_grad_matches_fd():
    scene, lights, cam, cfg, uniforms, occ_mask = _scene()

    def loss(dx, band):
        pos = scene.positions + dx * occ_mask[:, None] * jnp.asarray(
            [1.0, 0.0, 0.0])
        s = mesh_mod.with_positions(scene, pos)
        shadow = (mesh_soft_shadow_fn(s, band=band) if band > 0.0
                  else None)
        return jnp.mean(_trace(s, lights, cam, cfg, uniforms, shadow))

    # Path-space alone: the occluder is invisible to the camera and depth
    # is 1, so its vertices only enter through the binary occlusion test
    # -> exactly zero gradient.
    g_plain = float(jax.grad(loss)(jnp.float32(0.0), 0.0))
    assert g_plain == 0.0

    g = float(jax.grad(loss)(jnp.float32(0.0), 0.3))
    # Small eps: the coverage ramp has clip() kinks, so the FD stencil
    # must stay inside one smooth piece (measured: diff 7e-6 at 3e-4,
    # converging linearly from 1.9e-3 at 1e-2).
    eps = 3e-4
    fd = (float(loss(jnp.float32(eps), 0.3))
          - float(loss(jnp.float32(-eps), 0.3))) / (2 * eps)
    assert np.isfinite(g) and abs(g) > 1e-4, f"no boundary term: {g}"
    assert abs(g - fd) <= 0.02 * abs(fd) + 1e-6, f"analytic {g} vs fd {fd}"


def test_mesh_soft_shadow_converges_to_binary():
    """band -> 0 approaches the hard-shadow image away from the exact
    silhouette line."""
    scene, lights, cam, cfg, uniforms, _ = _scene()
    hard = np.asarray(_trace(scene, lights, cam, cfg, uniforms, None))
    tiny = np.asarray(_trace(scene, lights, cam, cfg, uniforms,
                             mesh_soft_shadow_fn(scene, band=1e-4)))
    assert (np.abs(hard - tiny).max(axis=0) > 1e-6).mean() < 0.02
