"""Next-event estimation toward emissive (Ke) triangles (r5, cfg.nee;
models/emitters.py + the MIS blocks in models/pathtracer.bounce_step).

The reference parses Ke but never lights with it
(model_loader.cpp:240-273), and srt_tpu's hit-only emission credit makes
small emitters pure noise — NEE is the matching light-sampling strategy,
combined with BSDF sampling by the one-sample balance heuristic.  The
contract tested here:

* SAME EXPECTATION: the NEE estimator's many-key mean matches the
  hit-only estimator's (MIS is a variance tool, not a new light model);
* LOWER VARIANCE on the indirectly-lit region (the point of it);
* directly-visible emitters are credited identically (the no-MIS
  sentinel weight is exactly 1.0 in f32);
* delta-specular (roughness-0 metal) scenes stay finite and unbiased
  (the delta lobe is excluded from the area-sample side and sentinel-
  weighted on the hit side);
* gradients stay finite through the NEE path (emission + pose).
"""

import jax
import jax.numpy as jnp
import numpy as np

from srt_tpu.config import CameraConfig, RenderConfig
from srt_tpu.models import mesh as mesh_mod
from srt_tpu.models import pathtracer
from srt_tpu.models.emitters import build_emitters, emitter_indices, \
    scene_emitters
from srt_tpu.models.wavefront_compact import trace_image_compact
from srt_tpu.ops.rng import KeyStream
from srt_tpu.scene import Lights
from srt_tpu.utils import procgen
from srt_tpu.utils.flatten import flatten_models
from srt_tpu.utils.obj_loader import MaterialDef

CAM = CameraConfig(width=24, height=18, origin=(0.0, 3.0, 2.5),
                   look_at=(0.0, 0.6, 0.0))
# No point lights: emitter transport only, so the NEE-vs-hit-only
# comparison is not diluted by RIS direct lighting.  One negligible
# far-away light keeps the L >= 1 slot protocol intact.
DIM_LIGHTS = Lights(
    position=jnp.asarray([[0.0, 500.0, 0.0]], jnp.float32),
    color=jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32),
    intensity=jnp.asarray([1e-6], jnp.float32),
)


def lamp_scene():
    """Small bright lamp cube above and beside a large receiver cube —
    the camera looks down at the receiver TOP (the lamp-lit face), off
    the lamp's axis, so a wide pixel band is lit by the emitter only."""
    lamp = procgen.cube(
        size=0.3, center=(0.9, 1.8, 0.6),
        material=MaterialDef(diffuse=(0.0, 0.0, 0.0),
                             specular=(0.0, 0.0, 0.0),
                             emissive=(40.0, 32.0, 24.0)))
    recv = procgen.cube(
        size=2.2, center=(0.0, -0.4, 0.0),
        material=MaterialDef(diffuse=(0.7, 0.7, 0.7),
                             specular=(0.2, 0.2, 0.2)))
    return mesh_mod.upload(flatten_models([recv, lamp], pad_to=1))


def render_many(scene, emitters, nee, keys, cfg=None, hit_fn=None):
    """[K, H, W, 3] frames for K keys (vmapped full-width compact)."""
    if hit_fn is None:
        hit_fn = mesh_mod.mesh_hit_fn(scene, method="dense")
    n = CAM.width * CAM.height
    cfg = cfg or RenderConfig(max_depth=3, rr_bounces=0, sort_bounces=True,
                              nee=nee)
    sched = (n,) * (cfg.max_depth + cfg.rr_bounces)

    def one(k):
        img, _, _ = trace_image_compact(
            hit_fn, DIM_LIGHTS, CAM, cfg, KeyStream(k, n), sched,
            return_stats=True, emitters=emitters if nee else None)
        return img

    return np.asarray(jax.jit(jax.vmap(one))(keys))


def test_nee_same_mean_lower_variance():
    """Many-key means agree; per-pixel variance drops on the lit
    receiver."""
    scene = lamp_scene()
    em = scene_emitters(scene)
    assert em is not None and em.v0.shape[0] == 12
    np.testing.assert_allclose(float(jnp.sum(em.pick)), 1.0, rtol=1e-5)

    k_plain = jax.random.split(jax.random.key(1), 768)
    k_nee = jax.random.split(jax.random.key(2), 256)
    plain = render_many(scene, em, False, k_plain)
    nee = render_many(scene, em, True, k_nee)

    lum_p = plain.mean(axis=0).sum(axis=-1)
    lum_n = nee.mean(axis=0).sum(axis=-1)
    assert np.isfinite(plain).all() and np.isfinite(nee).all()
    # Total flux (measured 0.4% apart at these key counts; the hit-only
    # estimator's own stderr dominates the tolerance).
    np.testing.assert_allclose(lum_n.mean(), lum_p.mean(), rtol=0.05)

    # GEOMETRIC direct-view mask from depth-1 frames (+1px dilation for
    # pixel jitter): a radiance threshold on the full renders would also
    # catch bounce-hits-the-lamp spikes — the exact noise NEE removes.
    d1 = render_many(scene, em, False,
                     jax.random.split(jax.random.key(9), 16),
                     cfg=RenderConfig(max_depth=1, rr_bounces=0,
                                      sort_bounces=True))
    direct = d1.max(axis=(0, 3)) > 5.0
    for ax, sh in ((0, 1), (0, -1), (1, 1), (1, -1)):
        direct |= np.roll(direct, sh, axis=ax)
    bright = lum_p > np.percentile(lum_p, 70)
    roi = ~direct & bright                      # emitter-lit, not direct
    assert roi.sum() > 30
    np.testing.assert_allclose(lum_n[roi].mean(), lum_p[roi].mean(),
                               rtol=0.15)
    v_plain = plain.sum(-1).var(axis=0)[roi]
    v_nee = nee.sum(-1).var(axis=0)[roi]
    # Measured ratio ~0.06 (17x reduction); assert with headroom.
    assert v_nee.mean() < 0.25 * v_plain.mean(), \
        (v_nee.mean(), v_plain.mean())


def test_nee_direct_view_bit_identical():
    """Pixels whose primary ray hits the lamp credit Le with MIS weight
    EXACTLY 1.0 (the 1e30 sentinel swallows any real pdf in f32), so the
    one-key emitter pixels match the hit-only render bit-for-bit."""
    scene = lamp_scene()
    em = scene_emitters(scene)
    k = jax.random.split(jax.random.key(7), 1)
    plain = render_many(scene, em, False, k)[0]
    nee = render_many(scene, em, True, k)[0]
    # Same-key depth-1 frame -> identical jitter -> exact mask of pixels
    # whose PRIMARY ray hits the lamp (a full-render threshold would
    # also catch bounce-hit spikes, which NEE legitimately reweights).
    d1 = render_many(scene, em, False, k,
                     cfg=RenderConfig(max_depth=1, rr_bounces=0,
                                      sort_bounces=True))[0]
    direct = d1.max(axis=-1) > 5.0
    assert direct.any()
    np.testing.assert_array_equal(nee[direct], plain[direct])


def test_nee_delta_mirror_finite_and_unbiased():
    """Delta-specular lobes only exist on sphere materials (mesh
    conversion keeps roughness = 1/(Ns+eps) > 0): a roughness-0 metal
    mirror sphere under an emissive mesh lamp exercises the union-scene
    MIS path — the delta lobe is excluded from the area-sample side
    (pdf/fcos 0 in brdf.eval_lobes_pdf) and sentinel-weighted on the hit
    side (full Le credit through the mirror).  Finite images; the
    mirror-reflected lamp must show up with NEE enabled without
    double-brightening (means agree)."""
    from srt_tpu.scene import Spheres, make_materials

    lamp = procgen.cube(
        size=0.35, center=(0.0, 2.0, 0.0),
        material=MaterialDef(diffuse=(0.0, 0.0, 0.0),
                             specular=(0.0, 0.0, 0.0),
                             emissive=(40.0, 32.0, 24.0)))
    scene = mesh_mod.upload(flatten_models([lamp], pad_to=1))
    em = scene_emitters(scene)
    mirror = Spheres(
        center=jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32),
        radius=jnp.asarray([0.9], jnp.float32),
        materials=make_materials(
            [((0.9, 0.9, 0.9), (0.9, 0.9, 0.9), 0.0, 1.0, True)]))
    hit_fn = pathtracer.union_hit_fn(
        pathtracer.spheres_hit_fn(mirror),
        mesh_mod.mesh_hit_fn(scene, method="dense"))

    k_plain = jax.random.split(jax.random.key(3), 64)
    k_nee = jax.random.split(jax.random.key(4), 64)
    plain = render_many(scene, em, False, k_plain, hit_fn=hit_fn)
    nee = render_many(scene, em, True, k_nee, hit_fn=hit_fn)
    assert np.isfinite(plain).all() and np.isfinite(nee).all()
    # Delta transport (mirror -> lamp) is hit-only in both estimators
    # with MIS weight exactly 1.0: the reflected lamp is present either
    # way and total flux agrees (NEE must not double-brighten it).
    np.testing.assert_allclose(nee.mean(axis=0).sum(),
                               plain.mean(axis=0).sum(), rtol=0.05)
    lamp_seen = plain[0].max(axis=-1) > 5.0
    assert lamp_seen.any()
    assert (nee[0].max(axis=-1) > 5.0).any()


def test_nee_gradients_finite():
    """Gradients of an NEE render w.r.t. emission and pose are finite
    (the emitter build is traced through frames and mat_emissive)."""
    scene = lamp_scene()
    idx = emitter_indices(scene)
    hit_fn_of = lambda s: mesh_mod.mesh_hit_fn(s, method="dense")
    n = CAM.width * CAM.height
    cfg = RenderConfig(max_depth=2, rr_bounces=0, sort_bounces=True,
                       nee=True)

    def loss(dke):
        s = scene.replace(mat_emissive=scene.mat_emissive + dke)
        em = build_emitters(s, idx)
        img, _, _ = trace_image_compact(
            hit_fn_of(s), DIM_LIGHTS, CAM, cfg, KeyStream(
                jax.random.key(0), n), (n, n), return_stats=True,
            emitters=em)
        return jnp.mean(img)

    g = float(jax.jit(jax.grad(loss))(jnp.float32(0.0)))
    assert np.isfinite(g) and g > 0.0   # more emission -> brighter
