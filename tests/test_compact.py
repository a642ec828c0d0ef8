"""The compacted jittable trace (models/wavefront_compact.py) must
reproduce the scan-based integrator's image to float-ulp: the bounce
math is literally the same function (pathtracer.bounce_step), compaction
only re-schedules it over shrinking slices, and every pixel consumes its
own RNG slots via the position->pixel map.  Tolerances are a handful of
ulps, not zero, because XLA fuses a lax.scan body differently than the
same body unrolled (FMA formation differs); ray-count stats agree
EXACTLY."""

import jax
import jax.numpy as jnp
import numpy as np

from srt_tpu.config import CameraConfig, RenderConfig
from srt_tpu.models import mesh as mesh_mod
from srt_tpu.models import pathtracer
from srt_tpu.models.wavefront_compact import (discover_schedule,
                                              trace_compact,
                                              trace_image_compact)
from srt_tpu.ops.rng import ArrayStream, KeyStream, total_slots
from srt_tpu.scene import (default_sphere_scene, model_scene_lights,
                           sphere_scene_lights)
from srt_tpu.utils import procgen
from srt_tpu.utils.flatten import flatten_models

CAM = CameraConfig(width=32, height=32, origin=(0.0, 0.0, 0.0),
                   look_at=(0.0, 0.0, -1.0))
CFG = RenderConfig(max_depth=2, rr_bounces=1, sort_bounces=True)


def test_schedule_shape():
    """discover_schedule emits granule-rounded, non-increasing widths
    starting at N."""
    spheres = default_sphere_scene()
    lights = sphere_scene_lights()
    sched = discover_schedule(
        pathtracer.spheres_hit_fn(spheres), lights, CAM, CFG,
        jax.random.key(0), min_width=64, granule=64)
    n = CAM.width * CAM.height
    assert sched[0] == n
    assert all(a >= b for a, b in zip(sched, sched[1:]))
    assert all(w == n or w % 64 == 0 for w in sched)


def test_compact_matches_scan_spheres():
    """Sphere scene, ArrayStream: compact image == scan image to ulp,
    full-width schedule (compaction off) AND a shrinking schedule."""
    spheres = default_sphere_scene()
    lights = sphere_scene_lights()
    n = CAM.width * CAM.height
    from srt_tpu.ops import rng as rng_ops
    n_slots = total_slots(lights.count, CFG.max_depth + CFG.rr_bounces)
    uniforms = jnp.asarray(rng_ops.host_uniforms(5, n, n_slots))
    hit_fn = pathtracer.spheres_hit_fn(spheres)

    ref = jax.jit(lambda u: pathtracer.trace_with_uniforms(
        hit_fn, lights, CAM, CFG, u))(uniforms)

    for schedule in [(n, n, n), (n, 768, 512)]:
        img = jax.jit(lambda u, s=schedule: trace_image_compact(
            hit_fn, lights, CAM, CFG, ArrayStream(u), s))(uniforms)
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                                   rtol=1e-6, atol=3e-7,
                                   err_msg=f"schedule={schedule}")


def test_compact_matches_scan_mesh_keystream():
    """BVH mesh scene under a KeyStream with a DISCOVERED schedule: same
    key -> identical image, compaction genuinely engaged, no overflow."""
    scene = mesh_mod.upload(flatten_models([procgen.cube(size=2.0)],
                                           pad_to=1))
    lights = model_scene_lights()
    cam = CameraConfig(width=32, height=16, origin=(0.0, 1.0, 5.0),
                       look_at=(0.0, 0.0, 0.0))
    hit_fn = mesh_mod.mesh_hit_fn(scene, method="dense")
    n = cam.width * cam.height
    key = jax.random.key(3)

    ref = jax.jit(lambda k: pathtracer.trace_image_sample(
        hit_fn, lights, cam, CFG, KeyStream(k, n)))(key)

    schedule = discover_schedule(hit_fn, lights, cam, CFG,
                                 jax.random.key(99), min_width=64,
                                 granule=64)
    assert schedule[0] == n and schedule[-1] < n  # compaction engaged

    f = jax.jit(lambda k: trace_image_compact(
        hit_fn, lights, cam, CFG, KeyStream(k, n), schedule,
        return_stats=True))
    img, stats, overflow = f(key)
    assert int(overflow) == 0
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=1e-6, atol=3e-7)
    assert int(stats[0, 0]) == n
    assert 0 < int(stats[1, 0]) < n


def test_compact_stats_match_scan_stats():
    """Honest ray accounting must agree with the scan integrator's."""
    scene = mesh_mod.upload(flatten_models([procgen.cube(size=2.0)],
                                           pad_to=1))
    lights = model_scene_lights()
    cam = CameraConfig(width=16, height=16, origin=(0.0, 1.0, 5.0),
                       look_at=(0.0, 0.0, 0.0))
    hit_fn = mesh_mod.mesh_hit_fn(scene, method="dense")
    n = cam.width * cam.height
    key = jax.random.key(7)

    from srt_tpu.camera import derive_viewport, generate_rays
    from srt_tpu.ops.morton import PermutedStream, morton_perm, permute_rays
    s = KeyStream(key, n)
    jitter = s.take(2)
    o, d = generate_rays(derive_viewport(cam), cam.width, cam.height, jitter)
    perm, _ = morton_perm(cam.height, cam.width)
    o, d = permute_rays(o, d, perm)
    _, ref_stats = pathtracer.trace_wavefront(
        hit_fn, lights, o, d, PermutedStream(s, perm), CFG,
        return_stats=True)

    schedule = discover_schedule(hit_fn, lights, cam, CFG,
                                 jax.random.key(0), min_width=64,
                                 granule=64)
    _, stats, overflow = trace_image_compact(
        hit_fn, lights, cam, CFG, KeyStream(key, n), schedule,
        return_stats=True)
    assert int(overflow) == 0
    np.testing.assert_array_equal(np.asarray(stats),
                                  np.asarray(ref_stats, np.int64))


def test_compact_overflow_detected():
    """An under-provisioned schedule must REPORT dropped rays."""
    scene = mesh_mod.upload(flatten_models([procgen.cube(size=2.0)],
                                           pad_to=1))
    lights = model_scene_lights()
    cam = CameraConfig(width=16, height=16, origin=(0.0, 1.0, 5.0),
                       look_at=(0.0, 0.0, 0.0))
    hit_fn = mesh_mod.mesh_hit_fn(scene, method="dense")
    n = cam.width * cam.height
    # Absurdly tight: bounce 2 gets 1-ray width.
    _, _, overflow = trace_image_compact(
        hit_fn, lights, cam, CFG, KeyStream(jax.random.key(3), n),
        (n, 1, 1), return_stats=True)
    assert int(overflow) > 0


def test_compact_is_differentiable():
    """The compacted trace keeps exact transposes (slice/scatter-add):
    sphere-radius gradients match the scan integrator's."""
    spheres = default_sphere_scene()
    lights = sphere_scene_lights()
    cam = CameraConfig(width=16, height=12, origin=(0.0, 0.0, 0.0),
                       look_at=(0.0, 0.0, -1.0))
    cfg = RenderConfig(max_depth=2, rr_bounces=0, sort_bounces=True)
    n = cam.width * cam.height
    from srt_tpu.ops import rng as rng_ops
    n_slots = total_slots(lights.count, cfg.max_depth)
    uniforms = jnp.asarray(rng_ops.host_uniforms(11, n, n_slots))

    def loss_scan(dr):
        s = spheres.replace(radius=spheres.radius.at[3].add(dr))
        return jnp.mean(pathtracer.trace_with_uniforms(
            pathtracer.spheres_hit_fn(s), lights, cam, cfg, uniforms))

    def loss_compact(dr):
        s = spheres.replace(radius=spheres.radius.at[3].add(dr))
        img = trace_image_compact(
            pathtracer.spheres_hit_fn(s), lights, cam, cfg,
            ArrayStream(uniforms), (n, 128))
        return jnp.mean(img)

    g_scan = float(jax.jit(jax.grad(loss_scan))(jnp.float32(0.0)))
    g_compact = float(jax.jit(jax.grad(loss_compact))(jnp.float32(0.0)))
    assert np.isfinite(g_compact)
    np.testing.assert_allclose(g_compact, g_scan, rtol=1e-4)


def test_shadow_sort_bit_identical():
    """cfg.sort_shadows_from re-sorts the shadow batch by (dead, light,
    origin cell) before the any-hit trace and inverts the permutation —
    occlusion answers are order-independent, so the image must be
    BIT-identical (not ulp-close) to the unsorted trace, and stats must
    agree exactly (r5; models/pathtracer._occluded_sorted)."""
    import dataclasses

    scene = mesh_mod.upload(flatten_models([procgen.uv_sphere(12, 16)],
                                           pad_to=1))
    lights = model_scene_lights()
    cam = CameraConfig(width=32, height=16, origin=(0.0, 1.0, 5.0),
                       look_at=(0.0, 0.0, 0.0))
    hit_fn = mesh_mod.mesh_hit_fn(scene, method="dense")
    n = cam.width * cam.height
    key = jax.random.key(5)
    sched = (n, n, n)

    def run(cfg):
        return jax.jit(lambda k: trace_image_compact(
            hit_fn, lights, cam, cfg, KeyStream(k, n), sched,
            return_stats=True))(key)

    base = RenderConfig(max_depth=3, rr_bounces=0, sort_bounces=True)
    img0, st0, _ = run(base)
    for start in (0, 1):
        img1, st1, _ = run(dataclasses.replace(base,
                                               sort_shadows_from=start))
        np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1),
                                      err_msg=f"sort_shadows_from={start}")
        np.testing.assert_array_equal(np.asarray(st0), np.asarray(st1))
