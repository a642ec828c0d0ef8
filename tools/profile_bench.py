#!/usr/bin/env python
"""Decompose the headline bench frame into component timings on the TPU.

Times: full frame, closest-hit-only bounce loop, single closest-hit call,
occupancy pass alone, RNG draw alone, shading-only (hit stubbed).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from srt_tpu.config import CameraConfig, RenderConfig
from srt_tpu.models import mesh as mesh_mod
from srt_tpu.models import pathtracer
from srt_tpu.ops.rng import KeyStream
from srt_tpu.scene import model_scene_lights
from srt_tpu.utils.flatten import flatten_models
from srt_tpu.utils.obj_loader import load_object
from srt_tpu.camera import derive_viewport, generate_rays


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:9.2f} ms")
    return dt


def main():
    mesh_data = load_object("/root/reference/objects/Rubik/Rubik.obj")
    scene = mesh_mod.upload(flatten_models([mesh_data], pad_to=128))
    lights = model_scene_lights()
    size = 512
    cam = CameraConfig(width=size, height=size, origin=(0.0, 20.0, 20.0),
                       look_at=(0.0, 1.0, -1.0))
    cfg = RenderConfig(max_depth=4, rr_bounces=0, spp=1)
    hit_fn = mesh_mod.mesh_hit_fn(scene, method="pallas")
    n = cam.width * cam.height

    vp = derive_viewport(cam)
    key = jax.random.key(0)

    def full(key):
        stream = KeyStream(key, n)
        jitter = stream.take(2)
        origins, dirs = generate_rays(vp, cam.width, cam.height, jitter)
        return pathtracer.trace_wavefront(hit_fn, lights, origins, dirs,
                                          stream, cfg)

    def rng_only(key):
        stream = KeyStream(key, n)
        num_lights = lights.count
        d_slots = 2 * num_lights + 6
        return stream.take(4 * d_slots + 2)

    def raygen(key):
        stream = KeyStream(key, n)
        jitter = stream.take(2)
        return generate_rays(vp, cam.width, cam.height, jitter)

    origins, dirs = jax.jit(raygen)(key)
    origins = jax.block_until_ready(origins)
    tmax = jnp.full((n,), jnp.inf)

    def hit_once(origins, dirs):
        rec = hit_fn(origins, dirs, 1e-3, tmax)
        return rec.t, rec.hit

    def hit_loop4(origins, dirs):
        # 4 closest-hit + 4 any-hit (shadow) calls, mimicking the frame's
        # kernel count, with trivial direction update between.
        t_acc = jnp.zeros((n,))
        o, d = origins, dirs
        for _ in range(4):
            rec = hit_fn(o, d, 1e-3, tmax)
            occ = hit_fn(rec.p, -d, 1e-3, jnp.where(rec.hit, 10.0, 0.0),
                         any_hit=True)
            t_acc = t_acc + jnp.where(rec.hit, rec.t, 0.0) + occ.t * 0
            o = jnp.where(rec.hit[:, None], rec.p, o)
            d = jnp.where(rec.hit[:, None], -d, d)
        return t_acc

    def closest_only4(origins, dirs):
        t_acc = jnp.zeros((n,))
        o, d = origins, dirs
        for _ in range(4):
            rec = hit_fn(o, d, 1e-3, tmax)
            t_acc = t_acc + jnp.where(rec.hit, rec.t, 0.0)
            o = jnp.where(rec.hit[:, None], rec.p, o)
            d = jnp.where(rec.hit[:, None], -d, d)
        return t_acc

    from srt_tpu.ops.traversal_pallas import (
        _launch_occupancy, pallas_model_hit, DEFAULT_TILE)

    def kernel_only(origins, dirs):
        t, i, u, v = pallas_model_hit(scene, 0, origins, dirs, tmax)
        return t

    def occupancy_only(origins, dirs):
        o_m, d_m = mesh_mod.transform_rays(scene.frames[0], origins, dirs)
        tile = DEFAULT_TILE
        pad = (-n) % (tile * 8)
        npad = n + pad
        o_p = jnp.pad(o_m, ((0, pad), (0, 0)))
        d_p = jnp.pad(d_m, ((0, pad), (0, 0)), constant_values=1.0)
        t_p = jnp.pad(tmax, (0, pad))
        rays8 = jnp.concatenate(
            [o_p, d_p, t_p.reshape(npad, 1),
             jnp.zeros((npad, 1), jnp.float32)], axis=1)
        ncl = scene.cluster_min.shape[0]
        bounds = jnp.concatenate(
            [scene.cluster_min.T, scene.cluster_max.T,
             jnp.zeros((2, ncl), jnp.float32)], axis=0)
        occ = _launch_occupancy(rays8, bounds, tile, False)
        return occ

    timeit("full frame", jax.jit(full), key)
    timeit("rng draw (74 slots)", jax.jit(rng_only), key)
    timeit("raygen", jax.jit(raygen), key)
    timeit("hit+shadow x4 (no shading)", jax.jit(hit_loop4), origins, dirs)
    timeit("closest-hit x4 (no shading)", jax.jit(closest_only4), origins, dirs)
    timeit("single closest-hit (full wrapper)", jax.jit(hit_once), origins, dirs)
    timeit("single kernel call (pallas_model_hit)", jax.jit(kernel_only), origins, dirs)
    timeit("occupancy pass only", jax.jit(occupancy_only), origins, dirs)


if __name__ == "__main__":
    main()


def profile_shading():
    """Time the bounce-loop shading with the hit stubbed to a cheap fake."""
    from srt_tpu.models.pathtracer import Hit, trace_wavefront
    from srt_tpu.scene import Materials, model_scene_lights
    from srt_tpu.config import CameraConfig, RenderConfig
    from srt_tpu.camera import derive_viewport, generate_rays
    from srt_tpu.ops.rng import KeyStream

    lights = model_scene_lights()
    size = 512
    cam = CameraConfig(width=size, height=size, origin=(0.0, 20.0, 20.0),
                       look_at=(0.0, 1.0, -1.0))
    cfg = RenderConfig(max_depth=4, rr_bounces=0, spp=1)
    n = cam.width * cam.height
    vp = derive_viewport(cam)
    key = jax.random.key(0)

    def fake_hit(origins, dirs, t_min, t_max, any_hit=False):
        t = jnp.full((origins.shape[0],), 2.0)
        hit = origins[:, 0] * 0 < 1  # all true
        p = origins + t[:, None] * dirs
        nrm = jnp.broadcast_to(jnp.array([0., 1., 0.]), p.shape)
        mat = Materials(
            albedo=jnp.broadcast_to(jnp.array([.5, .5, .5]), p.shape),
            specular=jnp.broadcast_to(jnp.array([.5, .5, .5]), p.shape),
            roughness=jnp.full((n,), 0.3),
            metalness=jnp.full((n,), 0.1),
            use_spec=jnp.ones((n,), bool),
        )
        return Hit(hit=hit, t=t, p=p, normal=nrm, mat=mat)

    def shade_only(key):
        stream = KeyStream(key, n)
        jitter = stream.take(2)
        origins, dirs = generate_rays(vp, cam.width, cam.height, jitter)
        return trace_wavefront(fake_hit, lights, origins, dirs, stream, cfg)

    timeit("bounce loop, stub hit (shading only)", jax.jit(shade_only), key)


profile_shading()
