#!/usr/bin/env python
"""Bisect the full-frame time: depth sweep, no-shadow variant, ArrayStream
variant (pre-drawn uniforms), and a scan-of-hits-only variant."""

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
from srt_tpu.ops.rng import ArrayStream, KeyStream, total_slots
from srt_tpu.scene import model_scene_lights
from srt_tpu.utils.flatten import flatten_models
from srt_tpu.utils.obj_loader import load_object


def timeit(fn, *args, reps=5, warm=1):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    mesh_data = load_object("/root/reference/objects/Rubik/Rubik.obj")
    scene = mesh_mod.upload(flatten_models([mesh_data], pad_to=128))
    lights = model_scene_lights()
    size = 512
    cam = CameraConfig(width=size, height=size, origin=(0.0, 20.0, 20.0),
                       look_at=(0.0, 1.0, -1.0))
    hit_fn = mesh_mod.mesh_hit_fn(scene, method="pallas")
    n = cam.width * cam.height

    from srt_tpu.camera import derive_viewport, generate_rays
    vp = derive_viewport(cam)

    def frame(key, cfg):
        s = KeyStream(key, n)
        jit2 = s.take(2)
        o, d = generate_rays(vp, cam.width, cam.height, jit2)
        return pathtracer.trace_wavefront(hit_fn, lights, o, d, s, cfg)

    for depth in (1, 2, 4):
        cfg = RenderConfig(max_depth=depth, rr_bounces=0, spp=1)
        f = jax.jit(lambda k, c=cfg: frame(k, c))
        dt = timeit(f, jax.random.key(0))
        print(f"frame depth={depth}:            {dt*1e3:8.2f} ms")

    cfg4 = RenderConfig(max_depth=4, rr_bounces=0, spp=1)

    # no-shadow variant
    orig_occ = pathtracer._occluded
    pathtracer._occluded = lambda ch, p, lp, tm, active=None: jnp.zeros(
        (p.shape[0],), bool)
    f = jax.jit(lambda k: frame(k, cfg4))
    dt = timeit(f, jax.random.key(0))
    print(f"frame depth=4 no-shadow:      {dt*1e3:8.2f} ms")
    pathtracer._occluded = orig_occ

    # pre-drawn uniforms (ArrayStream on device array)
    slots = total_slots(lights.count, 4)
    u = jax.device_put(np.random.default_rng(0).uniform(
        size=(n, slots)).astype(np.float32))

    def frame_arr(u, cfg):
        s = ArrayStream(u)
        jit2 = s.take(2)
        o, d = generate_rays(vp, cam.width, cam.height, jit2)
        return pathtracer.trace_wavefront(hit_fn, lights, o, d, s, cfg)

    f = jax.jit(lambda uu: frame_arr(uu, cfg4))
    dt = timeit(f, u)
    print(f"frame depth=4 ArrayStream:    {dt*1e3:8.2f} ms")

    # scan-of-hits-only: same scan structure, hit calls only
    def hits_only(key):
        s = KeyStream(key, n)
        jit2 = s.take(2)
        o, d = generate_rays(vp, cam.width, cam.height, jit2)

        def body(carry, _):
            o, d, alive = carry
            rec = hit_fn(o, d, 1e-3, jnp.where(alive, jnp.inf, 0.0))
            occ = pathtracer._occluded(
                hit_fn, rec.p, jnp.asarray([0., 10., 0.]), 1e-3,
                active=alive & rec.hit)
            alive = alive & rec.hit & ~occ
            return (rec.p, jnp.where(alive[:, None], rec.normal, d), alive), None

        init = (o, d, jnp.ones((n,), bool))
        (o, d, alive), _ = jax.lax.scan(body, init, None, length=4)
        return o

    f = jax.jit(hits_only)
    dt = timeit(f, jax.random.key(0))
    print(f"scan of 4x(closest+shadow):   {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
