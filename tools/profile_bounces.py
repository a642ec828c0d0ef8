#!/usr/bin/env python
"""Per-bounce cost decomposition of the HEADLINE bench frame on the real
TPU: marginal wall time of each bounce (depth sweep), the shadow pass's
share (occlusion stubbed out), and per-bounce live-ray counts — the data
that decides where the next perf round goes.  Not a test; a tuning tool.

Usage: python tools/profile_bounces.py  (TPU backend)
Env: SRT_BENCH_SIZE (default 1024), SRT_BENCH_ROWS/COLS (headline mesh).
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
from srt_tpu.utils.procgen import uv_sphere


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
    rows = int(os.environ.get("SRT_BENCH_ROWS", "160"))
    cols = int(os.environ.get("SRT_BENCH_COLS", "320"))
    size = int(os.environ.get("SRT_BENCH_SIZE", "1024"))
    mesh_data = uv_sphere(rows, cols, radius=2.0)
    scene = mesh_mod.upload(flatten_models([mesh_data], pad_to=128))
    lights = model_scene_lights()
    cam = CameraConfig(width=size, height=size, origin=(0.0, 1.0, 5.0),
                       look_at=(0.0, 0.0, 0.0))
    hit_fn = mesh_mod.mesh_hit_fn(scene, method="pallas")
    n = cam.width * cam.height
    print(f"scene: {mesh_data.num_triangles} tris, {size}x{size} "
          f"({n/1e6:.2f} Mray wavefront)")

    from srt_tpu.camera import derive_viewport, generate_rays
    from srt_tpu.ops.morton import PermutedStream, morton_perm, permute_rays
    vp = derive_viewport(cam)
    perm, _ = morton_perm(cam.height, cam.width)

    def frame(key, cfg):
        s = KeyStream(key, n)
        jit2 = s.take(2)
        o, d = generate_rays(vp, cam.width, cam.height, jit2)
        o, d = permute_rays(o, d, perm)
        return pathtracer.trace_wavefront(
            hit_fn, lights, o, d, PermutedStream(s, perm), cfg,
            return_stats=True)

    # --- depth sweep: marginal cost of each bounce ---
    prev = 0.0
    stats4 = None
    for depth in (1, 2, 3, 4):
        cfg = RenderConfig(max_depth=depth, rr_bounces=0, spp=1,
                           sort_bounces=True)
        f = jax.jit(lambda k, c=cfg: frame(k, c))
        dt = timeit(f, jax.random.key(0))
        _, stats = f(jax.random.key(0))
        stats = np.asarray(stats)
        if depth == 4:
            stats4 = stats
        print(f"depth={depth}: {dt*1e3:8.1f} ms  "
              f"(marginal bounce {depth}: {(dt-prev)*1e3:7.1f} ms)  "
              f"per-bounce rays (trace, shadow): {stats.tolist()}")
        prev = dt

    # --- shadow share: occlusion stubbed to all-unoccluded ---
    real_occ = pathtracer._occluded
    try:
        pathtracer._occluded = lambda ch, p, lp, tmin, active=None: (
            jnp.zeros(p.shape[1], bool))
        cfg = RenderConfig(max_depth=4, rr_bounces=0, spp=1,
                           sort_bounces=True)
        f = jax.jit(lambda k, c=cfg: frame(k, c))
        dt_ns = timeit(f, jax.random.key(0))
        print(f"depth=4, NO shadow rays: {dt_ns*1e3:8.1f} ms "
              f"(shadow pass = {(prev-dt_ns)*1e3:7.1f} ms)")
    finally:
        pathtracer._occluded = real_occ

    # --- no bounce sorting (isolates the sort/gather cost vs win) ---
    cfg = RenderConfig(max_depth=4, rr_bounces=0, spp=1, sort_bounces=False)
    f = jax.jit(lambda k, c=cfg: frame(k, c))
    dt = timeit(f, jax.random.key(0))
    print(f"depth=4, NO bounce sort: {dt*1e3:8.1f} ms")

    # --- raw kernel on the primary wavefront (upper bound) ---
    from srt_tpu.ops.traversal_pallas import pallas_model_hit
    s = KeyStream(jax.random.key(0), n)
    jit2 = s.take(2)
    o, d = jax.jit(lambda j: permute_rays(
        *generate_rays(vp, cam.width, cam.height, j), perm))(jit2)
    jax.block_until_ready(o)
    for tile in (128, 256):
        f_raw = jax.jit(lambda o, d, t=tile: pallas_model_hit(
            scene, 0, o, d, jnp.full((n,), jnp.inf), tile=t, refine=False))
        dt = timeit(f_raw, o, d)
        print(f"raw kernel, primary rays, tile={tile}: {dt*1e3:8.1f} ms "
              f"({n/dt/1e6:6.1f} Mrays/s)")

    if stats4 is not None:
        total = int(stats4.sum())
        print(f"total rays/frame (depth 4): {total/1e6:.2f} M")


if __name__ == "__main__":
    main()
