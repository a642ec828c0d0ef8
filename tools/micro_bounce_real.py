#!/usr/bin/env python
"""Capture the REAL per-bounce ray distributions of the headline frame
(by stepping pathtracer.bounce_step from the host) and measure, per
bounce:

* intersect-kernel wall time and Mrays/s on the live prefix, per tile
* the cull kernel's active-super histogram (per-tile union breadth — the
  quantity that actually drives cluster-kernel cost)

This answers "why are bounce rays slow" with the real workload instead
of synthetic ray sets.  TPU only.  Not a test; a tuning tool.
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
    scene = mesh_mod.upload(
        flatten_models([uv_sphere(rows, cols, radius=2.0)], pad_to=128))
    lights = model_scene_lights()
    cam = CameraConfig(width=size, height=size, origin=(0.0, 1.0, 5.0),
                       look_at=(0.0, 0.0, 0.0))
    cfg = RenderConfig(max_depth=4, rr_bounces=0, spp=1, sort_bounces=True)
    hit_fn = mesh_mod.mesh_hit_fn(scene, method="pallas")
    n = cam.width * cam.height

    # Primary wavefront, Morton order, same as the bench.
    from srt_tpu.camera import derive_viewport, generate_rays
    from srt_tpu.ops.morton import morton_perm, permute_rays
    s = KeyStream(jax.random.key(0), n)
    jitter = s.take(2)
    o, d = generate_rays(derive_viewport(cam), cam.width, cam.height, jitter)
    perm, _ = morton_perm(cam.height, cam.width)
    o, d = permute_rays(o, d, perm)
    d_slots = 2 * lights.count + 6
    n_b = cfg.max_depth + cfg.rr_bounces
    u_all = s.take(n_b * d_slots).reshape(n_b, d_slots, n)

    step = jax.jit(lambda c, b, u: pathtracer.bounce_step(
        hit_fn, lights, cfg, c, b, u, sort=True))
    carry = (o, d, jnp.ones((3, n), jnp.float32),
             jnp.zeros((3, n), jnp.float32), jnp.ones((n,), bool),
             jnp.asarray(perm, jnp.int32))
    captured = []
    for b in range(n_b):
        u = u_all[b].T[carry[5]].T
        carry, _ = step(carry, b, u)
        captured.append((carry[0], carry[1], carry[4]))

    from srt_tpu.models.mesh import transform_rays
    from srt_tpu.ops import traversal_pallas as tp
    from srt_tpu.ops.traversal_pallas import pallas_model_hit

    for b, (origins, dirs, alive) in enumerate(captured[:-1]):
        n_alive = int(jnp.sum(alive))
        if n_alive == 0:
            continue
        width = min(max(4096, -(-n_alive // 4096) * 4096), n)
        o_b = origins[:, :width]
        d_b = dirs[:, :width]
        t_max = jnp.where(alive[:width], jnp.inf, 0.0)
        print(f"\n--- rays entering bounce {b + 2}/{n_b}: {n_alive} live "
              f"(sliced to {width}) ---")
        for tile in (256, 128):
            f = jax.jit(lambda o, d, tm, t=tile: pallas_model_hit(
                scene, 0, o, d, tm, tile=t, refine=False))
            dt = timeit(f, o_b, d_b, t_max)
            print(f"  closest-hit tile={tile}: {dt*1e3:7.1f} ms "
                  f"({n_alive/dt/1e6:5.1f} Mrays/s live)")

        # Union breadth: run the cull directly, histogram active supers.
        tile = 128
        o_m, d_m = transform_rays(scene.frames[0], o_b, d_b)
        npad = -(-width // (tile * 8)) * (tile * 8)
        pad = npad - width

        def padded(x, fill=0.0):
            return jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)

        rays8 = jnp.concatenate([
            padded(o_m), padded(d_m, 1.0),
            jnp.pad(t_max, (0, pad))[None, :],
            jnp.zeros((1, npad), jnp.float32)], axis=0).T
        n_clusters = scene.woop.shape[0]
        s_count = -(-n_clusters // tp.SUPER)
        c_pad = s_count * tp.SUPER - n_clusters
        cmin_p = jnp.pad(scene.cluster_min, ((0, c_pad), (0, 0)),
                         constant_values=tp.BIG)
        cmax_p = jnp.pad(scene.cluster_max, ((0, c_pad), (0, 0)),
                         constant_values=-tp.BIG)
        smin = cmin_p.reshape(s_count, tp.SUPER, 3).min(axis=1)
        smax = cmax_p.reshape(s_count, tp.SUPER, 3).max(axis=1)
        sbounds = jnp.concatenate(
            [smin.T, smax.T, jnp.zeros((2, s_count), jnp.float32)], axis=0)
        _, _, counts = tp._launch_cull(rays8, sbounds, tile, False)
        c = np.asarray(counts).reshape(-1)
        live_tiles = c[c > 0]
        print(f"  cull tile=128: {s_count} supers total; live tiles "
              f"{live_tiles.size}/{c.size}; active supers/live tile: "
              f"mean {live_tiles.mean():.1f}, p50 "
              f"{np.percentile(live_tiles, 50):.0f}, p90 "
              f"{np.percentile(live_tiles, 90):.0f}, max {live_tiles.max()}")


if __name__ == "__main__":
    main()
