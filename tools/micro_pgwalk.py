#!/usr/bin/env python
"""Tiled walk vs per-group walk (pgwalk) on the REAL per-bounce ray
distributions of the headline frame, plus pgwalk footprint statistics
(per-group cluster/super counts from the gmask cull) and the gmask cull's
own cost.  TPU only.  Not a test; a tuning tool."""

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
from srt_tpu.ops.traversal_pallas import pallas_model_hit
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
    print(f"scene: {scene.num_triangles} tris, {scene.woop.shape[0]} "
          f"clusters; {size}x{size}")

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
    work = [(o, d, jnp.ones((n,), bool))]
    for b in range(n_b - 1):
        u = u_all[b].T[carry[5]].T
        carry, _ = step(carry, b, u)
        work.append((carry[0], carry[1], carry[4]))

    for b, (origins, dirs, alive) in enumerate(work):
        n_alive = int(jnp.sum(alive))
        if n_alive == 0:
            continue
        width = min(max(4096, -(-n_alive // 4096) * 4096), n)
        o_b, d_b = origins[:, :width], dirs[:, :width]
        t_max = jnp.where(alive[:width], jnp.inf, 0.0)
        print(f"--- bounce {b + 1}: {n_alive} live (width {width}) ---")

        f_t = jax.jit(lambda o_, d_, tm: pallas_model_hit(
            scene, 0, o_, d_, tm, tile=128, refine=False))
        dt_t = timeit(f_t, o_b, d_b, t_max)
        tt, it_, _, _ = f_t(o_b, d_b, t_max)
        dt_p = dt_t
        agree = 1.0
        line = f"  closest: tiled {dt_t * 1e3:7.1f} ms"
        for mode in ("pg2:8", "pg2:16", "pg2:32"):
            f_p = jax.jit(lambda o_, d_, tm, m=mode: pallas_model_hit(
                scene, 0, o_, d_, tm, tile=128, refine=False, binned=m))
            dt_m = timeit(f_p, o_b, d_b, t_max)
            _, ip, _, _ = f_p(o_b, d_b, t_max)
            ag = float(jnp.mean((it_ == ip).astype(jnp.float32)))
            line += (f"  {mode} {dt_m * 1e3:6.1f} ms ({dt_t / dt_m:4.2f}x"
                     f" ag={ag:.4f})")
            if dt_m < dt_p:
                dt_p = dt_m
        print(line)

        # Shadow-style any-hit on the same origins: toward a random light,
        # segment-clipped t_max (the _occluded construction).
        if b > 0:
            lp = lights.position.T                          # [3, L]
            pick = jax.random.randint(jax.random.key(b), (width,), 0,
                                      lp.shape[1])
            delta = lp[:, pick] - o_b
            dist = jnp.sqrt(jnp.sum(delta * delta, axis=0))
            sdir = delta / jnp.maximum(dist, 1e-9)[None, :]
            s_tm = jnp.where(t_max > 0, dist, 0.0)
            f_st = jax.jit(lambda o_, d_, tm: pallas_model_hit(
                scene, 0, o_, d_, tm, tile=128, any_hit=True,
                t_min=1e-3))
            dt_st = timeit(f_st, o_b, sdir, s_tm)
            _, is_t, _, _ = f_st(o_b, sdir, s_tm)
            line = f"  shadow : tiled {dt_st * 1e3:7.1f} ms"
            for mode in ("pg2:16", "pg2:32"):
                f_sp = jax.jit(lambda o_, d_, tm, m=mode: pallas_model_hit(
                    scene, 0, o_, d_, tm, tile=128, any_hit=True,
                    t_min=1e-3, binned=m))
                dt_sp = timeit(f_sp, o_b, sdir, s_tm)
                _, is_p, _, _ = f_sp(o_b, sdir, s_tm)
                ag = float(jnp.mean(((is_t >= 0) == (is_p >= 0))
                                    .astype(jnp.float32)))
                line += (f"  {mode} {dt_sp * 1e3:6.1f} ms "
                         f"({dt_st / dt_sp:4.2f}x ag={ag:.4f})")
            print(line)

        from srt_tpu.ops import traversal_pallas as tp
        from srt_tpu.models.mesh import transform_rays
        o_m, d_m = transform_rays(scene.frames[0], o_b, d_b)
        npad = -(-width // (128 * 8)) * (128 * 8)
        pad = npad - width

        @jax.jit
        def gmask(o_m, d_m, tm):
            def padded(x, fill=0.0):
                return jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)
            rays8 = jnp.concatenate(
                [padded(o_m), padded(d_m, 1.0),
                 jnp.pad(tm, (0, pad))[None, :],
                 jnp.zeros((1, npad), jnp.float32)], axis=0).T
            ncl = scene.woop.shape[0]
            s_count = -(-ncl // tp.SUPER)
            c_cpad = -(-ncl // tp.CHUNK_C) * tp.CHUNK_C
            nan_pad = ((0, c_cpad - ncl), (0, 0))
            cmin_c = jnp.pad(scene.cluster_min, nan_pad,
                             constant_values=jnp.nan)
            cmax_c = jnp.pad(scene.cluster_max, nan_pad,
                             constant_values=jnp.nan)
            cb8 = jnp.concatenate(
                [cmin_c.T, cmax_c.T, jnp.zeros((2, c_cpad), jnp.float32)],
                axis=0)
            c_idx = jnp.arange(c_cpad)
            pow2 = (jnp.int32(1) << (c_idx % tp.SUPER)).astype(jnp.float32)
            w_bp = jnp.where(
                (c_idx[:, None] < ncl)
                & (c_idx[:, None] // tp.SUPER
                   == jnp.arange(s_count)[None, :]),
                pow2[:, None], 0.0).astype(jnp.float32)
            return tp._launch_cull_gmask(rays8, cb8, w_bp, 128, False)

        dt_cull = timeit(gmask, o_m, d_m, t_max)
        m = np.asarray(gmask(o_m, d_m, t_max))
        pc = np.zeros(m.shape, np.int64)
        for k in range(16):
            pc += (m >> k) & 1
        grp_cl = pc.sum(axis=1)
        grp_sp = (m != 0).sum(axis=1)
        live = grp_cl[grp_cl > 0]
        print(f"  tiled  : {dt_t * 1e3:7.1f} ms ({n_alive / dt_t / 1e6:5.1f}"
              f" Mrays/s)   pgwalk: {dt_p * 1e3:7.1f} ms "
              f"({n_alive / dt_p / 1e6:5.1f} Mrays/s)  "
              f"speedup {dt_t / dt_p:4.2f}x  idx-agree {agree:.6f}")
        print(f"  gmask cull: {dt_cull * 1e3:5.1f} ms; live groups "
              f"{live.size}/{grp_cl.size}; clusters/group mean "
              f"{live.mean():.1f} p90 {np.percentile(live, 90):.0f} "
              f"max {live.max()}; supers/group mean "
              f"{grp_sp[grp_cl > 0].mean():.1f}")


if __name__ == "__main__":
    main()
