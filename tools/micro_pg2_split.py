#!/usr/bin/env python
"""Split timing of the pg2 pipeline (cull kernel vs walk kernel) on the
REAL per-bounce ray distributions of the headline frame, per (G, W).
TPU only.  Not a test; a tuning tool feeding ROADMAP r5."""

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
from srt_tpu.models.mesh import transform_rays
from srt_tpu.ops import traversal_pallas as tp
from srt_tpu.ops.traversal_pallas import pallas_model_hit
from srt_tpu.ops.rng import KeyStream
from srt_tpu.scene import model_scene_lights
from srt_tpu.utils.flatten import flatten_models
from srt_tpu.utils.procgen import uv_sphere


def timeit(fn, *args, reps=10, warm=1):
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
    spp = int(os.environ.get("SRT_SPP", "1"))
    scene = mesh_mod.upload(
        flatten_models([uv_sphere(rows, cols, radius=2.0)], pad_to=128))
    lights = model_scene_lights()
    cam = CameraConfig(width=size, height=size, origin=(0.0, 1.0, 5.0),
                       look_at=(0.0, 0.0, 0.0))
    cfg = RenderConfig(max_depth=4, rr_bounces=0, spp=spp,
                       sort_bounces=True, uniform_use_spec=True)
    hit_fn = mesh_mod.mesh_hit_fn(scene, method="pallas")
    n = cam.width * cam.height * spp

    from srt_tpu.camera import derive_viewport, generate_rays
    from srt_tpu.ops.morton import morton_perm, permute_rays
    s = KeyStream(jax.random.key(0), n)
    jitter = s.take(2)
    o, d = generate_rays(derive_viewport(cam), cam.width, cam.height, jitter)
    perm, _ = morton_perm(cam.height, cam.width)
    if spp > 1:
        perm = (perm[:, None] * spp
                + np.arange(spp, dtype=perm.dtype)[None, :]).reshape(-1)
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
    pix_hist = [carry[5]]
    for b in range(n_b - 1):
        u = u_all[b].T[carry[5]].T
        carry, _ = step(carry, b, u)
        work.append((carry[0], carry[1], carry[4]))
        pix_hist.append(carry[5])

    ncl = scene.woop.shape[0]
    s_count = -(-ncl // tp.SUPER)
    c_cpad = -(-ncl // tp.CHUNK_C) * tp.CHUNK_C
    nan_pad = ((0, c_cpad - ncl), (0, 0))
    cmin_c = jnp.pad(scene.cluster_min, nan_pad, constant_values=jnp.nan)
    cmax_c = jnp.pad(scene.cluster_max, nan_pad, constant_values=jnp.nan)
    cb8 = jnp.concatenate(
        [cmin_c.T, cmax_c.T, jnp.zeros((2, c_cpad), jnp.float32)], axis=0)
    c_idx = jnp.arange(c_cpad)
    pow2 = (jnp.int32(1) << (c_idx % tp.SUPER)).astype(jnp.float32)
    w_bp = jnp.where(
        (c_idx[:, None] < ncl)
        & (c_idx[:, None] // tp.SUPER == jnp.arange(s_count)[None, :]),
        pow2[:, None], 0.0).astype(jnp.float32)
    cmin_p = jnp.pad(scene.cluster_min, nan_pad, constant_values=tp.BIG)
    cmax_p = jnp.pad(scene.cluster_max, nan_pad, constant_values=-tp.BIG)
    smin = cmin_p.reshape(-1, tp.SUPER, 3).min(axis=1)[:s_count]
    smax = cmax_p.reshape(-1, tp.SUPER, 3).max(axis=1)[:s_count]
    sbounds = jnp.concatenate(
        [smin.T, smax.T, jnp.zeros((2, s_count), jnp.float32)], axis=0)

    dump = os.environ.get("SRT_DUMP")
    if dump:
        # Raw per-bounce wavefronts for offline ordering experiments
        # (tools/micro_sortkeys.py).  pix column: sample id, to recover
        # same-pixel sample adjacency in any reordering.
        np.savez_compressed(
            dump, spp=spp,
            **{f"b{b}_{k}": np.asarray(v)
               for b, (o_, d_, a_) in enumerate(work)
               for k, v in (("o", o_), ("d", d_), ("alive", a_))},
            **{f"b{b}_pix": np.asarray(c)
               for b, c in enumerate(pix_hist)})
        print(f"dumped {len(work)} bounces to {dump}")
        if os.environ.get("SRT_DUMP_ONLY"):
            return

    for b, (origins, dirs, alive) in enumerate(work):
        n_alive = int(jnp.sum(alive))
        if n_alive == 0 or b == 0:
            continue
        width = min(max(4096, -(-n_alive // 4096) * 4096), n)
        o_b, d_b = origins[:, :width], dirs[:, :width]
        t_max = jnp.where(alive[:width], jnp.inf, 0.0)
        o_m, d_m = transform_rays(scene.frames[0], o_b, d_b)
        tile = 128
        npad = -(-width // (tile * 8)) * (tile * 8)
        pad = npad - width

        def mk_rays(o_m=o_m, d_m=d_m, tm=t_max, npad=npad, pad=pad):
            def padded(x, fill=0.0):
                return jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)
            return jnp.concatenate(
                [padded(o_m), padded(d_m, 1.0),
                 jnp.pad(tm, (0, pad))[None, :],
                 jnp.zeros((1, npad), jnp.float32)], axis=0).T
        rays8 = jax.jit(mk_rays)()
        rays8.block_until_ready()

        print(f"--- bounce {b + 1}: {n_alive} live (width {width}) ---")
        glist = tuple(int(x) for x in os.environ.get(
            "SRT_GLIST", "16,32,64,128").split(",") if x)
        for g in glist:
            cull = jax.jit(lambda r, g=g: tp._launch_cull_pg2(
                r, cb8, w_bp, tile, False, group=g))
            dt_c = timeit(cull, rays8)
            clist, bits, counts = cull(rays8)
            wlist = tuple(int(x) for x in os.environ.get(
                'SRT_WLIST', '4').split(','))
            for w in wlist:
                walk = jax.jit(lambda cl, bi, co, r, g=g, w=w:
                               tp._launch_pgwalk2(
                                   cl, bi, co, r, scene.woop, False,
                                   any_hit=False, group=g, ewidth=w))
                dt_w = timeit(walk, clist, bits, counts, rays8)
                cnt = np.asarray(counts)[:, 0]
                bb = np.asarray(bits)
                pc = np.zeros(bb.shape, np.int64)
                for kk in range(16):
                    pc += (bb >> kk) & 1
                ent_idx = np.arange(bb.shape[1])[None, :] < cnt[:, None]
                cl_grp = np.where(ent_idx, pc, 0).sum(axis=1)
                live = cl_grp[cnt > 0]
                print(f"  pg2:{g}:{w}  cull {dt_c*1e3:6.2f} ms  walk "
                      f"{dt_w*1e3:6.2f} ms  total {(dt_c+dt_w)*1e3:6.2f} ms"
                      f"  ({n_alive/(dt_c+dt_w)/1e6:5.1f} Mrays/s)  "
                      f"groups live {int((cnt>0).sum())}/{cnt.size} "
                      f"entries mean {cnt[cnt>0].mean():.1f} "
                      f"clusters/grp mean {live.mean():.1f} "
                      f"p90 {np.percentile(live, 90):.0f}")

        # Shadow-style any-hit on the same origins: toward the nearest
        # light, segment-clipped t_max (the _occluded construction).
        lp = jnp.asarray(lights.position).T                 # [3, L]
        d2 = jnp.sum((lp[:, None, :] - o_b[:, :, None]) ** 2, axis=0)
        pick = jnp.argmin(d2, axis=1)
        delta = lp[:, pick] - o_b
        dist = jnp.sqrt(jnp.sum(delta * delta, axis=0))
        sdir = delta / jnp.maximum(dist, 1e-9)[None, :]
        s_tm = jnp.where(t_max > 0, dist, 0.0)
        f_st = jax.jit(lambda o_, d_, tm: pallas_model_hit(
            scene, 0, o_, d_, tm, tile=128, any_hit=True, t_min=1e-3))
        dt_st = timeit(f_st, o_b, sdir, s_tm)
        _, is_t, _, _ = f_st(o_b, sdir, s_tm)
        occl = float(jnp.mean((is_t >= 0).astype(jnp.float32)))
        line = (f"  shadow (occl {occl:.2f}): tiled {dt_st*1e3:7.1f} ms")
        for mode in ("pg2:32:4", "pg2:64:4", "pg2:128:4"):
            f_sp = jax.jit(lambda o_, d_, tm, m=mode: pallas_model_hit(
                scene, 0, o_, d_, tm, tile=128, any_hit=True,
                t_min=1e-3, binned=m))
            dt_sp = timeit(f_sp, o_b, sdir, s_tm)
            _, is_p, _, _ = f_sp(o_b, sdir, s_tm)
            ag = float(jnp.mean(((is_t >= 0) == (is_p >= 0))
                                .astype(jnp.float32)))
            line += (f"  {mode} {dt_sp*1e3:6.1f} ms ({dt_st/dt_sp:4.2f}x"
                     f" ag={ag:.4f})")
        print(line)


if __name__ == "__main__":
    main()
