#!/usr/bin/env python
"""Per-RAY vs per-GROUP vs per-TILE cluster footprints on the real
bounce distributions (numpy, sampled) — decides whether the waste in the
traversal is the 8-ray grouping (union >> per-ray) or the 128-triangle
clustering itself (per-ray already large).  Not a test; a tuning tool."""

import os
import sys

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

    cmin = np.asarray(scene.cluster_min)   # [C, 3]
    cmax = np.asarray(scene.cluster_max)
    root_lo, root_hi = cmin.min(0), cmax.max(0)
    sample = 16384

    for b, (origins, dirs, alive) in enumerate(work):
        n_alive = int(jnp.sum(alive))
        if n_alive == 0:
            continue
        take = min(sample, n_alive)
        o_b = np.asarray(origins[:, :take]).T    # [S, 3]
        d_b = np.asarray(dirs[:, :take]).T
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / d_b                       # [S, 3]
            b0 = (root_lo[None] - o_b) * inv
            b1 = (root_hi[None] - o_b) * inv
            btn = np.minimum(b0, b1).max(1)
            btf = np.maximum(b0, b1).min(1)
            t_clip = np.where((btn <= btf) & (btf >= 0),
                              btf * (1 + 1e-4) + 1e-3, 0.0)
            t0 = (cmin[None] - o_b[:, None]) * inv[:, None]   # [S, C, 3]
            t1 = (cmax[None] - o_b[:, None]) * inv[:, None]
            tn = np.minimum(t0, t1).max(2)
            tf = np.maximum(t0, t1).min(2)
        sel = np.where(tn >= 0, tn, tf)
        occ = (tn <= tf) & (tf >= 0) & (sel < t_clip[:, None])  # [S, C]
        per_ray = occ.sum(1)
        uni = {}
        for gs in (4, 8, 16, 32, 64, 128):
            uni[gs] = occ[: take - take % gs].reshape(
                -1, gs, occ.shape[1]).any(1).sum(1).mean()
        print(f"bounce {b + 1} ({n_alive} live, {take} sampled): "
              f"clusters/ray mean {per_ray.mean():.1f} p50 "
              f"{np.percentile(per_ray, 50):.0f} p90 "
              f"{np.percentile(per_ray, 90):.0f} | unions "
              + " ".join(f"{gs}:{uni[gs]:.1f}" for gs in uni))

        # Shadow-ray analog: these origins ARE the previous bounce's hit
        # points; cast to a random one of the scene's lights with the
        # segment-clipped t_max (the _occluded construction,
        # models/pathtracer.py).
        if b == 0:
            continue
        lp = np.asarray(lights.position)                   # [L, 3]
        pick = np.random.default_rng(b).integers(0, lp.shape[0], take)
        delta = lp[pick] - o_b
        dist = np.sqrt((delta ** 2).sum(1))
        sd = delta / np.maximum(dist[:, None], 1e-9)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / sd
            b0 = (root_lo[None] - o_b) * inv
            b1 = (root_hi[None] - o_b) * inv
            btn = np.minimum(b0, b1).max(1)
            btf = np.maximum(b0, b1).min(1)
            t_clip = np.where((btn <= btf) & (btf >= 0),
                              btf * (1 + 1e-4) + 1e-3, 0.0)
            t_eff = np.minimum(dist, t_clip)
            t0 = (cmin[None] - o_b[:, None]) * inv[:, None]
            t1 = (cmax[None] - o_b[:, None]) * inv[:, None]
            tn = np.minimum(t0, t1).max(2)
            tf = np.maximum(t0, t1).min(2)
        sel = np.where(tn >= 0, tn, tf)
        occ = (tn <= tf) & (tf >= 0) & (sel < t_eff[:, None])
        per_ray = occ.sum(1)
        uni = {}
        for gs in (8, 16, 32, 128):
            uni[gs] = occ[: take - take % gs].reshape(
                -1, gs, occ.shape[1]).any(1).sum(1).mean()
        print(f"  shadow rays from these origins: clusters/ray mean "
              f"{per_ray.mean():.1f} p50 {np.percentile(per_ray, 50):.0f} "
              f"p90 {np.percentile(per_ray, 90):.0f} | unions "
              + " ".join(f"{gs}:{uni[gs]:.1f}" for gs in uni))


if __name__ == "__main__":
    main()
