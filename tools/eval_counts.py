#!/usr/bin/env python
"""Roofline analysis of the production intersect kernel on the REAL
headline workload (ROADMAP "still open #2").

Captures the true per-bounce ray distributions of the headline frame,
then for each bounce runs the cull + intersect pipeline with the
kernel's eval counters on (ops/traversal_pallas count_evals=True) and
reports:

* supers processed and clusters evaluated per launch (ground truth, not
  estimates) and evals/ray;
* wall time of the UNinstrumented launch, ns per cluster eval, achieved
  eval GFLOP/s vs the VPU speed-of-light;
* a least-squares decomposition  time = a*supers + b*clusters + c*tiles
  across the bounce workloads — the per-super fixed cost vs per-cluster
  eval cost split that decides what finer-grained traversal can win.

TPU only.  Not a test; a tuning tool.
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
from srt_tpu.ops.traversal_pallas import CLUSTER, pallas_model_hit
from srt_tpu.scene import model_scene_lights
from srt_tpu.utils.flatten import flatten_models
from srt_tpu.utils.procgen import uv_sphere

# Cost model per cluster evaluation on a [tile, 128] block: ~24 FMAs
# (Woop rows) + ~8 compare/select ops -> ~2*24+8 = 56 flops/element.
FLOPS_PER_EVAL_ELEM = 56.0
# v5e VPU speed-of-light: 8x128 lanes x 4 ALUs x 2 (FMA) x ~0.94 GHz.
VPU_PEAK_GFLOPS = 8 * 128 * 4 * 2 * 0.94  # ~7.7 TFLOP/s


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
    tile = int(os.environ.get("SRT_TILE", "128"))
    scene = mesh_mod.upload(
        flatten_models([uv_sphere(rows, cols, radius=2.0)], pad_to=128))
    lights = model_scene_lights()
    cam = CameraConfig(width=size, height=size, origin=(0.0, 1.0, 5.0),
                       look_at=(0.0, 0.0, 0.0))
    cfg = RenderConfig(max_depth=4, rr_bounces=0, spp=1, sort_bounces=True)
    hit_fn = mesh_mod.mesh_hit_fn(scene, method="pallas")
    n = cam.width * cam.height
    n_super = -(-scene.woop.shape[0] // 16)
    print(f"scene: {scene.num_triangles} tris, {scene.woop.shape[0]} "
          f"clusters, {n_super} supers; {size}x{size}; tile={tile}")

    # Real per-bounce wavefronts (Morton-ordered + bounce-sorted, exactly
    # what the compact driver feeds the kernel).
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
    work = [(o, d, jnp.ones((n,), bool))]   # rays entering bounce 1
    for b in range(n_b - 1):
        u = u_all[b].T[carry[5]].T
        carry, _ = step(carry, b, u)
        work.append((carry[0], carry[1], carry[4]))

    rows_out = []
    for b, (origins, dirs, alive) in enumerate(work):
        n_alive = int(jnp.sum(alive))
        if n_alive == 0:
            continue
        width = min(max(4096, -(-n_alive // 4096) * 4096), n)
        o_b, d_b = origins[:, :width], dirs[:, :width]
        t_max = jnp.where(alive[:width], jnp.inf, 0.0)

        f_prod = jax.jit(lambda o_, d_, tm: pallas_model_hit(
            scene, 0, o_, d_, tm, tile=tile, refine=False))
        f_ctr = jax.jit(lambda o_, d_, tm: pallas_model_hit(
            scene, 0, o_, d_, tm, tile=tile, refine=False,
            count_evals=True)[4])
        dt = timeit(f_prod, o_b, d_b, t_max)
        ctr = np.asarray(f_ctr(o_b, d_b, t_max))
        sp, ce = int(ctr[:, 0].sum()), int(ctr[:, 1].sum())
        n_tiles = ctr.shape[0]
        flops = ce * tile * CLUSTER * FLOPS_PER_EVAL_ELEM
        gf = flops / dt / 1e9
        print(f"bounce {b + 1}: {n_alive:8d} live | supers proc {sp:7d} "
              f"({sp / n_tiles:6.1f}/tile) | clusters {ce:8d} "
              f"({ce * CLUSTER / max(n_alive, 1):7.0f} tri-evals/ray) | "
              f"{dt * 1e3:7.1f} ms  {dt / max(ce, 1) * 1e9:6.0f} ns/ceval "
              f"| {gf:7.0f} GF/s = {gf / VPU_PEAK_GFLOPS * 100:4.1f}% VPU "
              f"| {n_alive / dt / 1e6:6.1f} Mrays/s")
        rows_out.append((sp, ce, n_tiles, dt))

    if len(rows_out) >= 3:
        a = np.array([[r[0], r[1], r[2]] for r in rows_out], float)
        y = np.array([r[3] for r in rows_out], float)
        coef, *_ = np.linalg.lstsq(a, y, rcond=None)
        print(f"\nfit time = a*supers + b*clusters + c*tiles:\n"
              f"  a = {coef[0] * 1e9:8.0f} ns/super (fixed per-super cost)\n"
              f"  b = {coef[1] * 1e9:8.0f} ns/cluster-eval\n"
              f"  c = {coef[2] * 1e9:8.0f} ns/tile (launch+epilogue)")
        resid = a @ coef - y
        print(f"  residual: {np.abs(resid / y).max() * 100:.1f}% max")
        # Speed of light for the eval term alone.
        b_sol = tile * CLUSTER * FLOPS_PER_EVAL_ELEM / VPU_PEAK_GFLOPS
        print(f"  VPU speed-of-light b = {b_sol:.0f} ns/cluster-eval "
              f"(measured {coef[1] * 1e9:.0f})")


if __name__ == "__main__":
    main()
