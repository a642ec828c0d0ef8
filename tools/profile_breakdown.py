#!/usr/bin/env python
"""Where does the frame time go?  Times isolated stages of the bench frame
on the real TPU: closest-hit kernel, any-hit kernel, shading-only trace
(stub hit fn), and the full wavefront.  Not a test; a tuning tool."""

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
    mesh_data = load_object("/root/reference/objects/Rubik/Rubik.obj")
    scene = mesh_mod.upload(flatten_models([mesh_data], pad_to=128))
    lights = model_scene_lights()
    size = int(os.environ.get("SRT_BENCH_SIZE", "512"))
    cam = CameraConfig(width=size, height=size, origin=(0.0, 20.0, 20.0),
                       look_at=(0.0, 1.0, -1.0))
    cfg = RenderConfig(max_depth=4, rr_bounces=0, spp=1)
    tile = int(os.environ.get("SRT_KERNEL_TILE", "512"))
    hit_fn = mesh_mod.mesh_hit_fn(scene, method="pallas")
    n = cam.width * cam.height

    from srt_tpu.camera import derive_viewport, generate_rays
    vp = derive_viewport(cam)
    stream = KeyStream(jax.random.key(0), n)
    jitter = stream.take(2)
    origins, dirs = jax.jit(
        lambda j: generate_rays(vp, cam.width, cam.height, j))(jitter)
    jax.block_until_ready(origins)

    # 1. closest hit, full shading record
    f_closest = jax.jit(lambda o, d: hit_fn(o, d, 1e-3, jnp.inf))
    dt = timeit(f_closest, origins, dirs)
    print(f"closest-hit (full Hit record): {dt*1e3:8.2f} ms "
          f"({n/dt/1e6:6.1f} Mrays/s)")

    # 2. any-hit
    f_any = jax.jit(lambda o, d: hit_fn(o, d, 1e-3,
                                        jnp.full((n,), 30.0), any_hit=True))
    dt = timeit(f_any, origins, dirs)
    print(f"any-hit (shadow):              {dt*1e3:8.2f} ms "
          f"({n/dt/1e6:6.1f} Mrays/s)")

    # 3. raw kernel only (candidates, no refine/shading)
    from srt_tpu.ops.traversal_pallas import pallas_model_hit
    f_raw = jax.jit(lambda o, d: pallas_model_hit(
        scene, 0, o, d, jnp.full((n,), jnp.inf), tile=tile, refine=False))
    dt = timeit(f_raw, origins, dirs)
    print(f"raw kernel (occ + intersect):  {dt*1e3:8.2f} ms "
          f"({n/dt/1e6:6.1f} Mrays/s)")

    # 3b. occupancy alone
    from srt_tpu.ops import traversal_pallas as tp
    from srt_tpu.models.mesh import transform_rays
    o_m, d_m = jax.jit(lambda o, d: transform_rays(scene.frames[0], o, d))(
        origins, dirs)
    rays8 = jnp.concatenate(
        [o_m, d_m, jnp.full((1, n), 1e30), jnp.zeros((1, n))], axis=0).T
    nc = scene.cluster_min.shape[0]
    s_count = -(-nc // tp.SUPER)
    c_pad = s_count * tp.SUPER - nc
    cmin_p = jnp.pad(scene.cluster_min, ((0, c_pad), (0, 0)),
                     constant_values=tp.BIG)
    cmax_p = jnp.pad(scene.cluster_max, ((0, c_pad), (0, 0)),
                     constant_values=-tp.BIG)
    smin = cmin_p.reshape(s_count, tp.SUPER, 3).min(axis=1)
    smax = cmax_p.reshape(s_count, tp.SUPER, 3).max(axis=1)
    sbounds = jnp.concatenate(
        [smin.T, smax.T, jnp.zeros((2, s_count), jnp.float32)], axis=0)
    f_occ = jax.jit(lambda r: tp._launch_cull(r, sbounds, tile, False))
    dt = timeit(f_occ, rays8)
    print(f"cull kernel alone:             {dt*1e3:8.2f} ms")

    # 4. shading-only trace: stub hit fn (no kernel) to isolate integrator
    def stub_hit(o, d, t_min, t_max, any_hit=False):
        nr = o.shape[1]
        t = jnp.full((nr,), 5.0)
        hit = jnp.ones((nr,), bool)
        p = o + t[None, :] * d
        from srt_tpu.scene import Materials
        zeros = jnp.zeros_like(p)
        mat = Materials(albedo=p * 0 + 0.5, specular=zeros + 0.04,
                        roughness=jnp.full((nr,), 0.5),
                        metalness=jnp.full((nr,), 0.1),
                        use_spec=jnp.ones((nr,), bool))
        nrm = -d
        return pathtracer.Hit(hit=hit, t=t, p=p, normal=nrm, mat=mat)

    def run_stub(key):
        s = KeyStream(key, n)
        s.take(2)
        return pathtracer.trace_wavefront(stub_hit, lights, origins, dirs,
                                          s, cfg)
    f_stub = jax.jit(run_stub)
    dt = timeit(f_stub, jax.random.key(1))
    print(f"integrator w/ stub hit fn:     {dt*1e3:8.2f} ms  (4 bounces)")

    # 5. full frame
    def run(key):
        from srt_tpu.ops.morton import PermutedStream, morton_perm
        s = KeyStream(key, n)
        jit2 = s.take(2)
        o, d = generate_rays(vp, cam.width, cam.height, jit2)
        perm, inv = morton_perm(cam.height, cam.width)
        c, st = pathtracer.trace_wavefront(
            hit_fn, lights, o[:, perm], d[:, perm],
            PermutedStream(s, perm), cfg, return_stats=True)
        return c[:, inv], st
    f_full = jax.jit(run)
    c, st = f_full(jax.random.key(2))
    jax.block_until_ready(c)
    dt = timeit(f_full, jax.random.key(3))
    st = np.asarray(st)
    print(f"full frame:                    {dt*1e3:8.2f} ms")
    print(f"per-bounce [alive, active]:\n{st}")
    rays = st.sum()
    print(f"useful rays {rays}  -> {rays/dt/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
