#!/usr/bin/env python
"""Headline benchmark: forward Mrays/s/chip at 4-bounce path tracing on the
benchmark BVH mesh scene (BASELINE.md north star: >= 100 Mrays/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Ray accounting is honest: the integrator reports per-bounce alive/shadow
counts (models/pathtracer.py stats) and only rays actually traced are
counted — not the padded wavefront width.

Scene: the reference's Rubik OBJ when the mirror is present (1,188 tris),
else an equivalent procedural Rubik-style mesh.  The Airplane OBJ is absent
from the reference mirror (.MISSING_LARGE_BLOBS), so the high-poly config
uses a procedural UV-sphere of comparable triangle count; see bench_suite.py
for the full grid.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MRAYS = 100.0  # target Mrays/s/chip (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from srt_tpu.config import CameraConfig, RenderConfig
    from srt_tpu.models import mesh as mesh_mod
    from srt_tpu.models import pathtracer
    from srt_tpu.ops.rng import KeyStream
    from srt_tpu.scene import model_scene_lights
    from srt_tpu.utils.flatten import flatten_models

    ref_rubik = "/root/reference/objects/Rubik/Rubik.obj"
    if os.path.exists(ref_rubik):
        from srt_tpu.utils.obj_loader import load_object
        mesh_data = load_object(ref_rubik)
        # The reference's own model-scene camera (raytrace_compute.glsl:
        # 378-380) — the model fills the frame, like the interactive app.
        cam_origin, cam_look = (0.0, 20.0, 20.0), (0.0, 1.0, -1.0)
    else:
        from srt_tpu.utils.procgen import rubik_grid
        mesh_data = rubik_grid()
        cam_origin, cam_look = (0.0, 1.5, 3.0), (0.0, 0.0, 0.0)

    method = os.environ.get("SRT_BENCH_METHOD", "auto")
    if method == "auto":
        try:
            from srt_tpu.ops import traversal_pallas  # noqa: F401
            method = "pallas" if jax.default_backend() == "tpu" else "dense"
        except ImportError:
            method = "dense"

    scene = mesh_mod.upload(
        flatten_models([mesh_data], pad_to=128 if method == "pallas" else 1)
    )
    lights = model_scene_lights()
    size = int(os.environ.get("SRT_BENCH_SIZE", "512"))
    cam = CameraConfig(width=size, height=size, origin=cam_origin,
                       look_at=cam_look)
    cfg = RenderConfig(max_depth=4, rr_bounces=0, spp=1)
    hit_fn = mesh_mod.mesh_hit_fn(
        scene, method=method,
        ray_tile=int(os.environ.get("SRT_BENCH_TILE", "8192")),
    )
    n = cam.width * cam.height

    def run(key):
        stream = KeyStream(key, n)
        from srt_tpu.camera import derive_viewport, generate_rays
        from srt_tpu.ops.morton import PermutedStream, morton_perm
        vp = derive_viewport(cam)
        jitter = stream.take(2)
        origins, dirs = generate_rays(vp, cam.width, cam.height, jitter)
        # Z-order the wavefront for kernel-tile coherence (ops/morton.py),
        # exactly as trace_image_sample does; un-permute for a usable image.
        perm, inv = morton_perm(cam.height, cam.width)
        color, stats = pathtracer.trace_wavefront(
            hit_fn, lights, origins[:, perm], dirs[:, perm],
            PermutedStream(stream, perm), cfg, return_stats=True
        )
        return color[:, inv], stats

    runner = jax.jit(run)
    color, stats = runner(jax.random.key(0))
    jax.block_until_ready(color)

    # Steady-state timing.
    reps = int(os.environ.get("SRT_BENCH_REPS", "10"))
    t0 = time.perf_counter()
    for i in range(reps):
        color, stats = runner(jax.random.key(i + 1))
    jax.block_until_ready(color)
    dt = (time.perf_counter() - t0) / reps

    rays = int(np.asarray(stats).sum())  # closest-hit + shadow rays, 1 frame
    mrays = rays / dt / 1e6

    print(json.dumps({
        "metric": f"fwd Mrays/s/chip, 4-bounce path tracing, "
                  f"{mesh_data.num_triangles}-tri BVH scene ({method})",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
    }))


if __name__ == "__main__":
    main()
