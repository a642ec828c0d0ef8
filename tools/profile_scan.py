#!/usr/bin/env python
"""Is lax.scan the problem? Compare scanned vs python-unrolled bounce loop."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from srt_tpu.config import CameraConfig, RenderConfig
from srt_tpu.models import mesh as mesh_mod, pathtracer
from srt_tpu.ops.rng import KeyStream
from srt_tpu.scene import model_scene_lights
from srt_tpu.utils.flatten import flatten_models
from srt_tpu.utils.obj_loader import load_object
from srt_tpu.camera import derive_viewport, generate_rays

def timeit(name, fn, *args, reps=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/reps*1e3:9.2f} ms")

mesh_data = load_object("/root/reference/objects/Rubik/Rubik.obj")
scene = mesh_mod.upload(flatten_models([mesh_data], pad_to=128))
lights = model_scene_lights()
cam = CameraConfig(width=512, height=512, origin=(0.,20.,20.), look_at=(0.,1.,-1.))
cfg = RenderConfig(max_depth=4, rr_bounces=0, spp=1)
hit_fn = mesh_mod.mesh_hit_fn(scene, method="pallas")
n = cam.width * cam.height
vp = derive_viewport(cam)
key = jax.random.key(0)

def full(key):
    stream = KeyStream(key, n)
    jitter = stream.take(2)
    origins, dirs = generate_rays(vp, cam.width, cam.height, jitter)
    return pathtracer.trace_wavefront(hit_fn, lights, origins, dirs, stream, cfg)

orig_scan = jax.lax.scan
def manual_scan(f, init, xs, **kw):
    length = jax.tree_util.tree_leaves(xs)[0].shape[0]
    carry, ys = init, []
    for i in range(length):
        x = jax.tree_util.tree_map(lambda a: a[i], xs)
        carry, y = f(carry, x)
        ys.append(y)
    return carry, jnp.stack(ys)

timeit("full frame (scan)", jax.jit(full), key)
jax.lax.scan = manual_scan
pathtracer_scan_patch = True
timeit("full frame (unrolled)", jax.jit(full), key)
jax.lax.scan = orig_scan
