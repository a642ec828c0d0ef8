#!/usr/bin/env python
import os, sys, time, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from srt_tpu.config import CameraConfig, RenderConfig
from srt_tpu.models import mesh as mesh_mod, pathtracer
from srt_tpu.ops.rng import KeyStream
from srt_tpu.scene import model_scene_lights
from srt_tpu.utils.flatten import flatten_models
from srt_tpu.utils.obj_loader import load_object
from srt_tpu.camera import derive_viewport, generate_rays

mesh_data = load_object("/root/reference/objects/Rubik/Rubik.obj")
scene = mesh_mod.upload(flatten_models([mesh_data], pad_to=128))
lights = model_scene_lights()
cam = CameraConfig(width=512, height=512, origin=(0.,20.,20.), look_at=(0.,1.,-1.))
cfg = RenderConfig(max_depth=4, rr_bounces=0, spp=1)
hit_fn = mesh_mod.mesh_hit_fn(scene, method="pallas")
n = cam.width * cam.height
vp = derive_viewport(cam)

def full(key):
    stream = KeyStream(key, n)
    jitter = stream.take(2)
    origins, dirs = generate_rays(vp, cam.width, cam.height, jitter)
    return pathtracer.trace_wavefront(hit_fn, lights, origins, dirs, stream, cfg)

runner = jax.jit(full)
out = runner(jax.random.key(0)); jax.block_until_ready(out)
with jax.profiler.trace("/tmp/jaxtrace"):
    out = runner(jax.random.key(1)); jax.block_until_ready(out)
print("trace files:", glob.glob("/tmp/jaxtrace/**/*", recursive=True))
