#!/usr/bin/env python
"""jax.profiler trace of one bench frame; parses the chrome-trace JSON and
prints the top device ops by total duration."""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from srt_tpu.config import CameraConfig, RenderConfig
from srt_tpu.models import mesh as mesh_mod
from srt_tpu.models import pathtracer
from srt_tpu.ops.rng import KeyStream
from srt_tpu.scene import model_scene_lights
from srt_tpu.utils.flatten import flatten_models
from srt_tpu.utils.obj_loader import load_object


def main():
    mesh_data = load_object("/root/reference/objects/Rubik/Rubik.obj")
    scene = mesh_mod.upload(flatten_models([mesh_data], pad_to=128))
    lights = model_scene_lights()
    cam = CameraConfig(width=512, height=512, origin=(0.0, 20.0, 20.0),
                       look_at=(0.0, 1.0, -1.0))
    cfg = RenderConfig(max_depth=4, rr_bounces=0, spp=1)
    hit_fn = mesh_mod.mesh_hit_fn(scene, method="pallas")
    n = cam.width * cam.height

    from srt_tpu.camera import derive_viewport, generate_rays
    vp = derive_viewport(cam)

    def frame(key):
        s = KeyStream(key, n)
        jit2 = s.take(2)
        o, d = generate_rays(vp, cam.width, cam.height, jit2)
        return pathtracer.trace_wavefront(hit_fn, lights, o, d, s, cfg)

    f = jax.jit(frame)
    out = f(jax.random.key(0))
    jax.block_until_ready(out)

    tdir = "/tmp/srt_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        out = f(jax.random.key(1))
        jax.block_until_ready(out)

    time.sleep(1)
    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found under", tdir)
        print(os.popen(f"find {tdir} -type f").read())
        return
    with gzip.open(paths[0], "rt") as fh:
        trace = json.load(fh)

    events = trace["traceEvents"]
    # Identify device PIDs (track names containing TPU / device).
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, nm in names.items()
                if "TPU" in nm or "/device" in nm.lower()}
    print("processes:", names)

    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            tot[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    total = sum(tot.values())
    print(f"total device op time: {total/1e3:.2f} ms")
    for name, us in items[:40]:
        print(f"{us/1e3:9.2f} ms  x{cnt[name]:4d}  {name[:120]}")


if __name__ == "__main__":
    main()
