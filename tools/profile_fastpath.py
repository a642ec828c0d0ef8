#!/usr/bin/env python
"""jax.profiler trace of one LIBRARY-FASTPATH headline frame (the exact
composition bench.py times); aggregates device op durations from the
chrome trace and prints the top ops — where does the current frame's time
go?  Not a test; a tuning tool feeding ROADMAP r5."""

import glob
import gzip
import json
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from srt_tpu.config import CameraConfig, RenderConfig
from srt_tpu.models import mesh as mesh_mod
from srt_tpu.models.fastpath import make_render_plan
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
    cfg = RenderConfig(max_depth=4, rr_bounces=0, spp=1)
    ssf = os.environ.get("SRT_SHADOW_SORT_FROM")
    if ssf is not None:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, sort_shadows_from=None if ssf == "none" else int(ssf))
    plan = make_render_plan(
        scene, lights, cam, cfg,
        walks=os.environ.get("SRT_BENCH_WALKS"),
        walks_shadow=os.environ.get("SRT_BENCH_WALKS_SHADOW"))
    out = plan.render(jax.random.key(0))
    jax.block_until_ready(out)

    reps = int(os.environ.get("SRT_REPS", "5"))
    walls = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = plan.render(jax.random.key(i + 1))
        jax.block_until_ready(out)
        walls.append(time.perf_counter() - t0)
    print(f"frame wall: {min(walls)*1e3:.1f} ms (min of {reps}; "
          f"mean {sum(walls)/reps*1e3:.1f})")

    tdir = "/tmp/srt_trace_fastpath"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        out = plan.render(jax.random.key(2))
        jax.block_until_ready(out)

    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace captured", glob.glob(f"{tdir}/**", recursive=True))
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    by_name, count = Counter(), Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if ("TPU" not in pname and "xla" not in pname.lower()
                and "device" not in pname.lower()):
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # ms
        by_name[name] += dur
        count[name] += 1
        total += dur
    print(f"device total: {total:.1f} ms across {sum(count.values())} events")
    for name, dur in by_name.most_common(40):
        print(f"{dur:9.2f} ms  x{count[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
