#!/usr/bin/env python
"""Aggregate op durations from a jax trace.json.gz."""
import gzip, json, sys, collections

path = sys.argv[1]
with gzip.open(path, "rt") as f:
    data = json.load(f)

events = data.get("traceEvents", [])
# find TPU/device track pids
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")

by_name = collections.Counter()
count = collections.Counter()
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    pname = pid_names.get(e.get("pid"), "")
    if "TPU" not in pname and "xla" not in pname.lower() and "device" not in pname.lower():
        continue
    name = e.get("name", "?")
    dur = e.get("dur", 0) / 1e3  # ms
    by_name[name] += dur
    count[name] += 1
    total += dur

print(f"process names: {set(pid_names.values())}")
print(f"total device op time: {total:.1f} ms")
for name, dur in by_name.most_common(40):
    print(f"{dur:9.2f} ms  x{count[name]:<5d} {name[:110]}")
