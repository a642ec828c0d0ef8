#!/usr/bin/env python
"""Real-TPU (Mosaic, not interpret-mode) parity smoke test of the Pallas
traversal against the dense Moller-Trumbore sweep.

Interpret-mode tests (tests/test_pallas_traversal.py) validate kernel
*semantics*; this script validates the *compiled Mosaic* kernel on the
actual chip — precision, scratch persistence across the grid, SMEM/VMEM
layouts — on the Rubik-scale and Airplane-stand-in scenes, with both
camera-coherent and random (bounce-like) rays.

Writes tools/tpu_parity_smoke.json (committed as the recorded artifact)
and exits nonzero on failure.  Run: python tools/tpu_parity_smoke.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

THRESH_HIT_AGREE = 0.995   # kernel accepts grazing EDGE_EPS superset
THRESH_SAME_ID = 0.98      # ties at shared edges may resolve differently


def camera_rays(n_side, origin, look_at):
    from srt_tpu.camera import derive_viewport, generate_rays
    from srt_tpu.config import CameraConfig
    from srt_tpu.ops.morton import morton_perm

    cam = CameraConfig(width=n_side, height=n_side, origin=origin,
                       look_at=look_at)
    vp = derive_viewport(cam)
    o, d = generate_rays(vp, n_side, n_side, jnp.full((2, n_side * n_side), 0.5))
    perm, _ = morton_perm(n_side, n_side)
    return o[:, perm], d[:, perm]


def random_rays(n, seed, spread):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (3, n)).astype(np.float32)
    d = (rng.normal(size=(3, n)) - o * 0.2).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def check(name, scene, o, d, chunk=2048, binned=False):
    from srt_tpu.models import mesh as mesh_mod
    from srt_tpu.ops.traversal_pallas import pallas_model_hit

    n = o.shape[1]
    t_max = jnp.full((n,), jnp.inf)
    f_p = jax.jit(lambda o_, d_: pallas_model_hit(scene, 0, o_, d_, t_max,
                                                  tile=128 if binned else 512,
                                                  binned=binned))

    # Dense reference in ray chunks: the [N, T] sweep at 256k x 102k would
    # need ~100 GB; chunks keep it a few hundred MB (pass a smaller chunk
    # for >200k-tri scenes — 2048 x 502k temps hit 3.8 GB each and OOM).
    assert n % chunk == 0

    def dense_chunk(args):
        o_, d_ = args
        return mesh_mod._dense_model_hit(
            scene, 0, o_, d_, jnp.full((chunk,), jnp.inf))

    def f_dense(o_, d_):
        oc = o_.reshape(3, n // chunk, chunk).transpose(1, 0, 2)
        dc = d_.reshape(3, n // chunk, chunk).transpose(1, 0, 2)
        t_, i_, u_, v_ = jax.lax.map(dense_chunk, (oc, dc))
        return t_.reshape(-1), i_.reshape(-1), u_.reshape(-1), v_.reshape(-1)

    f_d = jax.jit(f_dense)
    tp_, ip_, _, _ = f_p(o, d)
    td_, id_, _, _ = f_d(o, d)
    tp_, ip_, td_, id_ = map(np.asarray, (tp_, ip_, td_, id_))

    hit_p = ip_ >= 0
    hit_d = np.isfinite(td_)
    agree = float((hit_p == hit_d).mean())
    both = hit_p & hit_d
    same = float((ip_[both] == id_[both]).mean()) if both.any() else 1.0
    # Kernel winners must never be farther than the exact sweep.
    not_farther = float(
        (tp_[both] <= td_[both] * (1 + 2e-4) + 1e-5).mean()) if both.any() else 1.0
    m = ip_[both] == id_[both]
    t_err = float(np.max(np.abs(tp_[both][m] - td_[both][m])
                         / np.maximum(td_[both][m], 1e-3))) if m.any() else 0.0
    rec = {
        "case": name, "rays": int(n),
        "hit_rate_pallas": round(float(hit_p.mean()), 4),
        "hit_rate_dense": round(float(hit_d.mean()), 4),
        "hit_agree": round(agree, 5),
        "same_id": round(same, 5),
        "not_farther": round(not_farther, 5),
        "t_rel_err_same_id": t_err,
        "pass": bool(agree > THRESH_HIT_AGREE and same > THRESH_SAME_ID
                     and not_farther == 1.0 and t_err < 2e-4),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    from srt_tpu.models import mesh as mesh_mod
    from srt_tpu.utils.flatten import flatten_models
    from srt_tpu.utils.procgen import rubik_grid, uv_sphere

    backend = jax.default_backend()
    results = {"backend": backend, "cases": []}

    rubik = mesh_mod.upload(flatten_models([rubik_grid()], pad_to=128))
    o, d = camera_rays(256, (0.0, 4.0, 8.0), (0.0, 0.0, 0.0))
    results["cases"].append(check("rubik/camera 64k", rubik, o, d))
    o, d = random_rays(65536, 3, 4.0)
    results["cases"].append(check("rubik/random 64k", rubik, o, d))

    hi = mesh_mod.upload(flatten_models([uv_sphere(160, 320, radius=2.0)],
                                        pad_to=128))
    o, d = camera_rays(512, (0.0, 1.0, 5.0), (0.0, 0.0, 0.0))
    results["cases"].append(check("102k/camera 256k", hi, o, d))
    o, d = random_rays(262144, 5, 4.0)
    results["cases"].append(check("102k/random 256k", hi, o, d))
    # r4 per-group walk (the incoherent-bounce production mode) on real
    # Mosaic: compacted-list cull + popcount bit walk + 4-wide evals.
    results["cases"].append(check("102k/random 256k pg2:32:4", hi, o, d,
                                  binned="pg2:32:4"))
    o, d = camera_rays(512, (0.0, 1.0, 5.0), (0.0, 0.0, 0.0))
    results["cases"].append(check("102k/camera 256k pg2:128:4", hi, o, d,
                                  binned="pg2:128:4"))

    # Airplane-class, beyond the VMEM-resident table: the HBM-streaming
    # kernel (auto-selected over STREAM_THRESHOLD_CLUSTERS) on real
    # Mosaic — DMA pipelining, prefetch drain, partial-super tail.
    big = mesh_mod.upload(flatten_models([uv_sphere(360, 700, radius=2.0)],
                                         pad_to=128))
    from srt_tpu.ops.traversal_pallas import STREAM_THRESHOLD_CLUSTERS
    assert big.woop.shape[0] > STREAM_THRESHOLD_CLUSTERS
    o, d = camera_rays(256, (0.0, 1.0, 5.0), (0.0, 0.0, 0.0))
    results["cases"].append(
        check("503k-streamed/camera 64k", big, o, d, chunk=256))
    o, d = random_rays(65536, 7, 4.0)
    results["cases"].append(
        check("503k-streamed/random 64k", big, o, d, chunk=256))
    # r5: the per-group walk in STREAM mode (per-entry double-buffered
    # Woop DMA) on real Mosaic — the Airplane-class late-bounce mode.
    results["cases"].append(
        check("503k-streamed/random 64k pg2:32:4", big, o, d, chunk=256,
              binned="pg2:32:4"))

    ok = all(c["pass"] for c in results["cases"])
    results["pass"] = ok
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tpu_parity_smoke.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"{'PASS' if ok else 'FAIL'} -> {out}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
