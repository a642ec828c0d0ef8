#!/usr/bin/env python
"""Offline wavefront-ordering experiment on REAL dumped bounce rays
(tools/micro_pg2_split.py SRT_DUMP): for candidate sort keys, compute the
per-group union cluster footprint and a pg2 walk cost model — the data
deciding whether spp-batched coherence (r5 ceiling experiment) or a
different sort key can cut late-bounce traversal work.  Pure numpy.

Usage: python tools/micro_sortkeys.py /tmp/rays_spp4.npz [bounce_index]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_clusters():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from srt_tpu.models import mesh as mesh_mod
    from srt_tpu.utils.flatten import flatten_models
    from srt_tpu.utils.procgen import uv_sphere
    rows = int(os.environ.get("SRT_BENCH_ROWS", "160"))
    cols = int(os.environ.get("SRT_BENCH_COLS", "320"))
    scene = mesh_mod.upload(
        flatten_models([uv_sphere(rows, cols, radius=2.0)], pad_to=128))
    return (np.asarray(scene.cluster_min), np.asarray(scene.cluster_max))


def occupancy(o, d, cmin, cmax, chunk=8192):
    """[N, C] bool cluster occupancy (slab test, t_max = root box exit)."""
    n = o.shape[0]
    c = cmin.shape[0]
    root_lo, root_hi = cmin.min(0), cmax.max(0)
    occ = np.zeros((n, c), bool)
    inv = 1.0 / d
    tb0 = (root_lo[None, :] - o) * inv
    tb1 = (root_hi[None, :] - o) * inv
    bt_near = np.minimum(tb0, tb1).max(1)
    bt_far = np.maximum(tb0, tb1).min(1)
    t_max = np.where((bt_near <= bt_far) & (bt_far >= 0.0),
                     bt_far * 1.0001 + 1e-3, 0.0)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        oo, ii = o[lo:hi], inv[lo:hi]
        t_near = np.full((hi - lo, c), -np.inf, np.float32)
        t_far = np.full((hi - lo, c), np.inf, np.float32)
        for ax in range(3):
            t0 = (cmin[None, :, ax] - oo[:, ax:ax + 1]) * ii[:, ax:ax + 1]
            t1 = (cmax[None, :, ax] - oo[:, ax:ax + 1]) * ii[:, ax:ax + 1]
            t_near = np.maximum(t_near, np.minimum(t0, t1))
            t_far = np.minimum(t_far, np.maximum(t0, t1))
        sel = np.maximum(t_near, 0.0)
        occ[lo:hi] = ((t_near <= t_far) & (t_far >= 0.0)
                      & (sel < t_max[lo:hi, None]))
    return occ


def part1by2(x):
    x = (x | (x << 8)) & np.uint32(0x0300F00F)
    x = (x | (x << 4)) & np.uint32(0x030C30C3)
    x = (x | (x << 2)) & np.uint32(0x09249249)
    return x


def keys(o, d, alive, pix, spp):
    """Candidate orderings -> dict name -> argsort permutation."""
    ot = o                                         # [N, 3]
    lo, hi = ot.min(0), ot.max(0)
    q = np.clip((ot - lo) / np.maximum(hi - lo, 1e-6) * 31.0,
                0, 31).astype(np.uint32)
    morton = ((part1by2(q[:, 0]) << 2) | (part1by2(q[:, 1]) << 1)
              | part1by2(q[:, 2]))
    dt = d                                         # [N, 3]
    dn = dt / np.maximum(np.linalg.norm(dt, axis=1, keepdims=True), 1e-9)
    qd = np.clip((dn + 1.0) * 2.0, 0, 3).astype(np.uint32)      # 2b/axis
    dm = (((qd[:, 0] >> 1) << 5) | ((qd[:, 1] >> 1) << 4)
          | ((qd[:, 2] >> 1) << 3) | ((qd[:, 0] & 1) << 2)
          | ((qd[:, 1] & 1) << 1) | (qd[:, 2] & 1))
    qd3 = np.clip((dn + 1.0) * 4.0, 0, 7).astype(np.uint32)     # 3b/axis
    dm3 = ((part1by2(qd3[:, 0]) << 2) | (part1by2(qd3[:, 1]) << 1)
           | part1by2(qd3[:, 2])) & np.uint32(0x1FF)
    dead = (~alive).astype(np.uint64) << np.uint64(40)
    out = {
        "current(cell,cone2)": dead | (morton.astype(np.uint64) << 6)
        | dm.astype(np.uint64),
        "cone2,cell": dead | (dm.astype(np.uint64) << 15)
        | morton.astype(np.uint64),
        "cell,cone3": dead | (morton.astype(np.uint64) << 9)
        | dm3.astype(np.uint64),
        "cone3,cell": dead | (dm3.astype(np.uint64) << 15)
        | morton.astype(np.uint64),
        "sampleid": dead | pix.astype(np.uint64),
    }
    # r5 follow-ups: finer direction cells and a 6-D interleave.
    qd4 = np.clip((dn + 1.0) * 8.0, 0, 15).astype(np.uint32)    # 4b/axis
    dm4 = ((part1by2(qd4[:, 0]) << 2) | (part1by2(qd4[:, 1]) << 1)
           | part1by2(qd4[:, 2])) & np.uint32(0xFFF)
    qd5 = np.clip((dn + 1.0) * 16.0, 0, 31).astype(np.uint32)   # 5b/axis
    dm5 = ((part1by2(qd5[:, 0]) << 2) | (part1by2(qd5[:, 1]) << 1)
           | part1by2(qd5[:, 2]))
    out["cone4,cell"] = dead | (dm4.astype(np.uint64) << 15) \
        | morton.astype(np.uint64)
    out["cone5,cell"] = dead | (dm5.astype(np.uint64) << 15) \
        | morton.astype(np.uint64)
    # Bitwise interleave of the 15-bit direction code and the 15-bit
    # origin code (6-D Morton): locality in both at every scale.
    inter = np.zeros(dn.shape[0], np.uint64)
    for i in range(15):
        inter |= (((dm5 >> i) & 1).astype(np.uint64) << (2 * i + 1))
        inter |= (((morton >> i) & 1).astype(np.uint64) << (2 * i))
    out["interleave6d"] = dead | inter
    if spp > 1:
        out["pixel,cone2"] = dead | (
            (pix // spp).astype(np.uint64) << 6) | dm.astype(np.uint64)
    return {k: np.argsort(v, kind="stable") for k, v in out.items()}


def group_cost(occ_sup, rows, g, w=4):
    """(mean union footprint, walk evals/ray) for G-ray groups of ``rows``
    (row indices into occ_sup [m, S, 16])."""
    mg = (rows.shape[0] // g) * g
    grp = occ_sup[rows[:mg]].reshape(mg // g, g, occ_sup.shape[1], 16)
    u = grp.any(1)
    pc = u.sum(2)
    union = pc.sum(1)
    iters = np.maximum(-(-pc // w), (pc > 0)).sum(1)
    return union.mean(), iters.sum() * w / mg


def main():
    path = sys.argv[1]
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    z = np.load(path if path.endswith(".npz") else path + ".npz")
    spp = int(z["spp"])
    o, d = z[f"b{b}_o"].T, z[f"b{b}_d"].T          # [N, 3]
    alive = z[f"b{b}_alive"]
    pix = z[f"b{b}_pix"]
    cmin, cmax = build_clusters()
    SUPER, W = 16, 4
    m = alive.sum()
    print(f"bounce {b + 1}: {m} live of {o.shape[0]}, spp={spp}, "
          f"{cmin.shape[0]} clusters")
    occ_all = occupancy(o[alive], d[alive], cmin, cmax)
    per_ray = occ_all.sum(1)
    print(f"  per-ray footprint: mean {per_ray.mean():.1f} "
          f"p50 {np.median(per_ray):.0f} p90 {np.percentile(per_ray, 90):.0f}")
    idx_alive = np.where(alive)[0]
    rank_of = np.full(o.shape[0], -1, np.int64)
    rank_of[idx_alive] = np.arange(m)

    c = cmin.shape[0]
    s_count = -(-c // SUPER)

    def to_sup(occ):
        mm = occ.shape[0]
        occ_pad = np.zeros((mm, s_count * SUPER), bool)
        occ_pad[:, :c] = occ
        return occ_pad.reshape(mm, s_count, SUPER)

    occ_sup = to_sup(occ_all)

    # Shadow batch for THIS wavefront order: rays that hit cast p -> light
    # (nearest light as the RIS-pick stand-in).  Hit points come from the
    # next bounce's origins, mapped back via sample ids.
    occ_sh_sup = None
    try:
        o_next, pix_next = z[f"b{b + 1}_o"].T, z[f"b{b + 1}_pix"]
        hit_next = z[f"b{b + 1}_alive"]
    except KeyError:
        o_next = None
    if o_next is not None:
        import jax
        jax.config.update("jax_platforms", "cpu")
        from srt_tpu.scene import model_scene_lights
        lp = np.asarray(model_scene_lights().position)      # [L, 3]
        pos_of_sid = np.full(pix_next.max() + 1, -1, np.int64)
        pos_of_sid[pix_next] = np.arange(pix_next.shape[0])
        nxt = pos_of_sid[pix]                               # [N]
        sh_mask = alive & (nxt >= 0) & hit_next[nxt]
        p = o_next[nxt[sh_mask]]                            # [Msh, 3]
        d2 = ((lp[None, :, :] - p[:, None, :]) ** 2).sum(2)
        pick = d2.argmin(1)
        delta = lp[pick] - p
        dist = np.linalg.norm(delta, axis=1)
        sdir = delta / np.maximum(dist, 1e-9)[:, None]
        occ_sh = occupancy(p, sdir, cmin, cmax)
        occ_sh_sup = to_sup(occ_sh)
        rank_sh = np.full(o.shape[0], -1, np.int64)
        rank_sh[np.where(sh_mask)[0]] = np.arange(sh_mask.sum())
        print(f"  shadow batch: {sh_mask.sum()} rays, per-ray fp "
              f"mean {occ_sh.sum(1).mean():.1f}")

    for name, perm in keys(o, d, alive, pix, spp).items():
        rows = rank_of[perm[rank_of[perm] >= 0]]
        line = f"  {name:22s}"
        for g in (8, 16, 32):
            fp, ev = group_cost(occ_sup, rows, g, W)
            line += f" | G={g}: fp {fp:5.1f} ev/ray {ev:5.2f}"
        if occ_sh_sup is not None:
            rows_sh = rank_sh[perm[rank_sh[perm] >= 0]]
            fp, ev = group_cost(occ_sh_sup, rows_sh, 32, W)
            line += f" | SH G=32: fp {fp:5.1f} ev/ray {ev:5.2f}"
        print(line)


if __name__ == "__main__":
    main()
