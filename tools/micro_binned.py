#!/usr/bin/env python
"""Micro-benchmark: group-binned vs tiled traversal on incoherent rays.

Measures per-GROUP (8 sorted rays) supercluster footprints and the
binned pipeline's stage costs on the headline 102k-tri scene — the
numbers that justify the binned-from-bounce default in bench.py."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from srt_tpu.models import mesh as mesh_mod
from srt_tpu.utils import procgen
from srt_tpu.utils.flatten import flatten_models
import srt_tpu.ops.traversal_pallas as tp

INTERP = jax.default_backend() != "tpu"  # run off-TPU in interpret mode

scene = mesh_mod.upload(flatten_models([procgen.uv_sphere(160, 320, radius=2.0)], pad_to=128))
print("clusters", scene.woop.shape[0], "supers", -(-scene.woop.shape[0]//tp.SUPER), flush=True)

key = jax.random.key(0)
n = 262144
# One jit for the whole ray setup + bounce-sort analog: eager JAX on the
# pinned TPU backend compiles each op remotely at seconds apiece
# (CLAUDE.md); the sort orders rays by (origin cell, direction cone) so
# 8-consecutive groups are coherent, like the in-frame wavefront.
from srt_tpu.models.pathtracer import _bounce_sort_keys

@jax.jit
def _setup(key):
    k1, k2 = jax.random.split(key)
    u = jax.random.normal(k1, (3, n))
    o = 2.0 * u / jnp.linalg.norm(u, axis=0)
    v = jax.random.normal(k2, (3, n))
    d = v / jnp.linalg.norm(v, axis=0)
    keys = _bounce_sort_keys(o, d, jnp.ones((n,), bool))
    order = jnp.argsort(keys)
    return o, d, o[:, order], d[:, order]

o, d, o_s, d_s = _setup(key)
t_max = jnp.full((n,), jnp.inf)

def timeit(f, *a, reps=5):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a); jax.block_until_ready(r)
    return (time.perf_counter()-t0)/reps

hit_t = jax.jit(lambda o,d,t: tp.pallas_model_hit(scene, 0, o, d, t, tile=128)[0:2])
hit_b = jax.jit(lambda o,d,t: tp.pallas_model_hit(scene, 0, o, d, t, tile=128, binned=True)[0:2])
for name, oo, dd in [("unsorted", o, d), ("sorted", o_s, d_s)]:
    dt_t = timeit(hit_t, oo, dd, t_max)
    dt_b = timeit(hit_b, oo, dd, t_max)
    print("%s: tiled %.1f ms (%.2f Mrays/s)  binned %.1f ms (%.2f Mrays/s)"
          % (name, dt_t*1e3, n/dt_t/1e6, dt_b*1e3, n/dt_b/1e6), flush=True)

# --- sorted-case stage breakdown ---
from srt_tpu.models.mesh import transform_rays
tile = 128
def front(o, d, t_max):
    o_m, d_m = transform_rays(scene.frames[0], o, d)
    nn = o.shape[1]
    pad = (-nn) % (tile*8); npad = nn+pad
    root_lo = jnp.min(scene.cluster_min, axis=0); root_hi = jnp.max(scene.cluster_max, axis=0)
    inv_d = 1.0/d_m
    tb0 = (root_lo[:,None]-o_m)*inv_d; tb1 = (root_hi[:,None]-o_m)*inv_d
    bt_near = jnp.max(jnp.minimum(tb0,tb1),axis=0); bt_far = jnp.min(jnp.maximum(tb0,tb1),axis=0)
    t_clip = jnp.where((bt_near<=bt_far)&(bt_far>=0.0), bt_far*(1+1e-4)+1e-3, 0.0)
    t_eff = jnp.minimum(t_max, t_clip)
    pd_ = lambda x, f=0.0: jnp.pad(x, ((0,0),)*(x.ndim-1)+((0,pad),), constant_values=f)
    rays8 = jnp.concatenate([pd_(o_m), pd_(d_m,1.0), pd_(t_eff)[None,:], jnp.zeros((1,npad))],axis=0).T
    n_clusters = scene.woop.shape[0]
    s_count = -(-n_clusters//tp.SUPER); c_pad = s_count*tp.SUPER-n_clusters
    cmin_p = jnp.pad(scene.cluster_min, ((0,c_pad),(0,0)), constant_values=tp.BIG)
    cmax_p = jnp.pad(scene.cluster_max, ((0,c_pad),(0,0)), constant_values=-tp.BIG)
    smin = cmin_p.reshape(s_count,tp.SUPER,3).min(axis=1); smax = cmax_p.reshape(s_count,tp.SUPER,3).max(axis=1)
    sb = jnp.concatenate([smin.T, smax.T, jnp.zeros((2,s_count))],axis=0)
    return rays8, sb

rays8, sb = jax.jit(front)(o_s, d_s, t_max)
npad = rays8.shape[0]; s_count = sb.shape[1]
G = tp.GROUP; gpt = tile // G; n_groups = npad // G
cull = jax.jit(lambda r, s: tp._launch_cull_perray(r, s, tile, INTERP))
e = cull(rays8, sb)
print("stage cull  %.1f ms" % (timeit(cull, rays8, sb)*1e3), flush=True)
occ = np.asarray((e < tp.BIG).sum(axis=1))
print("per-GROUP supers (sorted): mean %.2f p90 %d p99 %d max %d" % (
    occ.mean(), np.percentile(occ,90), np.percentile(occ,99), occ.max()), flush=True)
p_cap = tp._pair_capacity(n_groups, int(s_count), gpt, 8)
pairs = jax.jit(lambda e: tp._binned_pairs(e, gpt, p_cap))
pair_grp, tile_super, tile_counts, total = pairs(e)
print("stage pairs %.1f ms (total %d, cap %d, overflow=%s)" % (
    timeit(pairs, e)*1e3, int(total), p_cap, bool(total > p_cap)), flush=True)
rays_grp = rays8.reshape(n_groups, G*8)
dead_grp = jnp.tile(jnp.array([0.,0.,0.,1.,1.,1.,0.,0.], jnp.float32), (1, G))
rays_grp_ext = jnp.concatenate([rays_grp, dead_grp], axis=0)
gath = jax.jit(lambda pg: rays_grp_ext[pg].reshape(p_cap*G, 8))
pr = gath(pair_grp)
print("pair gather %.1f ms" % (timeit(gath, pair_grp)*1e3), flush=True)
def kern(tile_counts, tile_super, pr):
    elist0 = jnp.zeros((p_cap//gpt, 1), jnp.float32)
    n_clusters = scene.woop.shape[0]
    s_c = -(-n_clusters//tp.SUPER); c_pad = s_c*tp.SUPER - n_clusters
    cmin_n = jnp.pad(scene.cluster_min, ((0,c_pad),(0,0)), constant_values=jnp.nan)
    cmax_n = jnp.pad(scene.cluster_max, ((0,c_pad),(0,0)), constant_values=jnp.nan)
    cb = jnp.concatenate([
        cmin_n.reshape(s_c, tp.SUPER, 3).transpose(0,2,1),
        cmax_n.reshape(s_c, tp.SUPER, 3).transpose(0,2,1),
        jnp.zeros((s_c, 2, tp.SUPER), jnp.float32)], axis=1)
    return tp._launch(tile_counts, tile_super, elist0, pr, cb, scene.woop, tile, INTERP)
kj = jax.jit(kern)
out = kj(tile_counts, tile_super, pr)
print("stage kern  %.1f ms" % (timeit(kj, tile_counts, tile_super, pr)*1e3), flush=True)
