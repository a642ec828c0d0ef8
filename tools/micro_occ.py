#!/usr/bin/env python
"""Micro-benchmark of occupancy-kernel variants on the real TPU.
Separates fixed per-pallas_call dispatch cost from per-element compute."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if jax.default_backend() != "tpu":
    sys.exit("micro_occ.py measures real-TPU dispatch cost; run on a TPU "
             "backend (interpret-mode numbers would be meaningless)")


def timeit(fn, *args, reps=20, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


N = 262144
TILE = 512
C = 10

rng = np.random.default_rng(0)
rays = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))
rays_cf = jnp.asarray(rng.normal(size=(8, N)).astype(np.float32))
bounds = jnp.asarray(rng.normal(size=(8, C)).astype(np.float32))


# --- v0: trivial kernel, grid=(1,) — pure dispatch cost ---
def triv_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


small = jnp.zeros((8, 128), jnp.float32)
f0 = jax.jit(lambda x: pl.pallas_call(
    triv_kernel,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
)(x))
print(f"v0 trivial pallas grid1:   {timeit(f0, small)*1e3:7.3f} ms", flush=True)

# --- v0b: two trivial kernels chained in one jit ---
f0b = jax.jit(lambda x: pl.pallas_call(
    triv_kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(
    pl.pallas_call(
        triv_kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)))
print(f"v0b 2x trivial chained:    {timeit(f0b, small)*1e3:7.3f} ms", flush=True)

# --- v0c: trivial XLA-only jit (no pallas) ---
f0c = jax.jit(lambda x: x + 1.0)
print(f"v0c trivial XLA jit:       {timeit(f0c, small)*1e3:7.3f} ms", flush=True)

# --- v1: current occupancy (8 subtiles per program) ---
from srt_tpu.ops.traversal_pallas import _launch_cull

f1 = jax.jit(lambda r: _launch_cull(r, bounds, TILE, False))
print(f"v1 current 8-subtile:      {timeit(f1, rays)*1e3:7.3f} ms", flush=True)


# --- v4: component-first rays [8, N]; per-cluster scalar bounds ---
def make_cf(g, tile):
    def kern(rays_ref, bounds_ref, occ_ref):
        ox = rays_ref[0:1, :]
        oy = rays_ref[1:2, :]
        oz = rays_ref[2:3, :]
        inv_x = 1.0 / rays_ref[3:4, :]
        inv_y = 1.0 / rays_ref[4:5, :]
        inv_z = 1.0 / rays_ref[5:6, :]
        t_max = rays_ref[6:7, :]
        for c in range(C):
            t0x = (bounds_ref[0, c] - ox) * inv_x
            t1x = (bounds_ref[3, c] - ox) * inv_x
            t0y = (bounds_ref[1, c] - oy) * inv_y
            t1y = (bounds_ref[4, c] - oy) * inv_y
            t0z = (bounds_ref[2, c] - oz) * inv_z
            t1z = (bounds_ref[5, c] - oz) * inv_z
            t_near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.minimum(t0z, t1z))
            t_far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                            jnp.maximum(t0y, t1y)),
                                jnp.maximum(t0z, t1z))
            sel = jnp.where(t_near >= 0.0, t_near, t_far)
            hit = (t_near <= t_far) & (t_far >= 0.0) & (sel < t_max)
            h = hit.reshape(g, tile)
            occ_ref[:, c:c + 1] = jnp.any(h, axis=1,
                                          keepdims=True).astype(jnp.int32)

    n_tiles = N // tile

    @jax.jit
    def run(rcf):
        return pl.pallas_call(
            kern,
            grid=(n_tiles // g,),
            in_specs=[
                pl.BlockSpec((8, g * tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, C), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_shape=jax.ShapeDtypeStruct((n_tiles, C), jnp.int32),
            out_specs=pl.BlockSpec((g, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(rcf)

    return run


for g in (8, 64):
    try:
        f4 = make_cf(g, TILE)
        print(f"v4 comp-first g={g:3d}:      {timeit(f4, rays_cf)*1e3:7.3f} ms",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"v4 comp-first g={g:3d}: FAILED {type(e).__name__}: {e}"[:300],
              flush=True)
