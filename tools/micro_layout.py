#!/usr/bin/env python
"""Mixed [N,3]/[N] fusions (AoS) vs pure [N] fusions (SoA) at realistic op
counts — replicating a bounce's brdf math shape mix."""
import time, jax, jax.numpy as jnp

n = 512 * 512
ks = [jax.random.key(i) for i in range(8)]
nrm = jax.random.normal(ks[0], (n, 3)); nrm /= jnp.linalg.norm(nrm, axis=-1, keepdims=True)
ldir = jax.random.normal(ks[1], (n, 3)); ldir /= jnp.linalg.norm(ldir, axis=-1, keepdims=True)
vdir = jax.random.normal(ks[2], (n, 3)); vdir /= jnp.linalg.norm(vdir, axis=-1, keepdims=True)
alb = jax.random.uniform(ks[3], (n, 3))
rough = jax.random.uniform(ks[4], (n,))
metal = jax.random.uniform(ks[5], (n,))

def timeit(name, fn, *args, reps=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:45s} {(time.perf_counter()-t0)/reps*1e3:9.3f} ms")

def dot3(a, b):
    return jnp.sum(a * b, axis=-1)

@jax.jit
def shade_aos(nrm, ldir, vdir, alb, rough, metal):
    h = ldir + vdir
    h = h / jnp.sqrt(jnp.maximum(dot3(h, h), 1e-12))[:, None]
    ndl = jnp.clip(dot3(nrm, ldir), 0, 1)
    ndv = jnp.clip(dot3(nrm, vdir), 0, 1)
    ndh = jnp.clip(dot3(nrm, h), 0, 1)
    ldh = jnp.clip(dot3(ldir, h), 0, 1)
    f0 = (1 - metal[:, None]) * 0.04 + metal[:, None] * alb
    lum = f0 @ jnp.array([0.2126, 0.7152, 0.0722])
    f90 = jnp.minimum(1.0, 25.0 * lum)
    fres = f0 + (f90[:, None] - f0) * (1 - ldh[:, None]) ** 5
    a2 = (rough * rough) ** 2
    b = (a2 - 1) * ndh * ndh + 1
    d = a2 / jnp.maximum(1e-3, 3.14159 * b * b)
    gl = ndl / jnp.maximum(1e-4, rough) / jnp.sqrt(1 - jnp.minimum(0.999, ndl * ndl))
    gv = ndv / jnp.maximum(1e-4, rough) / jnp.sqrt(1 - jnp.minimum(0.999, ndv * ndv))
    g = 1 / (1 + 0.5 / gl + 0.5 / gv)
    spec = fres * (d * g / jnp.maximum(4 * ndl * ndv, 1e-3) * ndl)[:, None]
    diff = alb * (1 - metal[:, None]) * (ndl / 3.14159)[:, None]
    return (1 - fres) * diff + spec

@jax.jit
def shade_soa(nx, ny, nz, lx, ly, lz, vx, vy, vz, ar, ag, ab, rough, metal):
    hx, hy, hz = lx + vx, ly + vy, lz + vz
    hl = 1.0 / jnp.sqrt(jnp.maximum(hx*hx + hy*hy + hz*hz, 1e-12))
    hx, hy, hz = hx*hl, hy*hl, hz*hl
    ndl = jnp.clip(nx*lx + ny*ly + nz*lz, 0, 1)
    ndv = jnp.clip(nx*vx + ny*vy + nz*vz, 0, 1)
    ndh = jnp.clip(nx*hx + ny*hy + nz*hz, 0, 1)
    ldh = jnp.clip(lx*hx + ly*hy + lz*hz, 0, 1)
    f0r = (1 - metal) * 0.04 + metal * ar
    f0g = (1 - metal) * 0.04 + metal * ag
    f0b = (1 - metal) * 0.04 + metal * ab
    lum = 0.2126 * f0r + 0.7152 * f0g + 0.0722 * f0b
    f90 = jnp.minimum(1.0, 25.0 * lum)
    k = (1 - ldh) ** 5
    fr = f0r + (f90 - f0r) * k
    fg = f0g + (f90 - f0g) * k
    fb = f0b + (f90 - f0b) * k
    a2 = (rough * rough) ** 2
    b = (a2 - 1) * ndh * ndh + 1
    d = a2 / jnp.maximum(1e-3, 3.14159 * b * b)
    gl = ndl / jnp.maximum(1e-4, rough) / jnp.sqrt(1 - jnp.minimum(0.999, ndl * ndl))
    gv = ndv / jnp.maximum(1e-4, rough) / jnp.sqrt(1 - jnp.minimum(0.999, ndv * ndv))
    g = 1 / (1 + 0.5 / gl + 0.5 / gv)
    s = d * g / jnp.maximum(4 * ndl * ndv, 1e-3) * ndl
    dl = (1 - metal) * (ndl / 3.14159)
    return ((1 - fr) * ar * dl + fr * s,
            (1 - fg) * ag * dl + fg * s,
            (1 - fb) * ab * dl + fb * s)

args_soa = (nrm[:,0], nrm[:,1], nrm[:,2], ldir[:,0], ldir[:,1], ldir[:,2],
            vdir[:,0], vdir[:,1], vdir[:,2], alb[:,0], alb[:,1], alb[:,2],
            rough, metal)
timeit("shade AoS [N,3]", shade_aos, nrm, ldir, vdir, alb, rough, metal)
timeit("shade SoA [N]x3", shade_soa, *args_soa)

# And with outputs forced apart (multiple fusions): add a psum-like barrier
@jax.jit
def shade_aos_x4(nrm, ldir, vdir, alb, rough, metal):
    acc = jnp.zeros((n, 3))
    l = ldir
    for _ in range(4):
        out = shade_aos(nrm, l, vdir, alb, rough, metal)
        acc = acc + out
        l = jnp.cross(l, nrm)
        l = l / jnp.sqrt(jnp.maximum(dot3(l, l), 1e-9))[:, None]
    return acc

@jax.jit
def shade_soa_x4(*a):
    accr = accg = accb = jnp.zeros((n,))
    (nx, ny, nz, lx, ly, lz, vx, vy, vz, ar, ag, ab, rough, metal) = a
    for _ in range(4):
        r, g, b = shade_soa(nx, ny, nz, lx, ly, lz, vx, vy, vz, ar, ag, ab, rough, metal)
        accr, accg, accb = accr + r, accg + g, accb + b
        cx = ly*nz - lz*ny; cy = lz*nx - lx*nz; cz = lx*ny - ly*nx
        il = 1.0/jnp.sqrt(jnp.maximum(cx*cx+cy*cy+cz*cz, 1e-9))
        lx, ly, lz = cx*il, cy*il, cz*il
    return accr, accg, accb

timeit("shade AoS x4 bounces", shade_aos_x4, nrm, ldir, vdir, alb, rough, metal)
timeit("shade SoA x4 bounces", shade_soa_x4, *args_soa)
