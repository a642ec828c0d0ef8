#!/usr/bin/env python
import time, jax, jax.numpy as jnp

n = 512 * 512
key = jax.random.key(0)
a = jax.random.normal(key, (n, 3))
b = jax.random.normal(jax.random.key(1), (n, 3))
ax, ay, az = [jnp.asarray(a[:, i]) for i in range(3)]
bx, by, bz = [jnp.asarray(b[:, i]) for i in range(3)]

def timeit(name, fn, *args, reps=50):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:45s} {(time.perf_counter()-t0)/reps*1e3:9.3f} ms")

@jax.jit
def dot_aos(a, b):
    # chain of 8 dependent dot products, like a bounce's brdf math
    x = a
    for _ in range(8):
        d = jnp.sum(x * b, axis=-1, keepdims=True)
        x = x * d + b
    return x

@jax.jit
def dot_soa(ax, ay, az, bx, by, bz):
    x, y, z = ax, ay, az
    for _ in range(8):
        d = x * bx + y * by + z * bz
        x = x * d + bx; y = y * d + by; z = z * d + bz
    return x, y, z

@jax.jit
def dot_unrolled_aos(a, b):
    x = a
    for _ in range(8):
        d = (x[:, 0] * b[:, 0] + x[:, 1] * b[:, 1] + x[:, 2] * b[:, 2])[:, None]
        x = x * d + b
    return x

timeit("aos [N,3] sum-reduce dots x8", dot_aos, a, b)
timeit("aos [N,3] sliced dots x8", dot_unrolled_aos, a, b)
timeit("soa 3x[N] dots x8", dot_soa, ax, ay, az, bx, by, bz)
