#!/usr/bin/env python
import time, jax, jax.numpy as jnp

n = 512 * 512
table = jax.random.normal(jax.random.key(0), (1280, 3))
table1 = jax.random.normal(jax.random.key(1), (1280,))
small = jax.random.normal(jax.random.key(2), (6, 3))
idx = jax.random.randint(jax.random.key(3), (n,), 0, 1280)
idx6 = jax.random.randint(jax.random.key(4), (n,), 0, 6)

def timeit(name, fn, *args, reps=30):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:45s} {(time.perf_counter()-t0)/reps*1e3:9.3f} ms")

timeit("gather [N] from [1280,3]", jax.jit(lambda i: table[i]), idx)
timeit("gather [N] from [1280]", jax.jit(lambda i: table1[i]), idx)
timeit("gather [N] from [6,3]", jax.jit(lambda i: small[i]), idx6)
timeit("onehot matmul [N] from [6,3]",
       jax.jit(lambda i: jax.nn.one_hot(i, 6) @ small), idx6)
timeit("gather x6 from [1280,3]",
       jax.jit(lambda i: sum(table[(i + k) % 1280] for k in range(6))), idx)
# argsort used in pallas wrapper per call
occ = jax.random.randint(jax.random.key(5), (512, 10), 0, 2)
timeit("argsort [512,10]", jax.jit(lambda o: jnp.argsort(1 - o, axis=1, stable=True)), occ)
# where/select chains
a = jax.random.normal(jax.random.key(6), (n, 3))
m = idx > 640
@jax.jit
def where_chain(a, m):
    x = a
    for _ in range(20):
        x = jnp.where(m[:, None], x * 1.01, x)
    return x
timeit("where chain x20 [N,3]", where_chain, a, m)
