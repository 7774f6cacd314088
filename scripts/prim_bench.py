"""Microbenchmark primitive ops on the real chip (axon tunnel).

block_until_ready does NOT sync on axon; chain n dependent iterations inside
one jit and fetch one scalar, so per-op time = (total - fetch_baseline)/n.
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

N = 256
NH = 512

a = jax.random.normal(jax.random.PRNGKey(0), (N, N, N), jnp.float32)
h = jax.random.normal(jax.random.PRNGKey(2), (NH, NH, NH), jnp.float32)
float(jnp.sum(a)); float(jnp.sum(h))

# fetch baseline
t0 = time.perf_counter()
for _ in range(3):
    float(a[0, 0, 0])
FETCH = (time.perf_counter() - t0) / 3
print(f"fetch baseline: {FETCH*1e3:.1f} ms", flush=True)


def timeit(name, make_fn, n=10):
    """make_fn returns a jitted fn(x, eps)->array of x's shape; we chain."""
    fn = make_fn()

    @jax.jit
    def chain(x):
        def body(c, i):
            return fn(c) + 1e-12 * i.astype(jnp.float32), None
        out, _ = jax.lax.scan(body, x, jnp.arange(n))
        return out

    out = chain(a)
    float(out[0, 0, 0])  # compile + warm
    t0 = time.perf_counter()
    out = chain(a)
    float(out[0, 0, 0])
    dt = (time.perf_counter() - t0 - FETCH) / n
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)


timeit("axpb lowres", lambda: (lambda x: x * 1.5 + 1.0))
timeit("hat lowres", lambda: (lambda x: jnp.maximum(1.0 - jnp.abs(x), 0.0)))
timeit("roll x (major)", lambda: (lambda x: jnp.roll(x, 1, 0) * 1.0000001))
timeit("roll z (minor)", lambda: (lambda x: jnp.roll(x, 1, 2) * 1.0000001))
timeit("roll xyz", lambda: (lambda x: jnp.roll(x, (1, 1, 1), (0, 1, 2)) * 1.0000001))

# strided slice: chain by writing result into a lowres accumulator
def make_slice(sx, sy, sz):
    def f(c):
        return c + h[sx::2, sy::2, sz::2]
    return f

timeit("c += h[0::2,0::2,0::2]", lambda: make_slice(0, 0, 0))
timeit("c += h[1::2,1::2,1::2]", lambda: make_slice(1, 1, 1))
timeit("c += h[0::2,0::2,1::2] (minor off)", lambda: make_slice(0, 0, 1))

# z-contract for one (rx,ry) pair at R=2: 2 slices * hats
def make_zc():
    def f(c):
        s = None
        for rz in range(2):
            w = jnp.maximum(1.0 - jnp.abs(c * 1e-6 + (rz - 0.5) / 2), 0.0)
            t = h[0::2, 0::2, rz::2] * w
            s = t if s is None else s + t
        return c + s
    return f

timeit("z-contract 1 pair R=2", make_zc)

# 8 mult-adds (V-step shape)
def make_fma8():
    def f(c):
        s = c
        for i in range(8):
            s = s + a * (1.0 + 1e-6 * i)
        return s
    return f

timeit("8x fma lowres", make_fma8)
