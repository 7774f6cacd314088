"""Validate + time the Pallas deposit kernel on the real TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
from bench import _enable_compile_cache, _checksum
_enable_compile_cache()
import numpy as np
import jax, jax.numpy as jnp
from py21cmfast_tpu.ops.sep_deposit import staged_factored_deposit, _bad_mask
from py21cmfast_tpu.ops.pallas_deposit import (
    build_channel_stack, build_dok_stack, pallas_factored_deposit,
)

rng = np.random.default_rng(0)
for R, nl, S in ((2, 128, 1), (4, 128, 1), (2, 128, 2), (4, 128, 3), (3, 128, 2)):
    nh = nl * R
    hires = jnp.asarray(rng.normal(0, 0.1, (nh, nh, nh)).astype(np.float32))
    d = tuple(jnp.asarray(rng.normal(0, 0.7, (nl, nl, nl)).astype(np.float32)) for _ in range(3))
    d_init = jnp.float32(0.5)
    ref = staged_factored_deposit(
        hires, tuple(x / 0.9 for x in d), None, d_init, jnp.float32(0.9),
        jnp.float32(0.0), (1.0, 1.0, 1.0), ratio=R, support=S, cap=0,
        lo_shape=(nl, nl, nl))
    chan = build_channel_stack(hires, d_init, ratio=R, lo_shape=(nl, nl, nl))
    dok = build_dok_stack(d[0], d[1], d[2], jnp.ones((nl, nl, nl), jnp.float32))
    out = pallas_factored_deposit(chan, dok, ratio=R, support=S, lo_shape=(nl, nl, nl))
    diff = float(jnp.max(jnp.abs(out - ref)))
    print(f"R={R} nl={nl} S={S}: pallas vs staged maxdiff {diff:.2e}", flush=True)
    assert diff < 2e-4, "MISMATCH"

# perf at bench shapes
for R, nl, S in ((2, 256, 1), (4, 256, 1), (2, 512, 1)):
    nh = nl * R
    hires = jnp.asarray(rng.normal(0, 0.1, (nh, nh, nh)).astype(np.float32))
    d = tuple(jnp.asarray(rng.normal(0, 0.6, (nl, nl, nl)).astype(np.float32)) for _ in range(3))
    t0 = time.perf_counter()
    chan = build_channel_stack(hires, jnp.float32(0.5), ratio=R, lo_shape=(nl, nl, nl))
    _checksum(chan)
    t1 = time.perf_counter()
    dok = build_dok_stack(d[0], d[1], d[2], jnp.ones((nl, nl, nl), jnp.float32))
    out = pallas_factored_deposit(chan, dok, ratio=R, support=S, lo_shape=(nl, nl, nl))
    _checksum(out)  # compile+run
    t2 = time.perf_counter()
    n = 5
    t3 = time.perf_counter()
    for _ in range(n):
        dok = build_dok_stack(d[0], d[1], d[2], jnp.ones((nl, nl, nl), jnp.float32))
        out = pallas_factored_deposit(chan, dok, ratio=R, support=S, lo_shape=(nl, nl, nl))
    _checksum(out)
    dt = (time.perf_counter() - t3) / n
    print(f"R={R} nl={nl}: chan_build {t1-t0:.2f}s  first {t2-t1:.2f}s  steady {dt*1000:.0f} ms", flush=True)
