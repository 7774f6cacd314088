"""Profile staged deposit stages at 256/512 on TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
from bench import _enable_compile_cache, _checksum
_enable_compile_cache()
import numpy as np
import jax, jax.numpy as jnp
from py21cmfast_tpu.ops.sep_deposit import _stage_t, _stage_xy, _bad_mask, _outlier_scatter
from py21cmfast_tpu.ops.deposit import deposit_plan

R, S = 2, 1
nl = 256
nh = nl * R
rng = np.random.default_rng(0)
hires = jnp.asarray(rng.normal(0, 0.1, (nh, nh, nh)).astype(np.float32))
d = tuple(jnp.asarray(rng.normal(0, 0.6, (nl, nl, nl)).astype(np.float32)) for _ in range(3))
ok = jnp.ones((), jnp.float32)

def timeit(label, fn, n=3):
    fn()  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    _checksum(*(r if isinstance(r, tuple) else (r,)))
    print(f"{label}: {(time.perf_counter()-t0)/n:.3f}s", flush=True)

t = _stage_t(hires, jnp.float32(0.5), d[2], ok, uz=0, ratio=R, support=S, use_ok=False)
_checksum(t)
timeit("stage_t (uz=0)", lambda: _stage_t(hires, jnp.float32(0.5), d[2], ok, uz=0, ratio=R, support=S, use_ok=False))
acc0 = jnp.zeros((nl, nl, nl), jnp.float32)
timeit("stage_xy (uz=0)", lambda: _stage_xy(jnp.zeros((nl,nl,nl), jnp.float32), t, d[1], d[0], uz=0, ratio=R, support=S))
timeit("bad_mask", lambda: _bad_mask(d, ratio=R, support=S))
bad = _bad_mask(d, ratio=R, support=S)
timeit("outlier cap=4096", lambda: _outlier_scatter(jnp.zeros((nl,nl,nl), jnp.float32), hires, jnp.float32(0.5), d, bad, ratio=R, cap=4096, lo_shape=(nl,nl,nl)))
print("n_bad:", int(jnp.sum(bad)))
