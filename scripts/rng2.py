import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
_ = float(jnp.zeros(()))
from py21cmfast_tpu.ops import fft, grids

hi = (512,512,512); bl = (384.0,)*3

@jax.jit
def amp_only(w_k, ln_k, sqrtp):
    kmag = grids.kmag_grid(hi, bl)
    lnk = jnp.log(jnp.where(kmag > 0, kmag, 1.0))
    amp = jnp.where(kmag > 0, jnp.interp(lnk, ln_k, sqrtp), 0.0)
    return w_k * (amp * np.float32(0.5))

@jax.jit
def kmag_only():
    return grids.kmag_grid(hi, bl)

ln_k = jnp.linspace(-5, 3, 2048); sqrtp = jnp.ones(2048)
w = jax.random.normal(jax.random.PRNGKey(0), hi)
wk = jax.jit(fft.rfft3)(w); jax.block_until_ready(wk)
for name, call in (("kmag", lambda: kmag_only()), ("amp*interp", lambda: amp_only(wk, ln_k, sqrtp))):
    o = call(); jax.block_until_ready(o)
    t0=time.time(); o = call(); jax.block_until_ready(o); print(name, time.time()-t0, flush=True)
