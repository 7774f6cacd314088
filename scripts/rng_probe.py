import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
_ = float(jnp.zeros(()))
shape = (512,512,512)

@jax.jit
def tf_normal(key):
    return jax.random.normal(key, shape, dtype=jnp.float32)

@jax.jit
def rbg_normal(key_data):
    key = jax.random.wrap_key_data(key_data, impl='rbg')
    return jax.random.normal(key, shape, dtype=jnp.float32)

from py21cmfast_tpu.ops import fft as myfft
rff = jax.jit(myfft.rfft3)

k = jax.random.PRNGKey(1)
kr = jax.random.key_data(jax.random.key(1, impl='rbg'))
for name, fn, arg in (("threefry", tf_normal, k), ("rbg", rbg_normal, kr)):
    out = fn(arg); jax.block_until_ready(out)
    t0=time.time(); out = fn(arg); jax.block_until_ready(out); print(name, time.time()-t0, flush=True)
w = tf_normal(k); jax.block_until_ready(w)
o = rff(w); jax.block_until_ready(o)
t0=time.time(); o = rff(w); jax.block_until_ready(o); print("rfft3 512^3:", time.time()-t0, flush=True)
