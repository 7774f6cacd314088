import sys, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
_ = float(jnp.zeros(()))

@jax.jit
def heavy(x):
    for _ in range(40):
        x = jnp.fft.rfftn(x)
        x = jnp.fft.irfftn(x, s=x.shape[:-1] + ((x.shape[-1]-1)*2,))
    return x

x = jnp.ones((256,256,256), jnp.float32)
o = heavy(x); np.asarray(o)  # compile+run
t0=time.time(); o = heavy(x*2); jax.block_until_ready(o); t_block=time.time()-t0
t0=time.time(); v=np.asarray(o); t_fetch=time.time()-t0
print("block:", t_block, "fetch-after-block:", t_fetch, flush=True)
t0=time.time(); o2 = heavy(x*3); v=float(jnp.sum(o2)); print("dispatch+sum fetch:", time.time()-t0, flush=True)
