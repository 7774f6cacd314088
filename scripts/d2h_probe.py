import sys, time; sys.path.insert(0,"/root/repo")
import jax, jax.numpy as jnp
t0=time.time(); x = jnp.float32(3.0); jax.block_until_ready(x); print("H2D+ready:", time.time()-t0, flush=True)
t0=time.time(); v = float(x); print("first scalar D2H:", time.time()-t0, flush=True)
t0=time.time(); y = jnp.arange(256**3, dtype=jnp.float32); jax.block_until_ready(y); print("big alloc:", time.time()-t0, flush=True)
import numpy as np
t0=time.time(); arr = np.asarray(y); print("big D2H 64MB:", time.time()-t0, flush=True)
t0=time.time(); v2 = float(jnp.float32(5.0)); print("second scalar D2H:", time.time()-t0, flush=True)
