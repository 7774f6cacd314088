import sys, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
_ = float(jnp.zeros(()))

n_part = 64*512*512
key = jax.random.PRNGKey(0)
w = jnp.ones((n_part,), jnp.float32)

def bench(name, n_target, pos_max):
    pos = jax.random.uniform(key, (n_part,), minval=0.0, maxval=pos_max).astype(jnp.float32)
    @jax.jit
    def f(p, w):
        idx = p.astype(jnp.int32)
        acc = jnp.zeros(n_target, jnp.float32)
        # 8 scatters to mimic CIC corner count
        for k in range(8):
            acc = acc.at[(idx + k) % n_target].add(w)
        return acc
    o = f(pos, w); s=float(jnp.sum(o))
    t0=time.time(); o = f(pos+1.0, w); s=float(jnp.sum(o)); print(f"{name}: {time.time()-t0:.3f}s", flush=True)

bench("full 256^3 target (64MB)", 256**3, float(256**3))
bench("slab 44x256^2 target (11MB)", 44*256*256, float(44*256*256))
bench("tiny 256^2 target (0.25MB)", 256*256, float(256*256))
