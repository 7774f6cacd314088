import sys, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
from py21cmfast_tpu.ops import fft, filters, grids
_ = float(jnp.zeros(()))

N = 256; SH = (N,N,N)
x = jax.random.normal(jax.random.PRNGKey(0), SH)
xk = jax.jit(fft.rfft3)(x)
tbl = jnp.linspace(0., 1., 400)
kmag = None

def timeit(name, f, *a):
    o = f(*a); s = float(jnp.sum(jnp.abs(o) if jnp.iscomplexobj(o) else o))
    t0=time.time(); o = f(*a); s=float(jnp.sum(jnp.abs(o) if jnp.iscomplexobj(o) else o)); print(f"{name}: {time.time()-t0:.4f}s", flush=True)

@jax.jit
def f_irfft(xk):
    return fft.irfft3(xk, SH)
@jax.jit
def f_rfft(x):
    return fft.rfft3(x)
@jax.jit
def f_filter(xk):
    km = grids.kmag_grid(SH, (384.,)*3)
    return filters.filter_kbox(xk, km, 0, 5.0)
@jax.jit
def f_gather(x):
    t = jnp.clip((x + 1.0) * 100.0, 0.0, 398.999)
    i0 = t.astype(jnp.int32); fr = t - i0
    return tbl[i0]*(1-fr) + tbl[i0+1]*fr
@jax.jit
def f_mean(x):
    return jnp.mean(x)
@jax.jit
def f_elem(x):
    return jnp.where(x*30.0 > 1.0, 0.0, x)

timeit("rfft3 256^3", f_rfft, x)
timeit("irfft3 256^3", f_irfft, xk)
timeit("filter 256^3", f_filter, xk)
timeit("gather400 256^3", f_gather, x)
timeit("mean", f_mean, x)
timeit("elemwise", f_elem, x)

# 22-shell scan simulating the stack build
@jax.jit
def f_stack(xk):
    rv = jnp.linspace(1.0, 40.0, 22)
    km = grids.kmag_grid(SH, (384.,)*3)
    def one(r):
        return fft.irfft3(filters.filter_kbox(xk, km, 0, r), SH)
    return jax.lax.map(one, rv)
timeit("22-shell filtered stack", f_stack, xk)
