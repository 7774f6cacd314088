import sys, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
_ = float(jnp.zeros(()))

OUT = 256
n_part = 64*512*512  # one production slab
n_slabs = 8
key = jax.random.PRNGKey(0)
pos = jax.random.uniform(key, (3, n_part), minval=0.0, maxval=float(OUT))
w = jnp.ones((n_part,), jnp.float32)

def corners(px, py, pz, w):
    ix0 = jnp.floor(px); iy0 = jnp.floor(py); iz0 = jnp.floor(pz)
    fx = px-ix0; fy = py-iy0; fz = pz-iz0
    ix0 = ix0.astype(jnp.int32)%OUT; iy0 = iy0.astype(jnp.int32)%OUT; iz0 = iz0.astype(jnp.int32)%OUT
    ix1 = (ix0+1)%OUT; iy1 = (iy0+1)%OUT; iz1 = (iz0+1)%OUT
    for xi, wx in ((ix0,1-fx),(ix1,fx)):
        for yi, wy in ((iy0,1-fy),(iy1,fy)):
            for zi, wz in ((iz0,1-fz),(iz1,fz)):
                yield (xi*OUT+yi)*OUT+zi, w*wx*wy*wz

def v_base(px, py, pz, w):
    def body(acc, s):
        a = acc
        for idx, val in corners(px+s*0.0, py, pz, w):
            a = a.at[idx].add(val)
        return a, None
    acc, _ = jax.lax.scan(body, jnp.zeros(OUT**3, jnp.float32), jnp.arange(n_slabs))
    return acc

def v_pib(px, py, pz, w):
    def body(acc, s):
        a = acc
        for idx, val in corners(px+s*0.0, py, pz, w):
            a = a.at[idx].add(val, mode="promise_in_bounds")
        return a, None
    acc, _ = jax.lax.scan(body, jnp.zeros(OUT**3, jnp.float32), jnp.arange(n_slabs))
    return acc

def v_bincount(px, py, pz, w):
    def body(acc, s):
        a = acc
        for idx, val in corners(px+s*0.0, py, pz, w):
            a = a + jnp.bincount(idx, weights=val, length=OUT**3)
        return a, None
    acc, _ = jax.lax.scan(body, jnp.zeros(OUT**3, jnp.float32), jnp.arange(n_slabs))
    return acc

def v_sortseg(px, py, pz, w):
    # one sort of all 8 corners per slab, then segment-sum via scatter on sorted
    def body(acc, s):
        idxs = []; vals = []
        for idx, val in corners(px+s*0.0, py, pz, w):
            idxs.append(idx); vals.append(val)
        idx = jnp.concatenate(idxs); val = jnp.concatenate(vals)
        order = jnp.argsort(idx)
        idx_s = idx[order]; val_s = val[order]
        return acc.at[idx_s].add(val_s, mode="promise_in_bounds", unique_indices=False), None
    acc, _ = jax.lax.scan(body, jnp.zeros(OUT**3, jnp.float32), jnp.arange(n_slabs))
    return acc

for name, fn in (("base", v_base), ("pib", v_pib), ("bincount", v_bincount), ("sortseg", v_sortseg)):
    f = jax.jit(fn)
    try:
        o = f(*pos, w); s = float(jnp.sum(o))
        t0=time.time(); o = f(pos[0]+0.1, pos[1], pos[2], w); s=float(jnp.sum(o)); dt=time.time()-t0
        print(f"{name}: {dt:.3f}s sum={s:.1f}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}", flush=True)
