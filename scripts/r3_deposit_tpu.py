"""Round-3: validate + time the staged deposit on the real TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
from bench import _enable_compile_cache, _checksum
_enable_compile_cache()
import numpy as np
import jax, jax.numpy as jnp

# correctness at small size vs the particle scatter
from py21cmfast_tpu.ops import cic
from py21cmfast_tpu.ops.sep_deposit import staged_factored_deposit

rng = np.random.default_rng(0)
for R in (2, 4):
    nl = 8; nh = nl * R
    hires = rng.normal(0, 0.1, (nh, nh, nh)).astype(np.float32)
    psi = tuple(jnp.asarray(rng.normal(0, 1.0, (nl, nl, nl)).astype(np.float32)) for _ in range(3))
    d2c = (nl / 48.0,) * 3
    fac = 3.0
    b = np.asarray(staged_factored_deposit(
        jnp.asarray(hires), psi, None, jnp.float32(0.5), jnp.float32(fac),
        jnp.float32(0.0), d2c, ratio=R, support=1, cap=512, lo_shape=(nl, nl, nl)))
    ii = np.arange(nh)
    mapx = ((ii * (nl / nh) + 0.5).astype(int)) % nl
    I, J, K = np.meshgrid(ii, ii, ii, indexing="ij")
    MI, MJ, MK = mapx[I], mapx[J], mapx[K]
    m = 1.0 + hires * 0.5
    px = I / R + np.asarray(psi[0])[MI, MJ, MK] * fac * d2c[0]
    py = J / R + np.asarray(psi[1])[MI, MJ, MK] * fac * d2c[1]
    pz = K / R + np.asarray(psi[2])[MI, MJ, MK] * fac * d2c[2]
    acc = cic.cic_scatter_flat(
        jnp.zeros(nl ** 3, jnp.float32), jnp.asarray(px.ravel()),
        jnp.asarray(py.ravel()), jnp.asarray(pz.ravel()),
        jnp.asarray(m.ravel()), (nl, nl, nl))
    sc = np.asarray(acc).reshape(nl, nl, nl)
    print(f"R={R}: staged vs scatter maxdiff {np.abs(b - sc).max():.2e}", flush=True)

# perf at bench sizes
import py21cmfast_tpu as p21

def run(hii, dim, seed, zs=(9.0, 8.5, 8.0)):
    inputs = p21.InputParameters(random_seed=seed).evolve_input_structs(
        HII_DIM=hii, DIM=dim, BOX_LEN=1.5 * hii, SOURCE_MODEL="E-INTEGRAL")
    t0 = time.perf_counter()
    ics = p21.compute_initial_conditions(inputs)
    _checksum(ics.lowres_density, ics.hires_density)
    t1 = time.perf_counter()
    print(f"  hii={hii} dim={dim} ICs {t1-t0:.2f}", flush=True)
    for z in zs:
        ta = time.perf_counter()
        pf = p21.perturb_field(z, inputs, ics)
        _checksum(pf.density)
        print(f"  perturb z={z}: {time.perf_counter()-ta:.2f}", flush=True)

for hii, dim in ((256, 512), (256, 1024)):
    print(f"=== pass 1 (compile) hii={hii} dim={dim}", flush=True)
    run(hii, dim, 1)
    print("=== pass 2 (timed)", flush=True)
    run(hii, dim, 2)
