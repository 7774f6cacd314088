"""AOT memory analysis of the 512^3 ionize scan (no real buffers)."""
import sys
sys.path.insert(0, "/root/repo")
from bench import _enable_compile_cache, _headline_inputs
_enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
import py21cmfast_tpu as p21
from py21cmfast_tpu.models import ionization as ion_mod
from py21cmfast_tpu.models import hmf

inputs = _headline_inputs(512, 512, 4, z_min=10.0, z_max=12.2, zprime=1.03,
                          minimize_memory=True)
so = inputs.simulation_options
shape = so.lowres_shape
z = float(inputs.node_redshifts[0])

# mirror compute_ionization_field's host setup to build the real arg list
cosmo = inputs.cosmology
growth = float(cosmo.dicke(z))
sc = hmf.set_scaling_constants(z, inputs)
m_min = hmf.minimum_source_mass(z, inputs, xray=False)
sigma_table = ion_mod._get_sigma_table(inputs)
ladder = ion_mod.setup_radii(inputs, m_min)
n_r = ladder.n
print("n_r:", n_r)

f32 = jnp.float32
G = jax.ShapeDtypeStruct(shape, np.float32)
S = jax.ShapeDtypeStruct((), np.float32)

d_lo, d_hi, tables, caps = ion_mod._build_nion_tables(
    inputs, ladder, sigma_table, growth, m_min, sc)
use_cheby = True
try:
    cheby_coeffs, cheby_edge = ion_mod._fit_log_cheby(tables, caps)
except Exception:
    cheby = np.zeros((n_r, 8)); cheby_edge = np.zeros(n_r); use_cheby = False

order = np.argsort(ladder.R)[::-1]

def arr(x):
    a = np.asarray(x)
    return jax.ShapeDtypeStruct(a.shape, np.float32)

args = [
    G,  # delta
    G,  # xe_box
    G,  # rec_box
    G, G, S,  # stars, wsfr, mfp_meandens
    G, G,  # mturn boxes
    jax.ShapeDtypeStruct((n_r, 2, 2), np.float32), jax.ShapeDtypeStruct((n_r,), np.float32),
    jax.ShapeDtypeStruct((2,), np.float32), S, S, S, S,
    jax.ShapeDtypeStruct((1, 1, 1), np.float32),  # prev_delta
    jax.ShapeDtypeStruct((1,), np.float32), jax.ShapeDtypeStruct((1,), np.float32),
    arr(tables), arr(caps), arr(tables), arr(caps),
    arr(d_lo), arr(d_hi), S,
    arr(ladder.R[order]), arr(ladder.sigma_max[order]),
    arr(d_lo[order]), arr(d_hi[order]), arr(tables[order]), arr(caps[order]),
    arr(np.zeros((n_r, 17))) if use_cheby else arr(np.zeros((n_r, 17))),
    arr(np.zeros(n_r)),
    S, S, S, S, S, S,
    G,  # prev_z_reion
    S, S,
]
static = dict(
    shape=shape, box_lens=so.box_lens, hii_filter=inputs.astro_options.hii_filter_int,
    mass_dep=True, use_ts=True, use_recomb=True, filter_recomb=True,
    track_gamma=True, last_filtered=False, lagrangian=False,
    use_exp_filter=False, use_minihalos=False, track_nion=False,
    track_mfp=False, use_cheby=True, paint_spheres=False,
)
lowered = jax.jit(
    lambda *a: ion_mod._ionize_scan(*a, **static),
).lower(*args)
compiled = lowered.compile()
ma = compiled.memory_analysis()
print(ma)
try:
    print(f"temp={ma.temp_size_in_bytes/2**30:.2f} GiB "
          f"args={ma.argument_size_in_bytes/2**30:.2f} GiB "
          f"out={ma.output_size_in_bytes/2**30:.2f} GiB "
          f"peak-ish total={(ma.temp_size_in_bytes+ma.argument_size_in_bytes+ma.output_size_in_bytes)/2**30:.2f} GiB")
except Exception as e:
    print("attrs:", e)
