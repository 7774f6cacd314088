import sys, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import py21cmfast_tpu as p21
_ = float(jnp.zeros(()))

def sync(*arrs):
    return sum(float(jnp.sum(a)) for a in arrs if a is not None)

for seed in (1, 2, 3):
    inputs = p21.InputParameters(random_seed=seed).evolve_input_structs(
        HII_DIM=256, DIM=512, BOX_LEN=384.0, SOURCE_MODEL="E-INTEGRAL")
    t0=time.perf_counter()
    ics = p21.compute_initial_conditions(inputs); sync(ics.lowres_density, ics.hires_density, ics.vx, ics.vy, ics.vz, ics.vx_2LPT, ics.vy_2LPT, ics.vz_2LPT)
    t1=time.perf_counter()
    pf = p21.perturb_field(8.0, inputs, ics); sync(pf.density, pf.velocity_z)
    t2=time.perf_counter()
    ion = p21.compute_ionization_field(8.0, inputs, pf); sync(ion.neutral_fraction, ion.ionisation_rate_G12, ion.cumulative_recombinations)
    t3=time.perf_counter()
    tb = p21.brightness_temperature(inputs, ion, pf); sync(tb.brightness_temp)
    t4=time.perf_counter()
    print(f"seed {seed}: ics {t1-t0:.2f} pf {t2-t1:.2f} ion {t3-t2:.2f} tb {t4-t3:.2f} total {t4-t0:.2f}", flush=True)
