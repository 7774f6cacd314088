import sys, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import py21cmfast_tpu as p21

def run_once(seed):
    inputs = p21.InputParameters(random_seed=seed).evolve_input_structs(
        HII_DIM=256, DIM=512, BOX_LEN=384.0, SOURCE_MODEL="E-INTEGRAL")
    t0 = time.perf_counter()
    ics = p21.compute_initial_conditions(inputs)
    jax.block_until_ready(ics.lowres_density)
    t1 = time.perf_counter()
    pf = p21.perturb_field(8.0, inputs, ics)
    jax.block_until_ready(pf.density)
    t2 = time.perf_counter()
    ion = p21.compute_ionization_field(8.0, inputs, pf)
    jax.block_until_ready(ion.neutral_fraction)
    t3 = time.perf_counter()
    tb = p21.brightness_temperature(inputs, ion, pf)
    jax.block_until_ready(tb.brightness_temp)
    t4 = time.perf_counter()
    print(f"seed {seed}: ics {t1-t0:.3f} pf {t2-t1:.3f} ion {t3-t2:.3f} tb {t4-t3:.3f} total {t4-t0:.3f} xh {float(np.mean(np.asarray(ion.neutral_fraction))):.4f}", flush=True)
    return t4-t0

run_once(1)
run_once(2)
run_once(3)
