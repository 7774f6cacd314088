import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import py21cmfast_tpu as p21

inputs = p21.InputParameters(random_seed=1).evolve_input_structs(
    HII_DIM=256, DIM=512, BOX_LEN=384.0, SOURCE_MODEL="E-INTEGRAL")
ics = p21.compute_initial_conditions(inputs)
pf = p21.perturb_field(8.0, inputs, ics)
ion = p21.compute_ionization_field(8.0, inputs, pf)
jax.block_until_ready(ion.neutral_fraction)
for i in range(3):
    t0=time.time()
    tb = p21.brightness_temperature(inputs, ion, pf)
    jax.block_until_ready(tb.brightness_temp)
    print(f"tb call {i}: {time.time()-t0:.3f}s", flush=True)
