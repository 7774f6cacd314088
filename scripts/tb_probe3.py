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
t0=time.time(); ion = p21.compute_ionization_field(8.0, inputs, pf)
print("ionize dispatch+host:", time.time()-t0, flush=True)
t0=time.time(); jax.block_until_ready(ion.neutral_fraction); print("xh ready:", time.time()-t0, flush=True)
for name in ("ionisation_rate_G12","mean_free_path","z_reion","cumulative_recombinations"):
    t0=time.time(); v=getattr(ion,name)
    if v is not None: jax.block_until_ready(v)
    print(name, "ready:", time.time()-t0, flush=True)
t0=time.time(); z=float(ion.redshift); print("float(redshift):", time.time()-t0, flush=True)
