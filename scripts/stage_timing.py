import sys as _s; _s.path.insert(0, "/root/repo")
import time, sys
t00=time.time()
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import py21cmfast_tpu as p21
print("import", time.time()-t00, flush=True)

hii = int(sys.argv[1]) if len(sys.argv)>1 else 256
dim = int(sys.argv[2]) if len(sys.argv)>2 else 2*hii
inputs = p21.InputParameters(random_seed=1).evolve_input_structs(
    HII_DIM=hii, DIM=dim, BOX_LEN=1.5*hii, SOURCE_MODEL="E-INTEGRAL")
t0=time.time(); ics = p21.compute_initial_conditions(inputs); jax.block_until_ready(ics.lowres_density)
print("ICs:", time.time()-t0, flush=True)
t0=time.time(); pf = p21.perturb_field(8.0, inputs, ics); jax.block_until_ready(pf.density)
print("perturb:", time.time()-t0, flush=True)
t0=time.time(); ion = p21.compute_ionization_field(8.0, inputs, pf); jax.block_until_ready(ion.neutral_fraction)
print("ionize:", time.time()-t0, flush=True)
t0=time.time(); tb = p21.brightness_temperature(inputs, ion, pf); jax.block_until_ready(tb.brightness_temp)
print("tb:", time.time()-t0, flush=True)
print("xH:", float(np.mean(np.asarray(ion.neutral_fraction))), flush=True)
