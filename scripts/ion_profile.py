import sys, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
import py21cmfast_tpu as p21
from py21cmfast_tpu.models import ionization as ion_m
_ = float(jnp.zeros(()))

inputs = p21.InputParameters(random_seed=1).evolve_input_structs(
    HII_DIM=256, DIM=512, BOX_LEN=384.0, SOURCE_MODEL="E-INTEGRAL")
ics = p21.compute_initial_conditions(inputs)
pf = p21.perturb_field(8.0, inputs, ics)
_ = float(jnp.sum(pf.density))

for i in range(3):
    t0=time.perf_counter()
    ion = p21.compute_ionization_field(8.0, inputs, pf)
    t_host_done=time.perf_counter()
    s = float(jnp.sum(ion.neutral_fraction)) +  (float(jnp.sum(ion.cumulative_recombinations)) if ion.cumulative_recombinations is not None else 0.0)
    t1=time.perf_counter()
    print(f"run{i}: host+dispatch {t_host_done-t0:.2f}s device-drain {t1-t_host_done:.2f}s total {t1-t0:.2f}", flush=True)
