import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import py21cmfast_tpu as p21
from py21cmfast_tpu.models.brightness import _tb_kernel, brightness_constant
from py21cmfast_tpu.cosmology.constants import physconst

inputs = p21.InputParameters(random_seed=1).evolve_input_structs(
    HII_DIM=256, DIM=512, BOX_LEN=384.0, SOURCE_MODEL="E-INTEGRAL")
ics = p21.compute_initial_conditions(inputs)
pf = p21.perturb_field(8.0, inputs, ics)
ion = p21.compute_ionization_field(8.0, inputs, pf)
jax.block_until_ready(ion.neutral_fraction)

t0=time.time(); z = float(ion.redshift); print("float(redshift):", time.time()-t0, flush=True)
t0=time.time()
cf = brightness_constant(inputs, z); trad = physconst.T_cmb*(1+z)
print("consts:", time.time()-t0, flush=True)
t0=time.time()
tb, tau = _tb_kernel(ion.neutral_fraction, pf.density, jnp.float32(1.0),
                     jnp.float32(cf), jnp.float32(trad), jnp.float32(1.0+z), use_ts=False)
print("dispatch:", time.time()-t0, flush=True)
t0=time.time(); jax.block_until_ready(tb); print("block:", time.time()-t0, flush=True)
