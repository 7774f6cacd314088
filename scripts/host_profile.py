import time
import numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
import py21cmfast_tpu as p21
from py21cmfast_tpu.models import hmf, ionization

inputs = p21.InputParameters(random_seed=1).evolve_input_structs(
    HII_DIM=256, DIM=512, BOX_LEN=384.0, SOURCE_MODEL="E-INTEGRAL")
cosmo = inputs.cosmology
t0=time.time(); st = ionization._get_sigma_table(inputs); print("sigma table:", time.time()-t0)
z=8.0
t0=time.time(); sc = hmf.set_scaling_constants(z, inputs); print("scaling consts:", time.time()-t0)
m_min = hmf.minimum_source_mass(z, inputs)
t0=time.time()
mf = hmf.nion_general(st, cosmo, 1, z, np.log(m_min), np.log(1e16), sc.mturn_a_nofb, sc)
print("nion_general:", time.time()-t0)
t0=time.time(); ladder = ionization.setup_radii(inputs, m_min); print("radii:", time.time()-t0, ladder.n)
growth = float(cosmo.dicke(z))
t0=time.time()
tabs = ionization._build_nion_tables(inputs, ladder, st, growth, m_min, sc)
print("nion tables:", time.time()-t0)
t0=time.time(); amp = __import__("py21cmfast_tpu.models.ics", fromlist=["power_amplitude_table"]).power_amplitude_table(inputs)
print("power table:", time.time()-t0)
