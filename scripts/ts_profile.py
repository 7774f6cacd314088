import sys, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
import py21cmfast_tpu as p21
_ = float(jnp.zeros(()))

inputs = p21.InputParameters(random_seed=1).evolve_input_structs(
    HII_DIM=256, DIM=512, BOX_LEN=384.0, SOURCE_MODEL="E-INTEGRAL",
    USE_TS_FLUCT=True, Z_HEAT_MAX=20.0, ZPRIME_STEP_FACTOR=1.2,
).with_logspaced_redshifts(14.0, 20.0)
from py21cmfast_tpu.models import spintemp as st
ics = p21.compute_initial_conditions(inputs)
zs = list(inputs.node_redshifts)
pf = p21.perturb_field(zs[0], inputs, ics)
ts, state = st.compute_spin_temperature(zs[0], inputs, pf)
_ = float(jnp.sum(ts.spin_temperature))
prev_z = zs[0]
for z in zs[1:3]:
    pf = p21.perturb_field(z, inputs, ics)
    _ = float(jnp.sum(pf.density))
    t0=time.perf_counter()
    ts, state = st.compute_spin_temperature(z, inputs, pf, prev_state=state, prev_redshift=prev_z)
    chk = float(jnp.sum(ts.spin_temperature)) + float(jnp.sum(ts.kinetic_temp_neutral))
    print(f"Ts at z={z:.2f}: {time.perf_counter()-t0:.2f}s", flush=True)
    prev_z = z
