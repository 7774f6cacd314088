import sys; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import py21cmfast_tpu as p21

inputs = p21.create_params_from_template("latest", random_seed=7).evolve_input_structs(
    HII_DIM=16, DIM=32, BOX_LEN=40.0, ZPRIME_STEP_FACTOR=1.3, Z_HEAT_MAX=25.0,
    N_STEP_TS=20,
).with_logspaced_redshifts(10.0, 25.0)
for c in p21.generate_coeval(inputs, out_redshifts=[inputs.node_redshifts[-1]]):
    ts = c.spin_temp
    print("z", c.redshift,
          "Tk_mean", float(np.asarray(ts.kinetic_temp_neutral).mean()),
          "Ts_mean", float(np.asarray(ts.spin_temperature).mean()),
          "xh", float(np.asarray(c.neutral_fraction).mean()))
    # adiabatic Tk at z=10 would be ~ 2.2K; heated should exceed CMB-coupled values
