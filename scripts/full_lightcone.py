import sys, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import py21cmfast_tpu as p21
_ = float(jnp.zeros(()))

inputs = p21.InputParameters(random_seed=42).evolve_input_structs(
    HII_DIM=256, DIM=512, BOX_LEN=384.0, SOURCE_MODEL="E-INTEGRAL",
    USE_TS_FLUCT=True, RECOMB_MODEL="INHOMOGENEOUS", N_STEP_TS=40,
    ZPRIME_STEP_FACTOR=1.02, Z_HEAT_MAX=35.0,
).with_logspaced_redshifts(5.5, 35.0)
print("nodes:", len(inputs.node_redshifts), flush=True)

t0 = time.perf_counter()
t_prev = t0
lc = None
for z, cv, lc in p21.generate_lightcone(inputs, apply_rsds=True):
    if z is None:
        break
    now = time.perf_counter()
    print(f"node z={z:6.2f}  dt={now-t_prev:6.1f}s  elapsed={now-t0:7.1f}s", flush=True)
    t_prev = now
total = time.perf_counter() - t0
tb = lc.lightcones["brightness_temp"]
print(f"TOTAL: {total:.1f}s ({total/60:.1f} min) for {len(inputs.node_redshifts)} nodes", flush=True)
print("lightcone shape:", tb.shape, "Tb range:", float(np.min(tb)), float(np.max(tb)), flush=True)
print("global xH at ends:", lc.global_quantities["neutral_fraction"][0],
      lc.global_quantities["neutral_fraction"][-1], flush=True)
