import sys, time; sys.path.insert(0, "/root/repo")
import numpy as np
# re-run ONLY the finalization timing on synthetic data matching the full run
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import py21cmfast_tpu as p21
from py21cmfast_tpu import rsds

inputs = p21.InputParameters(random_seed=42).evolve_input_structs(
    HII_DIM=256, DIM=512, BOX_LEN=384.0)
rng = np.random.default_rng(0)
n_sl = 5513
tb = rng.normal(10, 5, (256, 256, n_sl)).astype(np.float32)
vz = rng.normal(0, 1e-17, (256, 256, n_sl)).astype(np.float32)
lc_z = np.linspace(5.5, 35.0, n_sl)
t0=time.time()
out = rsds.apply_rsds(tb, vz, lc_z, inputs, periodic=False)
print("apply_rsds on full cone:", time.time()-t0, "s; shape", out.shape, "finite:", np.all(np.isfinite(out)))
