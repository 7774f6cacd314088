import time, sys
sys.path.insert(0, "/root/repo")
from bench import _enable_compile_cache
_enable_compile_cache()
import jax
import py21cmfast_tpu as p21

def run(seed):
    inputs = p21.InputParameters(random_seed=seed).evolve_input_structs(
        HII_DIM=256, DIM=512, BOX_LEN=384.0, SOURCE_MODEL="E-INTEGRAL")
    t0=time.time()
    ics = p21.compute_initial_conditions(inputs); jax.block_until_ready(ics)
    t1=time.time(); print(f"  ICs {t1-t0:.2f}", flush=True)
    pf = p21.perturb_field(8.0, inputs, ics); jax.block_until_ready(pf)
    t2=time.time(); print(f"  perturb {t2-t1:.2f}", flush=True)
    ion = p21.compute_ionization_field(8.0, inputs, pf); jax.block_until_ready(ion)
    t3=time.time(); print(f"  ionize {t3-t2:.2f}", flush=True)
    tb = p21.brightness_temperature(inputs, ion, pf); jax.block_until_ready(tb)
    print(f"  tb {time.time()-t3:.2f}  total {time.time()-t0:.2f}", flush=True)

run(1); print("steady:",flush=True); run(2)
