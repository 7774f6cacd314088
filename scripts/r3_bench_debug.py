"""Step through the bench headline config to find the OOM."""
import sys, time
sys.path.insert(0, "/root/repo")
from bench import _enable_compile_cache, _checksum, _headline_inputs
_enable_compile_cache()
import numpy as np
import jax
import py21cmfast_tpu as p21

def stage(label, t0):
    print(f"  {label}: {time.perf_counter()-t0:.1f}s", flush=True)
    return time.perf_counter()

inputs = _headline_inputs(256, 768, 3, z_min=5.0, z_max=35.0, zprime=1.02)
print("nodes:", len(inputs.node_redshifts), flush=True)
t = time.perf_counter()
ics = p21.compute_initial_conditions(inputs)
_checksum(ics.lowres_density)
t = stage("ICs", t)
n = 0
from py21cmfast_tpu.drivers.coeval import generate_coeval
for cv in generate_coeval(inputs, out_redshifts=(), initial_conditions=ics):
    n += 1
    _checksum(cv.brightness_temperature.brightness_temp)
    t = stage(f"node {n} z={float(cv.redshift):.2f}", t)
    if n >= 4:
        break
print("OK through 4 nodes", flush=True)
