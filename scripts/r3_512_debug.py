"""Stage-by-stage 512^3/DIM=1024 node debug (memory localization)."""
import sys, time
sys.path.insert(0, "/root/repo")
from bench import _enable_compile_cache, _checksum, _headline_inputs
_enable_compile_cache()
import numpy as np, jax
import py21cmfast_tpu as p21

inputs = _headline_inputs(512, 1024, 4, z_min=10.0, z_max=12.2, zprime=1.03)
print("nodes:", len(inputs.node_redshifts), flush=True)
t = time.perf_counter()
def stage(s):
    global t
    print(f"{s}: {time.perf_counter()-t:.1f}s", flush=True)
    t = time.perf_counter()

ics = p21.compute_initial_conditions(inputs)
_checksum(ics.lowres_density); stage("ICs")
z0 = float(inputs.node_redshifts[0])
pf = p21.perturb_field(z0, inputs, ics)
_checksum(pf.density); stage("perturb (chan build)")
ts, ts_state = p21.compute_spin_temperature(z0, inputs, pf)
_checksum(ts.spin_temperature); stage("Ts")
ion = p21.compute_ionization_field(z0, inputs, pf, spin_temp=ts)
_checksum(ion.neutral_fraction); stage("ionization")
tb = p21.brightness_temperature(inputs, ion, pf, spin_temp=ts)
_checksum(tb.brightness_temp); stage("Tb")
print("512 NODE OK", flush=True)
