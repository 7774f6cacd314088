"""512^3 node-scroll memory audit: mirrors generate_coeval with stage prints.

Localizes the OOM in the MINIMIZE_MEMORY 512^3 bench segment.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from bench import _enable_compile_cache, _checksum, _headline_inputs
_enable_compile_cache()
import numpy as np, jax
import py21cmfast_tpu as p21
from py21cmfast_tpu.models import spintemp as spintemp_module
from py21cmfast_tpu.drivers.coeval import _slim_chain_ion

inputs = _headline_inputs(512, 512, 4, z_min=10.0, z_max=12.2, zprime=1.03,
                          minimize_memory=True)
all_z = sorted(float(z) for z in inputs.node_redshifts)[::-1]
print("nodes:", len(all_z), all_z, flush=True)
t = time.perf_counter()
def stage(s):
    global t
    print(f"  {s}: {time.perf_counter()-t:.1f}s", flush=True)
    t = time.perf_counter()

ics = p21.compute_initial_conditions(inputs)
_checksum(ics.lowres_density); stage("ICs")

prev_ion = None
prev_z = None
ts_state = None
for z in all_z:
    print(f"node z={z:.3f}", flush=True)
    pf = p21.perturb_field(z, inputs, ics)
    _checksum(pf.density); stage("perturb")
    ts, ts_state = spintemp_module.compute_spin_temperature(
        z, inputs, pf, prev_state=ts_state, prev_redshift=prev_z,
        initial_conditions=ics)
    _checksum(ts.spin_temperature); stage("Ts")
    ion = p21.compute_ionization_field(
        z, inputs, pf, previous_ionized_box=prev_ion, spin_temp=ts,
        prev_redshift=prev_z)
    _checksum(ion.neutral_fraction); stage("ionization")
    tb = p21.brightness_temperature(inputs, ion, pf, spin_temp=ts)
    _checksum(tb.brightness_temp); stage("Tb")
    prev_ion = _slim_chain_ion(ion, keep_xh=False)
    prev_z = z
    del pf, ts, ion, tb
print("512 SCROLL OK", flush=True)
