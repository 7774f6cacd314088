"""Round-3 probe: perturb deposit timing at the faithful DIM=4x ratio."""
import sys, time
sys.path.insert(0, "/root/repo")
from bench import _enable_compile_cache, _checksum
_enable_compile_cache()
import jax
import py21cmfast_tpu as p21

def run(hii, dim, seed, zs=(9.0, 8.5, 8.0)):
    inputs = p21.InputParameters(random_seed=seed).evolve_input_structs(
        HII_DIM=hii, DIM=dim, BOX_LEN=1.5 * hii, SOURCE_MODEL="E-INTEGRAL")
    t0 = time.perf_counter()
    ics = p21.compute_initial_conditions(inputs)
    _checksum(ics.lowres_density, ics.hires_density)
    t1 = time.perf_counter()
    print(f"  hii={hii} dim={dim} ICs {t1-t0:.2f}", flush=True)
    for z in zs:
        ta = time.perf_counter()
        pf = p21.perturb_field(z, inputs, ics)
        _checksum(pf.density)
        print(f"  perturb z={z}: {time.perf_counter()-ta:.2f}", flush=True)

for hii, dim in ((256, 512), (256, 1024)):
    print(f"=== warm pass hii={hii} dim={dim}")
    run(hii, dim, 1, zs=(9.0, 8.5, 8.0))
    print(f"=== timed pass")
    run(hii, dim, 2, zs=(9.0, 8.5, 8.0))
