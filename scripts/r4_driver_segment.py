"""Driver-level timing: run a short generate_lightcone segment at the bench
headline config and print per-node wall times (what bench.py will see).

Usage: python scripts/r4_driver_segment.py [z_lo] [z_hi] [HII] [DIM]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

import py21cmfast_tpu as p21

Z_LO = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
Z_HI = float(sys.argv[2]) if len(sys.argv) > 2 else 9.8
HII = int(sys.argv[3]) if len(sys.argv) > 3 else 256
DIM = int(sys.argv[4]) if len(sys.argv) > 4 else 768


def main():
    inputs = p21.InputParameters(random_seed=3).evolve_input_structs(
        HII_DIM=HII, DIM=DIM, BOX_LEN=1.5 * HII,
        SOURCE_MODEL="E-INTEGRAL", USE_TS_FLUCT=True,
        RECOMB_MODEL="inhomogeneous", R_BUBBLE_MAX=50.0,
        USE_EXP_FILTER=False, CELL_RECOMB=False,
        Z_HEAT_MAX=Z_HI, ZPRIME_STEP_FACTOR=1.02,
    ).with_logspaced_redshifts(Z_LO)
    print(f"nodes: {len(inputs.node_redshifts)}", flush=True)

    t0 = time.time()
    ics = p21.compute_initial_conditions(inputs)
    jax.block_until_ready(ics.lowres_density)
    t_ics = time.time() - t0
    print(f"ICs: {t_ics:.1f}s", flush=True)

    times = []
    t_prev = time.perf_counter()
    lc = None
    t0 = time.perf_counter()
    for z, _cv, lc in p21.generate_lightcone(
        inputs, initial_conditions=ics, apply_rsds=True,
    ):
        if z is None:
            break
        now = time.perf_counter()
        times.append(now - t_prev)
        print(f"  node z={z:.2f}: {times[-1]:.2f}s", flush=True)
        t_prev = now
    tb = lc.lightcones["brightness_temp"]
    _ = float(np.asarray(tb[:2, :2, :2]).sum())
    total = time.perf_counter() - t0
    print(f"scroll total: {total:.1f}s  median node {np.median(times):.2f}s  "
          f"p90 {np.percentile(times, 90):.2f}s  finalize "
          f"{total - sum(times):.1f}s", flush=True)


if __name__ == "__main__":
    main()
