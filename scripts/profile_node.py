"""Per-stage timing of one steady-state Ts+recomb node at HII_DIM=256.

Usage:  python scripts/profile_node.py [HII_DIM [DIM]]

Times (with warm compile cache, steady state after one warmup call):
  - perturb_field
  - compute_spin_temperature (device kernel + host tables separately)
  - compute_ionization_field
  - brightness_temperature
and the per-R-step slope of the two scan kernels (by re-running with a
truncated radius ladder via N_STEP_TS / R_BUBBLE_MAX).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

import py21cmfast_tpu as p21

HII = int(sys.argv[1]) if len(sys.argv) > 1 else 256
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 2 * HII
Z = 12.0
ZPREV = 12.0 * 1.02 + 0.02 * 1


def t(fn, *args, n=2, sync=None, **kw):
    out = fn(*args, **kw)
    if sync:
        sync(out)
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        if sync:
            sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    inputs = p21.InputParameters(random_seed=3).evolve_input_structs(
        HII_DIM=HII, DIM=DIM, BOX_LEN=1.5 * HII,
        SOURCE_MODEL="E-INTEGRAL", USE_TS_FLUCT=True,
        RECOMB_MODEL="inhomogeneous", R_BUBBLE_MAX=50.0,
        ZPRIME_STEP_FACTOR=1.02, MINIMIZE_MEMORY=(HII >= 512),
    ).with_logspaced_redshifts(Z, Z * 1.2)

    t0 = time.time()
    ics = p21.compute_initial_conditions(inputs)
    jax.block_until_ready(ics.lowres_density)
    print(f"ICs (cold): {time.time()-t0:.2f}s", flush=True)

    sec, pf_prev = t(
        p21.perturb_field, ZPREV, inputs, ics,
        sync=lambda o: jax.block_until_ready(o.density),
    )
    print(f"perturb: {sec:.2f}s", flush=True)
    pf = p21.perturb_field(Z, inputs, ics)

    from py21cmfast_tpu.models import spintemp

    # previous-state bootstrap
    ts_prev, ts_state = spintemp.compute_spin_temperature(
        ZPREV, inputs, pf_prev, prev_state=None, prev_redshift=None
    )
    jax.block_until_ready(ts_prev.spin_temperature)

    th0 = time.perf_counter()
    sec, (ts, _) = t(
        spintemp.compute_spin_temperature, Z, inputs, pf,
        prev_state=ts_state, prev_redshift=ZPREV,
        sync=lambda o: jax.block_until_ready(o[0].spin_temperature),
    )
    print(f"spin_temperature (total/node): {sec:.2f}s", flush=True)

    ion_prev = p21.compute_ionization_field(ZPREV, inputs, pf_prev, spin_temp=ts_prev)
    jax.block_until_ready(ion_prev.neutral_fraction)
    sec, ion = t(
        p21.compute_ionization_field, Z, inputs, pf,
        previous_ionized_box=ion_prev, spin_temp=ts,
        previous_perturbed_field=pf_prev, prev_redshift=ZPREV,
        sync=lambda o: jax.block_until_ready(o.neutral_fraction),
    )
    print(f"ionization (total/node): {sec:.2f}s", flush=True)

    sec, tb = t(
        p21.brightness_temperature, inputs, ion, pf, spin_temp=ts,
        sync=lambda o: jax.block_until_ready(o.brightness_temp),
    )
    print(f"brightness_temp: {sec:.2f}s", flush=True)

    # host-table-only cost for the Ts node (separate process-level timing of
    # the numpy table builders)
    from py21cmfast_tpu.models.spintemp import (
        _build_sfrd_tables, setup_z_edges, spectral_prefactors,
    )
    from py21cmfast_tpu.models import hmf
    from py21cmfast_tpu.models.ionization import _get_sigma_table

    ladder = setup_z_edges(Z, inputs)
    sig = _get_sigma_table(inputs)
    sc = hmf.set_scaling_constants(Z, inputs)
    t0 = time.perf_counter()
    spectral_prefactors(Z, ladder, inputs)
    print(f"host: spectral prefactors {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    _build_sfrd_tables(inputs, ladder, sig, sc)
    print(f"host: SFRD tables {time.perf_counter()-t0:.2f}s", flush=True)

    print("xH:", float(np.mean(np.asarray(ion.neutral_fraction))), flush=True)


if __name__ == "__main__":
    main()
