"""Instrumented 6-node lightcone segment at the bench headline config:
wall-clock around every per-node sub-step of the driver loop, to locate the
gap between ~3.8 s of stage time and the 7.8 s bench node median.
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
from py21cmfast_tpu.models import spintemp as st_mod
from py21cmfast_tpu.lightconers import RectilinearLightconer
from py21cmfast_tpu.exceptions import validate_snapshot

HII, DIM = 256, 768
Z_LO, Z_HI = 8.0, 9.6


class T:
    def __init__(self):
        self.t = time.perf_counter()
        self.marks = []

    def mark(self, name):
        now = time.perf_counter()
        self.marks.append((name, now - self.t))
        self.t = now


def main():
    inputs = p21.InputParameters(random_seed=3).evolve_input_structs(
        HII_DIM=HII, DIM=DIM, BOX_LEN=1.5 * HII,
        SOURCE_MODEL="E-INTEGRAL", USE_TS_FLUCT=True,
        RECOMB_MODEL="inhomogeneous", R_BUBBLE_MAX=50.0,
        USE_EXP_FILTER=False, CELL_RECOMB=False,
        Z_HEAT_MAX=Z_HI, ZPRIME_STEP_FACTOR=1.02,
    ).with_logspaced_redshifts(Z_LO)
    node_z = np.asarray(inputs.node_redshifts)
    print(f"nodes: {len(node_z)}", flush=True)

    t0 = time.time()
    ics = p21.compute_initial_conditions(inputs)
    jax.block_until_ready(ics.lowres_density)
    print(f"ICs: {time.time()-t0:.1f}s", flush=True)

    lightconer = RectilinearLightconer.with_equal_cdist_slices(
        min_redshift=float(node_z.min()), max_redshift=float(node_z.max()),
        inputs=inputs, quantities=("brightness_temp", "tau_21"),
    )
    cosmo = inputs.cosmology
    quantities = ("brightness_temp", "tau_21", "velocity_z")
    lightcones = {q: np.zeros((HII, HII, lightconer.n_slices), np.float32)
                  for q in quantities}

    import jax.numpy as jnp

    prev_ion = None
    prev_ts = None
    ts_state = None
    prev_z = None
    prev_coeval = None
    prev_pf = None
    for i, z in enumerate(node_z):
        z = float(z)
        tm = T()
        pf = p21.perturb_field(z, inputs, ics)
        jax.block_until_ready(pf.density)
        tm.mark("perturb")
        ts, ts_state = st_mod.compute_spin_temperature(
            z, inputs, pf, prev_state=ts_state, prev_redshift=prev_z,
            initial_conditions=ics, previous_ionized_box=prev_ion,
        )
        jax.block_until_ready(ts.spin_temperature)
        tm.mark("spintemp")
        ion = p21.compute_ionization_field(
            z, inputs, pf, previous_ionized_box=prev_ion, spin_temp=ts,
            previous_perturbed_field=prev_pf, prev_redshift=prev_z,
        )
        jax.block_until_ready(ion.neutral_fraction)
        tm.mark("ionize")
        tb = p21.brightness_temperature(inputs, ion, pf, spin_temp=ts)
        jax.block_until_ready(tb.brightness_temp)
        tm.mark("tb")
        validate_snapshot(z, pf, None, ts, ion, tb)
        tm.mark("validate")

        from py21cmfast_tpu.drivers.coeval import Coeval
        coeval = Coeval(
            redshift=z, initial_conditions=ics, perturbed_field=pf,
            ionized_box=ion, brightness_temperature=tb, spin_temp=ts,
        )
        gq = {}
        for q in ("brightness_temp", "neutral_fraction"):
            gq[q] = float(jnp.mean(lightconer.get_field(coeval, q, device=True)))
        tm.mark("gq")
        if prev_coeval is not None:
            for q in quantities:
                idx, vals = lightconer.make_lightcone_slices(
                    coeval, prev_coeval, cosmo, inputs, q
                )
                if idx is not None:
                    lightcones[q][:, :, idx] = vals
        tm.mark("slices")
        prev_coeval = coeval
        from py21cmfast_tpu.drivers.coeval import _slim_chain_ion
        prev_ion = _slim_chain_ion(ion, keep_xh=False)
        prev_ts = ts
        prev_z = z
        prev_pf = None
        total = sum(s for _, s in tm.marks)
        print(f"node {i} z={z:.2f}: " + " ".join(
            f"{n}={s:.2f}" for n, s in tm.marks) + f" TOTAL={total:.2f}",
            flush=True)


if __name__ == "__main__":
    main()
