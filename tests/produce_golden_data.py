"""Produce golden regression data: delta-Tb power spectra for named option sets.

Equivalent of reference tests/produce_integration_test_data.py:84-280 at
reduced size: each config runs a coeval at z=10.5 (plus the evolution needed
for Ts/recombination configs) and stores the dimensionless power spectrum of
brightness_temp, the global xH and mean Tb in tests/golden_data/<name>.npz.

Run `python tests/produce_golden_data.py` to (re)generate.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import py21cmfast_tpu as p21
from py21cmfast_tpu.ops import ps

GOLDEN_DIR = Path(__file__).parent / "golden_data"

BASE = dict(HII_DIM=24, DIM=72, BOX_LEN=36.0, ZPRIME_STEP_FACTOR=1.25, Z_HEAT_MAX=25.0)
SEED = 1234
REDSHIFT = 10.5

CONFIGS = {
    "simple": {"SOURCE_MODEL": "E-INTEGRAL"},
    "no-mdz": {"SOURCE_MODEL": "CONST-ION-EFF", "M_MIN_in_Mass": False},
    "ts": {"SOURCE_MODEL": "E-INTEGRAL", "USE_TS_FLUCT": True},
    "inhomo": {
        "SOURCE_MODEL": "E-INTEGRAL",
        "RECOMB_MODEL": "INHOMOGENEOUS",
        "R_BUBBLE_MAX": 20.0,
    },
    "sampler": {"SOURCE_MODEL": "CHMF-SAMPLER", "SAMPLER_MIN_MASS": 1e9},
    "lightcone": {"SOURCE_MODEL": "E-INTEGRAL"},  # special-cased below
}


def run_config(name, opts):
    inputs = p21.InputParameters(random_seed=SEED).evolve_input_structs(**BASE, **opts)
    needs_nodes = opts.get("USE_TS_FLUCT") or opts.get("RECOMB_MODEL") not in (None, "NONE")
    if name == "lightcone":
        inputs = inputs.with_logspaced_redshifts(9.0, 14.0)
        lc = p21.run_lightcone(inputs)
        bt = lc.brightness_temp
        k, pk, _ = ps.power_spectrum_1d(
            bt[:, :, : inputs.simulation_options.HII_DIM],
            inputs.simulation_options.box_lens,
            n_bins=8,
        )
        return dict(
            k=k, power=pk,
            global_xh=lc.global_quantities["neutral_fraction"],
            mean_tb=np.array([np.nanmean(bt)]),
        )
    if needs_nodes:
        inputs = inputs.with_logspaced_redshifts(REDSHIFT, 25.0)
    cv = p21.run_coeval(inputs, REDSHIFT)
    bt = np.asarray(cv.brightness_temp)
    k, pk, _ = ps.power_spectrum_1d(bt, inputs.simulation_options.box_lens, n_bins=8)
    return dict(
        k=k, power=pk,
        global_xh=np.array([np.asarray(cv.neutral_fraction).mean()]),
        mean_tb=np.array([bt.mean()]),
    )


def main(names=None):
    GOLDEN_DIR.mkdir(exist_ok=True)
    for name, opts in CONFIGS.items():
        if names and name not in names:
            continue
        print(f"producing golden data: {name}")
        data = run_config(name, opts)
        np.savez(GOLDEN_DIR / f"{name}.npz", **data)
        print(f"  xH={data['global_xh'][-1]:.4f}  Tb={data['mean_tb'][0]:.3f}")


if __name__ == "__main__":
    main(sys.argv[1:] or None)
