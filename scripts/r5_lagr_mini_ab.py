"""A/B diagnostic for the Lagrangian+minihalo Tb power excess.

Runs the SAME seed and physics with SOURCE_MODEL=E-INTEGRAL (passes parity)
vs SOURCE_MODEL=L-INTEGRAL (fails, Tb power ~27% hot at z=18) and prints
per-node means/stds of every intermediate field (Ts, Tk, x_e, J21, xH, Tb)
plus the z=18 power spectra of Ts and Tb.  Both are deterministic
expectation-value source models, so they should agree closely; where they
first diverge localizes the bug.

Usage: python scripts/r5_lagr_mini_ab.py [seed] [--ms]
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import numpy as np

import py21cmfast_tpu as p21
from py21cmfast_tpu.drivers.coeval import generate_coeval
from py21cmfast_tpu.ops.ps import reference_binned_power

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 101
Z = 18.0


def build(source_model):
    kw = dict(
        HII_DIM=50, DIM=150, BOX_LEN=100,
        SOURCE_MODEL=source_model,
        USE_MINI_HALOS=True,
        USE_TS_FLUCT=True,
        RECOMB_MODEL="inhomogeneous",
        R_BUBBLE_MAX=50.0,
        M_TURN=5.0,
        Z_HEAT_MAX=25.0,
        ZPRIME_STEP_FACTOR=1.1,
        V_CB_MODEL="FLUCTS",
        USE_EXP_FILTER=False,
        CELL_RECOMB=False,
        USE_UPPER_STELLAR_TURNOVER=False,
        SAMPLER_MIN_MASS=1e9,
    )
    inputs = p21.InputParameters(random_seed=SEED).evolve_input_structs(**kw)
    return inputs.with_logspaced_redshifts(Z)


def run(source_model):
    inputs = build(source_model)
    rows = []
    cv = None
    for cv in generate_coeval(inputs, out_redshifts=[Z]):
        r = {"z": float(cv.redshift)}
        st = cv.spin_temp
        if st is not None:
            for nm, fld in [("Ts", st.spin_temperature),
                            ("Tk", st.kinetic_temp_neutral),
                            ("xe", st.xray_ionised_fraction),
                            ("J21", st.J_21_LW)]:
                if fld is not None:
                    a = np.asarray(fld)
                    r[nm] = (float(a.mean()), float(a.std()))
        hb = cv.halobox
        if hb is not None:
            for nm, fld in [("hsfr", hb.halo_sfr), ("hsfr_m", hb.halo_sfr_mini),
                            ("hxray", hb.halo_xray)]:
                if fld is not None:
                    a = np.asarray(fld)
                    r[nm] = (float(a.mean()), float(a.std()))
            r["l10Mc_MCG"] = float(hb.log10_Mcrit_MCG_ave)
        a = np.asarray(cv.brightness_temperature.brightness_temp)
        r["Tb"] = (float(a.mean()), float(a.std()))
        a = np.asarray(cv.ionized_box.neutral_fraction)
        r["xH"] = (float(a.mean()), float(a.std()))
        rows.append(r)
    tb = np.asarray(cv.brightness_temperature.brightness_temp)
    ts = np.asarray(cv.spin_temp.spin_temperature)
    k, p_tb, _ = reference_binned_power(tb, (100.0,) * 3)
    _, p_ts, _ = reference_binned_power(ts, (100.0,) * 3)
    return rows, k, p_tb, p_ts


rows_e, k, ptb_e, pts_e = run("E-INTEGRAL")
rows_l, _, ptb_l, pts_l = run("L-INTEGRAL")

print(f"seed={SEED}  node-by-node (mean, std):")
for re_, rl in zip(rows_e, rows_l):
    print(f"z={re_['z']:.2f}")
    for key in ("Ts", "Tk", "xe", "J21", "hsfr", "hsfr_m", "hxray", "xH", "Tb"):
        ve, vl = re_.get(key), rl.get(key)
        if ve is None and vl is None:
            continue
        fmt = (lambda v: f"{v[0]:.4g}/{v[1]:.4g}" if v else "--")
        extra = ""
        if ve and vl and ve[1] > 0 and vl[1] > 0:
            extra = f"   std ratio L/E = {vl[1] / ve[1]:.3f}"
        print(f"   {key:>7}: E {fmt(ve)}   L {fmt(vl)}{extra}")
    if "l10Mc_MCG" in rl:
        print(f"   l10Mc_MCG: E {re_.get('l10Mc_MCG', float('nan')):.3f} "
              f"L {rl['l10Mc_MCG']:.3f}")

band = (k > 0.3) & (k < 1.2)
print("\nz=18 band power ratios (L/E):")
print(f"  Tb: {np.exp(np.mean(np.log(ptb_l[band] / ptb_e[band]))):.3f}")
print(f"  Ts: {np.exp(np.mean(np.log(pts_l[band] / pts_e[band]))):.3f}")
