"""Node-by-node E-INTEGRAL vs L-INTEGRAL diagnostic at the EXACT parity config.

The committed parity artifacts show the Lagrangian+minihalo configs
(sampler_mini, multiple_scattering_mini) under-heating by z=18: global Tb
-39.0 vs gold -36.1/-36.3 mK while the Eulerian `mini` config matches its
gold (-36.04 vs -36.10).  Both Lagrangian source models fail identically, so
the bug lives in shared machinery (fixed-grid MCG integrals, xray-source
shells, or the Ts ladder's Lagrangian branch).

This script runs the multiple_scattering_mini parity config (CLASS transfer
from the gold file, ZPRIME_STEP_FACTOR=1.04) with SOURCE_MODEL flipped
between E-INTEGRAL and L-INTEGRAL at one seed and prints per-node means of
Tk / x_e / J21 / Ts plus per-node shell diagnostics (mean filtered sfr,
sfr_mini, xray, shell Mcrit, tau_X horizons).  Where they first diverge
localizes the bug.

Usage: python scripts/r5_parity_mini_diag.py [seed] [--no-ms]
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import numpy as np

import py21cmfast_tpu as p21
from py21cmfast_tpu.drivers.coeval import generate_coeval
from py21cmfast_tpu.models import heating, spintemp
from py21cmfast_tpu.ops.ps import reference_binned_power
from run_parity import build_inputs, CONFIGS, DEFAULTS

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 101
USE_MS = "--no-ms" not in sys.argv
Z = 18.0

# record tau horizons per node
_horizons = []
_orig_nu_tau_one = heating.nu_tau_one


def _spy_nu_tau_one(*a, **kw):
    v = _orig_nu_tau_one(*a, **kw)
    _horizons.append(float(v))
    return v


heating.nu_tau_one = _spy_nu_tau_one


def run(source_model):
    import attrs

    cfg = "multiple_scattering_mini" if USE_MS else "sampler_mini"
    _, inputs = build_inputs(cfg, SEED)
    inputs = inputs.evolve_input_structs(SOURCE_MODEL=source_model)
    rows = []
    cv = None
    for cv in generate_coeval(inputs, out_redshifts=[Z]):
        _horizons.clear()
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
            if hb.log10_Mcrit_MCG_ave is not None:
                r["l10Mc"] = float(hb.log10_Mcrit_MCG_ave)
        sb = getattr(cv, "xray_source_box", None)
        if sb is not None:
            r["shell_sfr"] = float(np.mean(np.asarray(sb.filtered_sfr)))
            if sb.filtered_sfr_mini is not None:
                r["shell_sfr_m"] = float(np.mean(np.asarray(sb.filtered_sfr_mini)))
            r["shell_xray"] = float(np.mean(np.asarray(sb.filtered_xray)))
            if sb.mean_log10_Mcrit_LW is not None:
                mc = np.asarray(sb.mean_log10_Mcrit_LW)
                r["shell_mcrit"] = (float(mc.min()), float(mc.max()))
        a = np.asarray(cv.brightness_temperature.brightness_temp)
        r["Tb"] = (float(a.mean()), float(a.std()))
        rows.append(r)
    tb = np.asarray(cv.brightness_temperature.brightness_temp)
    L = 100.0
    k, p_tb, _ = reference_binned_power(tb, (L,) * 3)
    return rows, k, p_tb


rows_e, k, ptb_e = run("E-INTEGRAL")
rows_l, _, ptb_l = run("L-INTEGRAL")

print(f"seed={SEED} ms={USE_MS}  node-by-node (mean/std):")
for re_, rl in zip(rows_e, rows_l):
    print(f"z={re_['z']:.2f}")
    for key in ("Ts", "Tk", "xe", "J21", "hsfr", "hsfr_m", "hxray",
                "shell_sfr", "shell_sfr_m", "shell_xray", "shell_mcrit",
                "xH", "Tb"):
        ve, vl = re_.get(key), rl.get(key)
        if ve is None and vl is None:
            continue

        def fmt(v):
            if v is None:
                return "--"
            if isinstance(v, tuple):
                return f"{v[0]:.4g}/{v[1]:.4g}"
            return f"{v:.4g}"

        print(f"   {key:>12}: E {fmt(ve)}   L {fmt(vl)}")
    if "l10Mc" in rl:
        print(f"   {'l10Mc':>12}: E {fmt(re_.get('l10Mc'))} L {fmt(rl.get('l10Mc'))}")

band = (k > 0.3) & (k < 1.2)
print("\nz=18 band Tb power ratio L/E:",
      f"{np.exp(np.mean(np.log(ptb_l[band] / ptb_e[band]))):.3f}")
