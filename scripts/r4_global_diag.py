"""Diff our global (0-D) evolution against the reference's
global_evolution.h5 gold, column by column (J_21_LW, Tk, Ts, xH, Tb, x_e).

Usage: JAX_PLATFORMS=cpu python scripts/r4_global_diag.py
"""
import sys
from pathlib import Path

import h5py
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

from test_global_evolution import _gold_inputs, GOLD  # noqa: E402
import py21cmfast_tpu as p21  # noqa: E402


def main():
    with h5py.File(GOLD, "r") as f:
        gold = {k: f["quantities"][k][...] for k in f["quantities"]}
    inputs = _gold_inputs()
    ge = p21.run_global_evolution(inputs)
    z = ge.node_redshifts
    cols = [
        ("J_21_LW", "J_21_LW"),
        ("kinetic_temp_neutral", "Tk"),
        ("spin_temperature", "Ts"),
        ("neutral_fraction", "xH"),
        ("brightness_temp", "Tb"),
        ("xray_ionised_fraction", "x_e"),
    ]
    hdr = f"{'z':>7}"
    for k, lab in cols:
        hdr += f" {'g_'+lab:>10} {'o_'+lab:>10}"
    print(hdr)
    step = max(1, len(z) // 30)
    for i in range(0, len(z), step):
        row = f"{z[i]:7.3f}"
        for k, lab in cols:
            g = gold[k][i]
            o = ge.quantities.get(k, np.full_like(gold[k], np.nan))[i]
            row += f" {g:>10.4g} {o:>10.4g}"
        print(row)
    # worst ratios
    for k, lab in cols:
        if k not in ge.quantities:
            continue
        g, o = gold[k], ge.quantities[k]
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.where(np.abs(g) > 1e-12, o / g, 1.0)
        i = int(np.argmax(np.abs(np.log(np.abs(r) + 1e-300))))
        print(f"{lab:>8}: worst ratio {r[i]:.3f} at z={z[i]:.2f}")


if __name__ == "__main__":
    main()
