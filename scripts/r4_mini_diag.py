"""Mini-family global-history diagnostic: run one seed of a mini-family
config as a lightcone and print our global histories next to the gold's
(global_brightness_temp / global_neutral_fraction at the node redshifts),
plus our mean Ts/Tk/x_e/J21/SFRD proxies per node to locate WHERE the
10-19 mK deviation enters.

Usage: python scripts/r4_mini_diag.py [config] [seed]
"""

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import run_parity as rp  # noqa: E402


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "mini"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 101

    import h5py

    import py21cmfast_tpu as p21
    from py21cmfast_tpu.drivers.lightcone import generate_lightcone
    from py21cmfast_tpu.lightconers import RectilinearLightconer

    gold_path = rp.GOLD_DIR / f"power_spectra_{name}.h5"
    with h5py.File(gold_path, "r") as f:
        g_tb = f["lightcone/global_brightness_temp"][...]
        g_xh = f["lightcone/global_neutral_fraction"][...]

    z, inputs = rp.build_inputs(name, seed, lc=True)
    node_z = np.asarray(inputs.node_redshifts)
    print(f"config={name} seed={seed} nodes={node_z.round(2)}", flush=True)

    lcn = RectilinearLightconer.with_equal_cdist_slices(
        min_redshift=float(node_z.min()), max_redshift=float(node_z.max()),
        inputs=inputs, quantities=("brightness_temp",),
    )
    t0 = time.time()
    rows = []
    lc = None
    for zi, cv, lc in generate_lightcone(
        inputs, lightconer=lcn, apply_rsds=False,
        global_quantities=("brightness_temp", "neutral_fraction"),
    ):
        if zi is None:
            break
        r = {"z": zi}
        r["tb"] = float(np.mean(np.asarray(cv.brightness_temperature.brightness_temp)))
        r["xh"] = float(np.mean(np.asarray(cv.ionized_box.neutral_fraction)))
        if cv.spin_temp is not None:
            st = cv.spin_temp
            r["Ts"] = float(np.mean(np.asarray(st.spin_temperature)))
            r["Tk"] = float(np.mean(np.asarray(st.kinetic_temp_neutral)))
            r["x_e"] = float(np.mean(np.asarray(st.xray_ionised_fraction)))
            if st.J_21_LW is not None:
                r["J21"] = float(np.mean(np.asarray(st.J_21_LW)))
        rows.append(r)
    dt = time.time() - t0

    print(f"wall {dt:.0f}s")
    hdr = ["z", "tb", "xh", "Ts", "Tk", "x_e", "J21"]
    print(" ".join(f"{h:>10}" for h in hdr))
    for r in rows:
        print(" ".join(
            f"{r.get(h, float('nan')):>10.4g}" for h in hdr))
    print("\ngold node grid (descending z) vs ours:")
    print(f"{'z':>8} {'gold_tb':>10} {'our_tb':>10} {'dev_mK':>8} "
          f"{'gold_xh':>9} {'our_xh':>9}")
    # gold arrays are stored over the node redshifts, ascending-z order per
    # the reference's lightcone.node_redshifts (descending) — try both
    our_tb = np.array([r["tb"] for r in rows])
    our_xh = np.array([r["xh"] for r in rows])
    n = min(len(g_tb), len(our_tb))
    for flip in (False, True):
        gt = g_tb[::-1] if flip else g_tb
        gx = g_xh[::-1] if flip else g_xh
        dev = np.abs(gt[:n] - our_tb[:n])
        print(f" orientation flip={flip}: max|dev| = {dev.max():.2f} mK")
    for i in range(n):
        print(f"{node_z[i]:>8.2f} {g_tb[i]:>10.3f} {our_tb[i]:>10.3f} "
              f"{(g_tb[i]-our_tb[i])*1:>8.2f} {g_xh[i]:>9.4f} {our_xh[i]:>9.4f}")


if __name__ == "__main__":
    main()
