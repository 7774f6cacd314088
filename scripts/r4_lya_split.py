"""Host-side estimate of the mean Lyman-alpha coupling flux split
(ACG vs MCG) for the `mini` parity config at z=18, using the same shell
ladder / tables the Ts kernel consumes:

  dstarlya_acg ~ sum_R zfac(R) * mean_sfrd(R) * fstar10 * p_star(R)
  dstarlya_mcg ~ sum_R zfac(R) * mean_sfrd_mini(R) * fstar7 * p_star_mini(R)

If the MCG share is negligible while the gold needs ~1.7x our total, the
MCG chain (conditional MF, Mturn, or spectral factors) is broken.
"""

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import run_parity as rp


def main():
    import py21cmfast_tpu as p21
    from py21cmfast_tpu.models import hmf
    from py21cmfast_tpu.models.spintemp import (
        setup_z_edges, spectral_prefactors, _get_sigma_table,
    )

    name = sys.argv[1] if len(sys.argv) > 1 else "mini"
    zp = float(sys.argv[2]) if len(sys.argv) > 2 else 18.0
    j21 = float(sys.argv[3]) if len(sys.argv) > 3 else 0.04

    _z, inputs = rp.build_inputs(name, 101, lc=True)
    cosmo = inputs.cosmology
    ap = inputs.astro_params

    ladder = setup_z_edges(zp, inputs)
    n_r = len(ladder.R)
    spec = spectral_prefactors(zp, ladder, inputs)
    sigma_table = _get_sigma_table(inputs)
    hmf_i = hmf.HMF_NAMES[inputs.matter_options.HMF]

    sc_zp = hmf.set_scaling_constants(zp, inputs).without_esc()
    print(f"zp={zp}  mturn_a_nofb={sc_zp.mturn_a_nofb:.3e}  "
          f"mturn_m_nofb={sc_zp.mturn_m_nofb:.3e}  acg_thresh={sc_zp.acg_thresh:.3e}")
    print(f"fstar10={sc_zp.fstar_10:.4f} fstar7={sc_zp.fstar_7:.5f} "
          f"alpha_mini={sc_zp.alpha_star_mini}")
    mcrit_lw = hmf.lyman_werner_threshold(zp, j21, 0.0, ap)
    print(f"LW threshold @(J21={j21}): {mcrit_lw:.3e}")

    z_edge = np.abs(ladder.dzpp * ladder.dtdz) * np.asarray(cosmo.hubble(ladder.zpp)) / ap.t_STAR

    acg = np.zeros(n_r)
    mcg = np.zeros(n_r)
    ln_mmax = np.log(hmf.M_MAX_INTEGRAL)
    for i in range(n_r):
        zpp = float(ladder.zpp[i])
        sc = hmf.set_scaling_constants(zpp, inputs).without_esc()
        msfrd = hmf.nion_general(
            sigma_table, cosmo, hmf_i, zpp,
            float(np.log(ladder.m_min[i])), ln_mmax,
            sc.mturn_a_nofb, sc,
        )
        mturn_m = hmf.lyman_werner_threshold(zpp, j21, 0.0, ap)
        msfrd_mini = hmf.nion_general_mini(
            sigma_table, cosmo, hmf_i, zpp,
            float(np.log(ladder.m_min[i])), ln_mmax,
            max(mturn_m, sc.mturn_m_nofb), sc,
        )
        acg[i] = z_edge[i] * msfrd * sc_zp.fstar_10 * spec["starlya"][i]
        mcg[i] = z_edge[i] * msfrd_mini * sc_zp.fstar_7 * spec["starlya_mini"][i]
        if i < 6 or i % 8 == 0:
            print(f"R{i:02d} zpp={zpp:6.2f} msfrd={msfrd:.3e} msfrd_mini={msfrd_mini:.3e} "
                  f"p*={spec['starlya'][i]:.3e} p*_mini={spec['starlya_mini'][i]:.3e} "
                  f"m_min={ladder.m_min[i]:.2e}")
    print(f"\nsum ACG  = {acg.sum():.4e}")
    print(f"sum MCG  = {mcg.sum():.4e}")
    print(f"MCG/(ACG+MCG) = {mcg.sum() / (acg.sum() + mcg.sum()):.3f}")
    print(f"needed total boost vs ACG-only: x{1 + mcg.sum()/max(acg.sum(),1e-300):.2f}")


if __name__ == "__main__":
    main()
