"""Quantify the error of the constant-L_X fixed-grid X-ray against the
reference's metallicity-weighted conditional integral (xray_fraction_doublePL,
hmf.c:482-509) for the sampler_mini / multiple_scattering_mini conditions at
z=18.  Both sides are computed with the SAME conditional-MF measure
(integrate_cmf), differing only in the per-mass X-ray weight:

  w_ours(M) = M * [ l_x      * fstar(M) e^{-mta/M}
                  + l_x_mini * fstar_mini(M) e^{-mtm/M - M/thr} ]
  w_ref(M)  = same but with l_x -> Lx(Z(M)), l_x_mini -> Lx_mini(Z(M))
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

import py21cmfast_tpu as p21
from py21cmfast_tpu.cosmology.constants import physconst
from py21cmfast_tpu.models import hmf
from py21cmfast_tpu.models.ionization import _get_sigma_table

z = 18.0
inputs = p21.InputParameters(random_seed=1).evolve_input_structs(
    HII_DIM=50, DIM=150, BOX_LEN=100,
    SOURCE_MODEL="CHMF-SAMPLER", USE_MINI_HALOS=True, USE_TS_FLUCT=True,
    RECOMB_MODEL="inhomogeneous", R_BUBBLE_MAX=50.0, M_TURN=5.0,
)
so = inputs.simulation_options
cosmo = inputs.cosmology
sc = hmf.set_scaling_constants(z, inputs)
sc_sfrd = sc.without_esc()
sigma_table = _get_sigma_table(inputs)
growth = float(cosmo.dicke(z))
hmf_int = hmf.HMF_NAMES[inputs.matter_options.HMF]

cell_len = so.box_len / so.HII_DIM
m_cell = cosmo.rho_mean * cell_len**3
m_min = hmf.minimum_source_mass(z, inputs)
ln_mmin, ln_mcell = np.log(m_min), np.log(m_cell)
sigma_cell = float(sigma_table.sigma_of_lnm(ln_mcell))

print(f"m_min={m_min:.3e} m_cell={m_cell:.3e} "
      f"SAMPLER_MIN_MASS={so.SAMPLER_MIN_MASS:.3e}")
print(f"mturn_a_nofb={sc.mturn_a_nofb:.3e} mturn_m_nofb={sc.mturn_m_nofb:.3e} "
      f"acg_thresh={sc.acg_thresh:.3e} l_x={sc.l_x:.3e} l_x_mini={sc.l_x_mini:.3e}")


def stellar_pieces(ln_m, mturn_a, mturn_m):
    m = np.exp(ln_m)
    fstar = np.minimum(sc.fstar_10 * (m / 1e10) ** sc.alpha_star, 1.0) * np.exp(
        -mturn_a / m)
    fstar_mini = np.minimum(
        sc.fstar_7 * (m / 1e7) ** sc.alpha_star_mini, 1.0
    ) * np.exp(-mturn_m / m - m / sc.acg_thresh)
    stars = m * fstar * cosmo.OMb / cosmo.OMm
    stars_mini = m * fstar_mini * cosmo.OMb / cosmo.OMm
    return stars, stars_mini


def lx_of_z(stars_tot, sfr_tot_yr, lnorm):
    zsc = 10.0 ** (-0.056 * z + 0.064)
    m0 = 1.28825e10 * np.maximum(sfr_tot_yr, 1e-60) ** 0.56
    metal = 1.23 * (1.0 + (np.maximum(stars_tot, 1e-60) / m0) ** -2.1) ** -0.148 * zsc
    return lnorm * 2.0 / ((metal / 0.05) ** 0.64 + 1.0)


def weight(ln_m, mturn_a, mturn_m, metallicity: bool):
    stars, stars_mini = stellar_pieces(ln_m, mturn_a, mturn_m)
    sfr_yr = (stars + stars_mini) / (sc.t_star * sc.t_h) * physconst.s_per_yr
    if metallicity:
        lx = lx_of_z(stars + stars_mini, sfr_yr, sc.l_x)
        lx_mini = lx_of_z(stars + stars_mini, sfr_yr, sc.l_x_mini)
    else:
        lx, lx_mini = sc.l_x, sc.l_x_mini
    return lx * stars + lx_mini * stars_mini  # common SFR/time factors cancel


for tag, ln_hi in [("full cell range (L-INTEGRAL)", ln_mcell),
                   ("sub-sampler range", min(np.log(so.SAMPLER_MIN_MASS), ln_mcell))]:
    print(f"\n== {tag}: [{np.exp(ln_mmin):.2e}, {np.exp(ln_hi):.2e}] ==")
    deltas = np.array([-0.5, 0.0, 0.5, 1.0, 1.5])
    for l10_mtm in (np.log10(max(sc.mturn_m_nofb, 1.0)), 6.0, 7.0, 8.0):
        mturn_m = 10.0 ** l10_mtm
        mturn_a = sc.mturn_a_nofb
        ref = hmf.integrate_cmf(
            sigma_table, hmf_int, growth, ln_mmin, ln_hi, deltas, sigma_cell,
            weight_fn=lambda x: weight(x, mturn_a, mturn_m, True))
        ours = hmf.integrate_cmf(
            sigma_table, hmf_int, growth, ln_mmin, ln_hi, deltas, sigma_cell,
            weight_fn=lambda x: weight(x, mturn_a, mturn_m, False))
        # also the MCG-only share so we can see which population drives it
        mini_ref = hmf.integrate_cmf(
            sigma_table, hmf_int, growth, ln_mmin, ln_hi, deltas, sigma_cell,
            weight_fn=lambda x: weight(x, 1e30, mturn_m, True))
        mini_ours = hmf.integrate_cmf(
            sigma_table, hmf_int, growth, ln_mmin, ln_hi, deltas, sigma_cell,
            weight_fn=lambda x: weight(x, 1e30, mturn_m, False))
        r = ref / np.maximum(ours, 1e-60)
        rm = mini_ref / np.maximum(mini_ours, 1e-60)
        print(f" l10_mtm={l10_mtm:.1f}: tot ref/ours "
              + " ".join(f"{v:.3f}" for v in r)
              + " | MCG-only " + " ".join(f"{v:.3f}" for v in rm))
