"""f64 check of the global ACG/MCG SFRD integrals vs our hmf module.

Implements the reference's exact math (hmf.c dNdlnM_st:301-313,
nion_fraction:462-480 + MINI, Nion_General:955-991, ST constants hmf.h:58-60)
with scipy QUADPACK in float64, for the global_evolution.h5 gold's astro
parameters, and compares hmf.nion_general / nion_general_mini at z = 8..40.
"""
import sys
import numpy as np
from scipy import integrate

sys.path.insert(0, "/root/repo")
import py21cmfast_tpu as p21
from py21cmfast_tpu.models import hmf
from py21cmfast_tpu.models.ionization import _get_sigma_table

inp = p21.InputParameters(random_seed=1).evolve_input_structs(
    HMF="ST", POWER_SPECTRUM="EH", SOURCE_MODEL="E-INTEGRAL",
    USE_MINI_HALOS=True, USE_TS_FLUCT=True, RECOMB_MODEL="inhomogeneous",
    CELL_RECOMB=True, M_TURN=5.0, A_s=2.105e-9,
    OMm=0.30964144154550644, OMb=0.04897468161869667, hlittle=0.6766,
    POWER_INDEX=0.9665, F_STAR10=-1.25, ALPHA_STAR=0.5, F_ESC10=-1.35,
    F_STAR7_MINI=-2.5, F_ESC7_MINI=-1.35, ALPHA_ESC=-0.3,
    USE_UPPER_STELLAR_TURNOVER=False,
)
cosmo = inp.cosmology
st = _get_sigma_table(inp)
SHETH_a, SHETH_p, SHETH_A = 0.73, 0.175, 0.353
delta_c = 1.68647

sig_cache = {}
def sigma(lnM):
    if lnM not in sig_cache:
        M = np.exp(lnM)
        sig_cache[lnM] = (
            float(cosmo.sigma_z0(np.array([M]))[0]),
            float(cosmo.dsigmasqdm_z0(np.array([M]))[0]),
        )
    return sig_cache[lnM]


def dNdlnM_st(growthf, lnM):
    s0, ds0 = sigma(lnM)
    s = s0 * growthf
    dsdm = ds0 * (growthf * growthf / (2.0 * s))
    nuhat = np.sqrt(SHETH_a) * delta_c / s
    return (
        -(dsdm / s) * np.sqrt(2.0 / np.pi) * SHETH_A
        * (1 + nuhat ** (-2 * SHETH_p)) * nuhat * np.exp(-nuhat * nuhat / 2)
    )


def pl_limit(lnM, ln_norm, alpha, ln_limit):
    if (alpha > 0 and lnM > ln_limit) or (alpha < 0 and lnM < ln_limit):
        return -ln_norm
    return alpha * (lnM - 10 * np.log(10.0))


def mass_limit_bisection(alpha, norm):
    # Mass where norm*(M/1e10)^alpha == 1 (reference Mass_limit_bisection)
    if alpha == 0:
        return 0.0
    return np.log(1e10 * (1.0 / norm) ** (1.0 / alpha))


def nion_integrand(lnM, growthf, mturn, fstar10, alpha_star, fesc10, alpha_esc,
                   mlim_star, mlim_esc):
    Fstar = np.log(fstar10) + pl_limit(lnM, np.log(fstar10), alpha_star, mlim_star)
    Fesc = np.log(fesc10) + pl_limit(lnM, np.log(fesc10), alpha_esc, mlim_esc)
    frac = np.exp(Fstar + Fesc - mturn / np.exp(lnM) + lnM)
    return frac * dNdlnM_st(growthf, lnM)


def nion_integrand_mini(lnM, growthf, mturn_m, mturn_up, fstar7, alpha_star,
                        fesc7, alpha_esc, mlim_star, mlim_esc):
    Fstar = np.log(fstar7) + pl_limit(lnM, np.log(fstar7), alpha_star, mlim_star)
    Fesc = np.log(fesc7) + pl_limit(lnM, np.log(fesc7), alpha_esc, mlim_esc)
    M = np.exp(lnM)
    frac = np.exp(Fstar + Fesc + lnM) * np.exp(-mturn_m / M - M / mturn_up)
    return frac * dNdlnM_st(growthf, lnM)


ap = inp.astro_params
fstar10, fesc10 = ap.fstar_10, ap.fesc_10
fstar7, fesc7 = ap.fstar_7, ap.fesc_7
alpha_star, alpha_esc = ap.ALPHA_STAR, ap.ALPHA_ESC
mlim_star = mass_limit_bisection(alpha_star, fstar10)
mlim_esc = mass_limit_bisection(alpha_esc, fesc10)
mlim_star7 = mass_limit_bisection(0.0, fstar7)  # ALPHA_STAR_MINI = 0
mlim_esc7 = mass_limit_bisection(alpha_esc, fesc7)

ln_mmin, ln_mmax = np.log(1e5), np.log(1e16)
print(f"{'z':>5} {'sector':>6} {'ref_f64':>12} {'ours':>12} {'ratio':>8}")
for z in (8.0, 12.0, 16.0, 20.0, 25.0, 30.0, 35.0, 40.0):
    D = float(cosmo.dicke(z))
    sc = hmf.set_scaling_constants(z, inp).without_esc()
    mturn_a = sc.mturn_a_nofb
    ref, _ = integrate.quad(
        nion_integrand, ln_mmin, ln_mmax,
        args=(D, mturn_a, fstar10, alpha_star, 1.0, 0.0, mlim_star, 0.0),
        limit=400,
    )
    rho_mean = cosmo.OMm * cosmo.rho_crit  # Msun/Mpc^3
    ref_frac = ref / (1e10 * rho_mean / 1e10)  # normalize below to match ours
    ours = float(hmf.nion_general(st, cosmo, hmf.HMF_ST, z, ln_mmin, ln_mmax,
                                  mturn_a, sc))
    # our convention may differ by a constant; report both raw values
    print(f"{z:5.1f} {'ACG':>6} {ref:12.4e} {ours:12.4e} {ours/ref:8.4f}")

    mturn_m = float(hmf.lyman_werner_threshold(z, 0.0, 0.0, ap))
    ref_m, _ = integrate.quad(
        nion_integrand_mini, ln_mmin, ln_mmax,
        args=(D, mturn_m, sc.acg_thresh, fstar7, 0.0, 1.0, 0.0, mlim_star7, 0.0),
        limit=400,
    )
    ours_m = float(hmf.nion_general_mini(st, cosmo, hmf.HMF_ST, z, ln_mmin,
                                         ln_mmax, mturn_m, sc))
    print(f"{z:5.1f} {'MCG':>6} {ref_m:12.4e} {ours_m:12.4e} {ours_m/max(ref_m,1e-300):8.4f}")
