"""Photon non-conservation correction.

Equivalent of reference photoncons.c:75-822 + wrapper/photoncons.py:205-641.
The excursion-set method destroys photons (overlapping bubbles); the z-variant
correction measures the offset between the *analytic* filling factor Q(z)
(photon-conserving ODE) and the excursion-set *calibration* run, and shifts the
redshift fed to the ionization box by deltaz(xH) to compensate.

Flow (PHOTON_CONS_TYPE='Z-PHOTONCONS'):
  1. `analytic_Q_history`: dQ/dt = zeta dfcoll/dt - Q/t_rec   (InitialisePhotonCons)
  2. `calibrate_photon_cons`: a constant-zeta excursion-set run records the
     calibration xH(z) curve (calibrate_photon_cons, wrapper/photoncons.py:270)
  3. `PhotonConsState.deltaz(xH)`: smoothed z_cal(xH) - z_analytic(xH)
  4. the ionization driver asks `adjusted_redshift(z)` and scales densities by
     D(z_adj)/D(z)  (adjust_redshifts_for_photoncons, photoncons.c:668-822)
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..cosmology.constants import physconst
from ..inputs import InputParameters
from . import hmf

__all__ = ["PhotonConsState", "PhotonConsFit", "setup_photon_cons",
           "analytic_Q_history", "photoncons_alpha", "photoncons_fesc"]

_state_cache: dict = {}

# reference photoncons.c:66-72 (hard-coded there too)
PHOTONCONS_START = 0.995  # xH where the correction begins
PHOTONCONS_END = 0.3  # xH below which the exact correction is smoothed
PHOTONCONS_ASYMPTOTE = 0.01  # final xH of the extrapolated correction


@dataclasses.dataclass
class PhotonConsState:
    z_analytic: np.ndarray  # descending z grid
    Q_analytic: np.ndarray  # ionized filling factor
    z_cal: np.ndarray
    xh_cal: np.ndarray
    deltaz_xh: np.ndarray  # xH grid for the deltaz spline
    deltaz_vals: np.ndarray

    def adjusted_redshift(self, z: float) -> float:
        """z shifted DOWN by deltaz = |z_cal - z_analytic| at the analytic
        xH(z): the excursion set destroys photons, so the ionization box is
        evaluated at a later effective time to compensate
        (photoncons.c adjust_redshifts_for_photoncons:668-770)."""
        xh_ana = 1.0 - np.interp(z, self.z_analytic[::-1], self.Q_analytic[::-1])
        if xh_ana > PHOTONCONS_START:
            return float(z)  # ionization hasn't started: no shift (:695-699)
        dz = np.interp(xh_ana, self.deltaz_xh, self.deltaz_vals)
        return float(max(z - dz, 0.0))


def analytic_Q_history(inputs: InputParameters, z_min=None, z_max=None, n=512):
    """Photon-conserving analytic filling factor Q(z)
    (InitialisePhotonCons, photoncons.c:75-293).

    The reference integrates dQ/da = dNion/da with RecombPhotonCons=False
    (photoncons.c:66 — NO recombination sink by default), so the curve is
    simply the cumulative ionizing photons per baryon:
        Q(z) = ION_EFF * [Nion(z) - Nion(z_start ~ 32)].
    For mass-dependent source models the reference integrates Nion_General
    from M_TURN/50 with the M_TURN exponential turnover (:117-121, 169-172)
    — NOT the run's minimum_source_mass/atomic threshold; for CONST-ION-EFF
    it is HII_EFF_FACTOR * Fcoll over M > M(ION_Tvir_MIN)."""
    from .ionization import _get_sigma_table

    cosmo = inputs.cosmology
    ap = inputs.astro_params
    sigma_table = _get_sigma_table(inputs)
    hmf_int = hmf.HMF_NAMES[inputs.matter_options.HMF]
    z_start = 1.0 / 0.03 - 1.0  # a_start = 0.03 (photoncons.c:95)
    z_min = z_min if z_min is not None else float(ap.PHOTONCONS_CALIBRATION_END)
    z_max = z_max or z_start

    zs = np.linspace(z_max, z_min, n)  # descending
    ln_mmax = np.log(hmf.M_MAX_INTEGRAL)

    nion = np.empty(n)
    if inputs.matter_options.source_model_is_mass_dependent:
        m_turn = 10.0 ** float(ap.M_TURN)
        ln_mmin = np.log(m_turn / 50.0)
        for i, z in enumerate(zs):
            sc = hmf.set_scaling_constants(float(z), inputs)
            nion[i] = hmf.nion_general(
                sigma_table, cosmo, hmf_int, float(z), ln_mmin, ln_mmax,
                m_turn, sc,
            ) * sc.pop2_ion * sc.fstar_10 * sc.fesc_10
    else:
        mu = 1.22 if ap.ION_Tvir_MIN < 9.99999e3 else 0.6
        for i, z in enumerate(zs):
            m_min = float(cosmo.TtoM(float(z), ap.ION_Tvir_MIN, mu))
            nion[i] = (
                hmf.fcoll_general(
                    sigma_table, cosmo, hmf_int, float(z), np.log(m_min), ln_mmax
                )
                * ap.HII_EFF_FACTOR
            )

    # monotone cumulative photons; NOT clipped at 1 (the reference keeps
    # Q > 1 for photon-ratio diagnostics, photoncons.c:213-215)
    Q = np.maximum.accumulate(nion - nion[0])
    return zs, Q


def calibrate_photon_cons(inputs: InputParameters, z_ana=None, q_ana=None):
    """Run the calibration simulation and record global xH(z)
    (wrapper/photoncons.py calibrate_photon_cons:270-395).

    Matches the reference: SAME box size and seed as the run (the deltaz
    correction is a same-realization comparison), Ts/recombinations/minihalos
    off, sampler models swapped for their integral equivalent, and the
    reference's adaptive z scroll — start at 1.1 * z(Q = 1 - PhotonConsStart),
    step dz = 0.5 / 0.15 / 0.05 by neutral fraction, down to
    PHOTONCONS_CALIBRATION_END."""
    from ..drivers.single_field import compute_ionization_field, perturb_field
    from ..models.ics import compute_initial_conditions

    source_map = {
        "E-INTEGRAL": "E-INTEGRAL",
        "L-INTEGRAL": "L-INTEGRAL",
        "DEXM-ESF": "L-INTEGRAL",
        "CHMF-SAMPLER": "L-INTEGRAL",
        "CONST-ION-EFF": "CONST-ION-EFF",
    }
    cal_inputs = inputs.evolve_input_structs(
        SOURCE_MODEL=source_map[inputs.matter_options.SOURCE_MODEL],
        PHOTON_CONS_TYPE="NO-PHOTONCONS",
        USE_TS_FLUCT=False,
        RECOMB_MODEL="NONE",
        USE_MINI_HALOS=False,
        R_BUBBLE_MAX=(
            15.0 if inputs.astro_options.uses_recombination
            else inputs.astro_params.R_BUBBLE_MAX
        ),
    )

    # starting redshift: ComputeZstart_PhotonCons (photoncons.c:312-333)
    if z_ana is None or q_ana is None:
        z_ana, q_ana = analytic_Q_history(inputs)
    q_start = 1.0 - PHOTONCONS_START
    if q_ana.max() > q_start:
        # z_ana is descending, so Q(z) is ascending along the array
        z = 1.1 * float(np.interp(q_start, q_ana, z_ana))
    else:
        z = 20.0  # reionization never starts; arbitrary high start (:318-321)

    z_end = float(inputs.astro_params.PHOTONCONS_CALIBRATION_END)
    ics = compute_initial_conditions(cal_inputs)

    zs, xh = [], []
    ib = None
    prev_z = None
    while z > z_end:
        pf = perturb_field(z, cal_inputs, ics)
        ib = compute_ionization_field(
            z, cal_inputs, pf, previous_ionized_box=ib, prev_redshift=prev_z
        )
        mean_nf = float(np.mean(np.asarray(ib.neutral_fraction)))
        zs.append(z)
        xh.append(mean_nf)
        prev_z = z
        # adaptive step (wrapper/photoncons.py:361-368)
        if 0.3 < mean_nf <= 0.9:
            z -= 0.15
        elif 0.01 < mean_nf <= 0.3:
            z -= 0.05
        else:
            z -= 0.5
    return np.array(zs), np.array(xh)


@dataclasses.dataclass
class PhotonConsFit:
    """Linear-in-Q parameter fit for the simpler photon-conservation models
    (reference wrapper/photoncons.py photoncons_alpha:416 / photoncons_fesc:587):
    the ionization box runs with ALPHA_ESC (or F_ESC10) replaced by
    yint + slope * Q_analytic(z)."""

    kind: str  # "alpha" | "fesc"
    fit_yint: float
    fit_slope: float
    z_analytic: np.ndarray
    Q_analytic: np.ndarray
    q_targets: np.ndarray  # diagnostic: per-calibration-z parameter targets
    z_cal: np.ndarray

    def value_at(self, z: float) -> float:
        q = np.interp(z, self.z_analytic[::-1], self.Q_analytic[::-1])
        return float(self.fit_yint + self.fit_slope * min(q, 1.0))


_MAX_Q_FIT = 0.99
_MIN_Q_FIT = 0.2


def photoncons_fesc(inputs: InputParameters) -> PhotonConsFit:
    """F-PHOTONCONS: F_ESC10(z) = F_ESC10 * Q_analytic/Q_calibration, fitted
    linearly in Q (Nion is ~linear in fesc, so the analytic history with the
    boosted fesc overshoots by exactly the calibration deficit)."""
    z_ana, q_ana = analytic_Q_history(inputs)
    z_cal, xh_cal = calibrate_photon_cons(inputs)
    q_ref = np.minimum(np.interp(z_cal, z_ana[::-1], q_ana[::-1]), 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = q_ref / np.maximum(1.0 - xh_cal, 1e-10)
    targets = ratio * inputs.astro_params.fesc_10
    sel = np.isfinite(targets) & (q_ref > _MIN_Q_FIT) & (q_ref < _MAX_Q_FIT)
    if sel.sum() < 2:
        slope, yint = 0.0, inputs.astro_params.fesc_10
    else:
        slope, yint = np.polyfit(q_ref[sel], targets[sel], 1)
    return PhotonConsFit(
        kind="fesc", fit_yint=float(yint), fit_slope=float(slope),
        z_analytic=z_ana, Q_analytic=q_ana, q_targets=targets, z_cal=z_cal,
    )


def photoncons_alpha(inputs: InputParameters) -> PhotonConsFit:
    """ALPHA-PHOTONCONS: find, per calibration redshift, the ALPHA_ESC whose
    analytic history overshoots the fiducial by the calibration deficit
    (Q(alpha)/Q_ref == Q_ref/Q_cal), then fit ALPHA_ESC = yint + slope*Q
    (reference wrapper/photoncons.py:416-585, ratio criterion)."""
    ap = inputs.astro_params
    z_ana, q_ana = analytic_Q_history(inputs, n=256)
    z_cal, xh_cal = calibrate_photon_cons(inputs)
    q_ref = np.minimum(np.interp(z_cal, z_ana[::-1], q_ana[::-1]), 1.0)

    alphas = ap.ALPHA_ESC + np.linspace(-2.0, 1.0, 31)
    q_test = np.empty((alphas.size, z_cal.size))
    for i, a in enumerate(alphas):
        za, qa = analytic_Q_history(inputs.evolve_input_structs(ALPHA_ESC=a), n=256)
        q_test[i] = np.interp(z_cal, za[::-1], qa[::-1])

    with np.errstate(divide="ignore", invalid="ignore"):
        # Q(alpha)/Q_ref - Q_ref/Q_cal: root in alpha per redshift
        crit = q_test / q_ref[None, :] - (
            q_ref / np.maximum(1.0 - xh_cal, 1e-10)
        )[None, :]
    targets = np.full(z_cal.size, np.nan)
    last_alpha = ap.ALPHA_ESC
    for j in range(z_cal.size)[::-1]:
        sign_flip = np.where(np.diff(np.sign(crit[:, j])))[0]
        if sign_flip.size == 0:
            continue
        y0, y1 = crit[sign_flip, j], crit[sign_flip + 1, j]
        x0, x1 = alphas[sign_flip], alphas[sign_flip + 1]
        guesses = x0 - y0 * (x1 - x0) / (y1 - y0)
        targets[j] = guesses[np.argmin(np.abs(guesses - last_alpha))]
        last_alpha = targets[j]

    sel = np.isfinite(targets) & (q_ref > _MIN_Q_FIT) & (q_ref < _MAX_Q_FIT)
    if sel.sum() < 2:
        slope, yint = 0.0, ap.ALPHA_ESC
    else:
        slope, yint = np.polyfit(q_ref[sel], targets[sel], 1)
    return PhotonConsFit(
        kind="alpha", fit_yint=float(yint), fit_slope=float(slope),
        z_analytic=z_ana, Q_analytic=q_ana, q_targets=targets, z_cal=z_cal,
    )


def setup_photon_cons(inputs: InputParameters):
    """Build (and cache) the photon-conservation state for these inputs.
    Returns a PhotonConsState (Z-PHOTONCONS), a PhotonConsFit (ALPHA/F), or
    None."""
    pc_type = inputs.astro_options.PHOTON_CONS_TYPE
    if pc_type == "NO-PHOTONCONS":
        return None
    key = (inputs.full_hash, pc_type)
    if key in _state_cache:
        return _state_cache[key]
    if pc_type == "ALPHA-PHOTONCONS":
        state = photoncons_alpha(inputs)
        _state_cache[key] = state
        return state
    if pc_type == "F-PHOTONCONS":
        state = photoncons_fesc(inputs)
        _state_cache[key] = state
        return state

    z_ana, q_ana = analytic_Q_history(inputs)
    z_cal, xh_cal = calibrate_photon_cons(inputs, z_ana, q_ana)

    # deltaz(xH) = |z_cal(xH) - z_analytic(xH)| on the reference's NF grid
    # (determine_deltaz_for_photoncons, photoncons.c:335-470): 100 samples
    # between NF_sample_min and PhotonConsStart; below PhotonConsEnd the exact
    # correction is replaced by a smoothed extrapolation.
    cal_min = float(np.min(xh_cal))
    nf_min = PHOTONCONS_END if cal_min < PHOTONCONS_END else cal_min
    xh_grid = np.linspace(nf_min, PHOTONCONS_START, 100)
    xh_ana = 1.0 - q_ana
    # both curves: xh decreasing with decreasing z; build monotone interpolants
    z_of_xh_ana = np.interp(xh_grid, xh_ana[::-1], z_ana[::-1])
    order = np.argsort(xh_cal)
    z_of_xh_cal = np.interp(xh_grid, xh_cal[order], z_cal[order])
    deltaz = np.abs(z_of_xh_cal - z_of_xh_ana)
    # reference smoothing_width=35 samples (:352)
    w = 35
    kernel = np.ones(w) / w
    deltaz_s = np.convolve(np.pad(deltaz, w // 2, mode="edge"), kernel, mode="valid")
    deltaz_s = deltaz_s[: len(xh_grid)]
    if cal_min < PHOTONCONS_END:
        # linear extrapolation of the correction below the threshold, ending
        # at PhotonConsAsymptoteTo (:370-395): gradient from the first
        # delta_NF=0.025 of the exact region
        sel = xh_grid <= nf_min + 0.025
        if sel.sum() >= 2:
            grad = np.polyfit(xh_grid[sel], deltaz_s[sel], 1)[0]
        else:
            grad = 0.0
        nf_lo = max(min(cal_min, nf_min), PHOTONCONS_ASYMPTOTE)
        n_ext = max(int(99 * (nf_min - nf_lo) / (PHOTONCONS_START - nf_min)), 1)
        xh_ext = np.linspace(nf_lo, nf_min, n_ext, endpoint=False)
        dz_ext = deltaz_s[0] + grad * (xh_ext - xh_grid[0])
        xh_grid = np.concatenate([xh_ext, xh_grid])
        deltaz_s = np.concatenate([np.maximum(dz_ext, 0.0), deltaz_s])

    state = PhotonConsState(
        z_analytic=z_ana,
        Q_analytic=q_ana,
        z_cal=z_cal,
        xh_cal=xh_cal,
        deltaz_xh=xh_grid,
        deltaz_vals=deltaz_s,
    )
    _state_cache[key] = state
    return state
