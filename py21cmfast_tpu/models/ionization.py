"""Excursion-set ionization box.

TPU-native equivalent of reference IonisationBox.c:1344-1649.  The descending
radius ladder (find_HII_bubbles) becomes a `lax.scan` carrying the neutral
fraction / Gamma12 / MFP state; each step is: filter the k-space grids at R,
inverse-FFT, evaluate the conditional collapsed fraction (closed-form erfc for
CONST-ION-EFF; per-R density-table gather for the mass-dependent source models),
mean-fix via a `psum`-friendly grid mean, and apply the ionization criterion
with first-crossing bookkeeping (IonisationBox.c:1008-1201).

Host side precomputes (per snapshot): the radius ladder, sigma(M(R)), the global
Nion/Fcoll normalizations, and the per-R conditional-Nion tables over density
(reference setup_integration_tables:702-768, interp_tables.c:291-579).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..cosmology.constants import FRACT_FLOAT_ERR, TINY, physconst
from ..cosmology.recombination import RecombinationHistory
from ..inputs import InputParameters
from ..ops import fft, filters, grids
from ..ops.gridops import SINGLE, GridOps
from ..outputs import HaloBox, IonizedBox, PerturbedField, TsBox
from . import hmf

__all__ = ["compute_ionization_field", "setup_radii"]

HII_ROUND_ERR = 1e-5
N_DELTA_TABLE = 400
N_MTURN_TABLE = 24
CHEBY_DEG = 16          # degree of the log-Nion Chebyshev fits
CHEBY_X_SAFE = 0.98     # blend to the table edge above this (barrier sliver)


def _fit_log_cheby(tables, caps):
    """Fit log(Nion) per radius with Chebyshev polynomials.

    Table *gathers* dominate the ionization kernel on TPU (~0.36 s per shell
    at 256^3 vs ~0.03 s for an FFT — gathers run near-scalar); a degree-16
    Clenshaw evaluation is pure vector FMA.  The thin sliver within 1% of the
    collapse barrier (where log Nion turns sharply into the cap) blends
    linearly to the table's last node — cells there have fcoll*zeta >> 1 and
    ionize regardless.  Returns (coeffs[n_r, deg+1], log_edge[n_r], ok) where
    ok=False (caller falls back to the gather) if the interior residual
    exceeds 1%."""
    from numpy.polynomial import chebyshev as C

    n_r, n_d = tables.shape
    x = np.linspace(-1.0, 1.0, n_d)
    sel = x <= CHEBY_X_SAFE
    coeffs = np.zeros((n_r, CHEBY_DEG + 1))
    log_edge = np.zeros(n_r)
    ok = True
    for i in range(n_r):
        y = np.log(np.clip(tables[i], 1e-38, None))
        c = C.chebfit(x[sel], y[sel], CHEBY_DEG)
        coeffs[i] = c
        log_edge[i] = y[-1]
        resid = np.max(np.abs(np.expm1(C.chebval(x[sel], c) - y[sel])))
        if resid > 1e-2:
            ok = False
    return coeffs, log_edge, ok


def _clenshaw(coeffs, x, deg):
    """Vectorized Chebyshev evaluation; `coeffs` is a traced (deg+1,) vector,
    `x` a grid, `deg` static."""
    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    two_x = 2.0 * x
    for k in range(deg, 0, -1):
        b1, b2 = coeffs[k] + two_x * b1 - b2, b1
    return coeffs[0] + x * b1 - b2


@dataclasses.dataclass(frozen=True)
class RadiusLadder:
    """Filter radii (ascending) with per-R mass/sigma (IonisationBox.c:964-1006)."""

    R: np.ndarray
    M_max: np.ndarray
    sigma_max: np.ndarray

    @property
    def n(self):
        return len(self.R)


def setup_radii(inputs: InputParameters, m_min: float) -> RadiusLadder:
    so = inputs.simulation_options
    ap = inputs.astro_params
    ao = inputs.astro_options
    mo = inputs.matter_options
    cosmo = inputs.cosmology

    r_max = min(ap.r_bubble_max(ao), physconst.l_factor * so.box_len)
    pixel = so.box_len / so.HII_DIM
    cell_factor = physconst.l_factor
    if mo.source_model_uses_lagrangian_grids and not ao.IONISE_ENTIRE_SPHERE and pixel < 1:
        cell_factor = 1.0
    r_min = max(ap.R_BUBBLE_MIN, cell_factor * pixel)

    n_r = int(np.log(r_max / r_min) / np.log(ap.DELTA_R_HII_FACTOR) + 1)
    radii = []
    for i in range(n_r):
        r = r_min * ap.DELTA_R_HII_FACTOR**i
        if r > r_max - FRACT_FLOAT_ERR:
            radii.append(r_max)
            break
        radii.append(r)
    radii = np.array(radii)
    m_max = np.asarray(cosmo.RtoM(radii))
    # drop radii whose mass is below the minimum source mass (loop break, :1537)
    keep = m_max >= m_min
    radii, m_max = radii[keep], m_max[keep]
    sigma = cosmo.sigma_z0(m_max)
    return RadiusLadder(R=radii, M_max=m_max, sigma_max=sigma)


def _build_nion_tables(inputs, ladder, sigma_table, growth, m_min, sc):
    """Per-R conditional-Nion(delta) tables + caps for the E-INTEGRAL model.

    Returns (delta_lo[n_R], delta_hi[n_R], tables[n_R, N_DELTA]) where the cap
    behavior above 0.99*delta_crit is folded into the table's last node."""
    hmf_int = hmf.HMF_NAMES[inputs.matter_options.HMF]
    ln_m_min = np.log(m_min)
    n_r = ladder.n
    d_lo = np.full(n_r, -1.0 + 1e-6)
    d_hi = np.empty(n_r)
    tables = np.empty((n_r, N_DELTA_TABLE))
    eff_hmf = hmf_int if hmf_int in (hmf.HMF_PS, hmf.HMF_ST, hmf.HMF_DELOS) else hmf.HMF_PS
    for i in range(n_r):
        sig = ladder.sigma_max[i]
        dcrit = float(hmf.get_delta_crit(eff_hmf, sig, growth))
        d_hi[i] = dcrit  # table upper edge == barrier; cap applied beyond
        deltas = np.linspace(d_lo[i], d_hi[i] * hmf.MAX_DELTAC_FRAC, N_DELTA_TABLE)
        tables[i] = hmf.nion_conditional(
            sigma_table,
            hmf_int,
            growth,
            ln_m_min,
            float(np.log(ladder.M_max[i])),
            sig,
            deltas,
            sc.mturn_a_nofb,
            sc,
            method=inputs.astro_options.INTEGRATION_METHOD_ATOMIC,
        )
        d_hi[i] = dcrit * hmf.MAX_DELTAC_FRAC
    # cap value for delta > 0.99 delta_crit: one halo at the condition mass
    caps = np.array(
        [
            hmf.nion_weight(np.array([np.log(m)]), sc, sc.mturn_a_nofb)[0] / m
            for m in ladder.M_max
        ]
    )
    return d_lo, d_hi, tables, caps


@partial(
    jax.jit,
    static_argnames=(
        "shape",
        "box_lens",
        "hii_filter",
        "mass_dep",
        "use_ts",
        "use_recomb",
        "filter_recomb",
        "track_gamma",
        "last_filtered",
        "lagrangian",
        "use_exp_filter",
        "use_minihalos",
        "track_nion",
        "track_mfp",
        "use_cheby",
        "paint_spheres",
        "gops",
    ),
)
def _ionize_scan(
    delta,
    xe_box,
    rec_box,
    stars_box,
    wsfr_box,
    mfp_meandens,
    mturn_a_box,
    mturn_m_box,
    fcoll_tables_mini,
    fcoll_caps_mini,
    mt_bounds,
    mean_fcoll_mini,
    f_limit_mini,
    ion_eff_mini,
    gamma_prefactor_mini,
    prev_delta,
    prev_nion_stack,
    prev_nion_mini_stack,
    tables_prev,
    caps_prev,
    tables_prev_mini,
    caps_prev_mini,
    prev_dlo,
    prev_dhi,
    prev_pc_factor,
    r_values,
    sigma_r,
    table_dlo,
    table_dhi,
    fcoll_tables,
    fcoll_caps,
    cheby_coeffs,
    cheby_edge,
    mean_fcoll_global,
    f_limit,
    ion_eff,
    gamma_prefactor,
    sigma_min,
    growth,
    prev_z_reion,
    redshift,
    photoncons_factor,
    *,
    shape,
    box_lens,
    hii_filter,
    mass_dep,
    use_ts,
    use_recomb,
    filter_recomb,
    track_gamma,
    last_filtered,
    lagrangian,
    use_exp_filter,
    use_minihalos,
    track_nion,
    track_mfp=True,
    use_cheby,
    paint_spheres,
    gops: GridOps = SINGLE,
):
    """Descending-R excursion-set scan.  All per-R inputs are stacked arrays
    ordered largest R first (index 0 == largest).

    `lagrangian` selects the halo-model source path: fcoll comes from the
    filtered n_ion grid (pre-normalized by 1/(rho_crit OMb)) with the
    exponential-MFP filter (IonisationBox.c:615-621, 1054-1067)."""
    kmag = gops.kmag(shape, box_lens)
    delta_adj = delta * photoncons_factor
    d_k = gops.rfft3(delta_adj)
    xe_k = gops.rfft3(xe_box) if use_ts else None
    stars_k = gops.rfft3(stars_box) if lagrangian else None
    wsfr_k = gops.rfft3(wsfr_box) if (lagrangian and track_gamma) else None
    rec_k = gops.rfft3(rec_box) if filter_recomb else None
    source_filter = filters.EXP_MFP if use_exp_filter else hii_filter
    n_r = r_values.shape[0]
    cell_len_paint = np.float32(box_lens[0] / shape[0])

    if use_minihalos:
        mta_k = gops.rfft3(mturn_a_box)
        mtm_k = gops.rfft3(mturn_m_box)
    if track_nion:
        prev_adj = prev_delta * prev_pc_factor
        pd_k = gops.rfft3(prev_adj)

    def step(carry, xs):
        xh, gamma, mfp = carry
        if lagrangian and track_gamma:
            (r, sig_r, d_lo, d_hi, table, cap, idx) = xs
        elif lagrangian:
            (r, sig_r, d_lo, d_hi, table, cap, idx) = xs
        elif use_minihalos and track_nion:
            (r, sig_r, d_lo, d_hi, table, cap, idx,
             table_mini, cap_mini,
             p_table, p_cap, p_table_mini, p_cap_mini, p_dlo, p_dhi,
             pn_r, pnm_r) = xs
        elif use_minihalos:
            (r, sig_r, d_lo, d_hi, table, cap, idx,
             table_mini, cap_mini) = xs
        elif use_cheby:
            (r, sig_r, d_lo, d_hi, table, cap, idx,
             cheb_c, cheb_e) = xs
        else:
            (r, sig_r, d_lo, d_hi, table, cap, idx) = xs
        is_last = idx == n_r - 1

        # Filter each grid INSIDE the scan step: the filter multiply and the
        # consuming elementwise work fuse into one XLA computation per step, so
        # nothing ever materializes an n_r*N^3 stack in HBM (this is the
        # reference's MINIMIZE_MEMORY execution order, SpinTemperatureBox.c:
        # 1583-1609, adopted unconditionally — on TPU it is also *faster* than
        # hoisting, which round-trips every filtered grid through HBM).
        # On the last (smallest-R) step the reference uses the UNFILTERED grids
        # for every field (copy_filter_transform, IonisationBox.c:606-633).
        def _filtered(k_box, unfiltered, ftype, r_param=0.0):
            if last_filtered:
                return gops.irfft3(filters.filter_kbox(k_box, kmag, ftype, r, r_param), shape)
            return jax.lax.cond(
                is_last,
                lambda: unfiltered,
                lambda: gops.irfft3(
                    filters.filter_kbox(k_box, kmag, ftype, r, r_param), shape
                ),
            )

        delta_r = _filtered(d_k, delta_adj, hii_filter)
        xe_r = _filtered(xe_k, xe_box, hii_filter) if use_ts else 0.0
        if lagrangian:
            stars_r = _filtered(stars_k, stars_box, source_filter, mfp_meandens)
            if track_gamma:
                sfr_r = _filtered(wsfr_k, wsfr_box, source_filter, mfp_meandens)
        if use_minihalos:
            mta_r = _filtered(mta_k, mturn_a_box, hii_filter)
            mtm_r = _filtered(mtm_k, mturn_m_box, hii_filter)
            if track_nion:
                pd_r = _filtered(pd_k, prev_adj, hii_filter)

        delta_r = jnp.maximum(delta_r, -1.0 + FRACT_FLOAT_ERR)
        xe_r = jnp.clip(xe_r, 0.0, 0.999) if use_ts else 0.0

        if lagrangian:
            # halo model: filtered ionizing-photon grid -> photons per baryon
            # (no mean-fix: the sampled halos already realize the HMF)
            stars_r = jnp.maximum(stars_r, 0.0)
            fcoll = stars_r / (1.0 + delta_r)
            grid_mean = gops.mean(fcoll, shape)
            if track_gamma:
                sfr_r = jnp.maximum(sfr_r, 0.0)
        elif use_minihalos:
            # 2D (log10 Mturn, delta) bilinear gathers for ACG and MCG
            mt_lo, mt_hi = mt_bounds[0], mt_bounds[1]

            def gather2d(tab, mt_r, iD, fD):
                tm = (jnp.clip(mt_r, mt_lo, mt_hi) - mt_lo) / (mt_hi - mt_lo)
                tm = jnp.clip(tm * (N_MTURN_TABLE - 1), 0.0, N_MTURN_TABLE - 1.001)
                j0 = tm.astype(jnp.int32)
                fm = tm - j0
                v00 = tab[j0, iD]
                v01 = tab[j0, iD + 1]
                v10 = tab[j0 + 1, iD]
                v11 = tab[j0 + 1, iD + 1]
                return (v00 * (1 - fD) + v01 * fD) * (1 - fm) + (
                    v10 * (1 - fD) + v11 * fD
                ) * fm

            t = (delta_r - d_lo) / (d_hi - d_lo) * (N_DELTA_TABLE - 1)
            t = jnp.clip(t, 0.0, N_DELTA_TABLE - 1.001)
            i0 = t.astype(jnp.int32)
            fd = t - i0

            fcoll = gather2d(table, mta_r, i0, fd)
            fcoll = jnp.where(delta_r >= d_hi, cap, fcoll)
            fcoll = jnp.clip(fcoll, 1e-40, 1.0)
            fcoll_mini = gather2d(table_mini, mtm_r, i0, fd)
            fcoll_mini = jnp.where(delta_r >= d_hi, cap_mini, fcoll_mini)
            fcoll_mini = jnp.clip(fcoll_mini, 1e-40, 1.0)

            if track_nion:
                # Nion_smoothed(z, Mt) = Nion_prev + Nion(z, Mt)
                #                      - Nion(z_prev, Mt)   (IonisationBox.c:834)
                pd_r = jnp.maximum(pd_r, -1.0 + FRACT_FLOAT_ERR)
                tp = (pd_r - p_dlo) / (p_dhi - p_dlo) * (N_DELTA_TABLE - 1)
                tp = jnp.clip(tp, 0.0, N_DELTA_TABLE - 1.001)
                ip = tp.astype(jnp.int32)
                fp = tp - ip
                prev_f = gather2d(p_table, mta_r, ip, fp)
                prev_f = jnp.where(pd_r >= p_dhi, p_cap, prev_f)
                prev_f = jnp.clip(prev_f, 1e-40, 1.0)
                prev_fm = gather2d(p_table_mini, mtm_r, ip, fp)
                prev_fm = jnp.where(pd_r >= p_dhi, p_cap_mini, prev_fm)
                prev_fm = jnp.clip(prev_fm, 1e-40, 1.0)
                fcoll = jnp.clip(pn_r + fcoll - prev_f, 1e-40, 1.0)
                fcoll_mini = jnp.clip(pnm_r + fcoll_mini - prev_fm, 1e-40, 1.0)
        elif mass_dep and use_cheby:
            # log-Nion Chebyshev evaluation (vector FMA; see _fit_log_cheby)
            xch = jnp.clip(
                (delta_r - d_lo) / (d_hi - d_lo) * 2.0 - 1.0, -1.0, 1.0
            )
            flog = _clenshaw(cheb_c, jnp.minimum(xch, CHEBY_X_SAFE), CHEBY_DEG)
            blend = jnp.clip(
                (xch - CHEBY_X_SAFE) / (1.0 - CHEBY_X_SAFE), 0.0, 1.0
            )
            fcoll = jnp.exp(flog * (1.0 - blend) + cheb_e * blend)
            fcoll = jnp.where(delta_r >= d_hi, cap, fcoll)
            fcoll = jnp.clip(fcoll, 1e-40, 1.0)
        elif mass_dep:
            # gather from the per-R Nion(delta) table; cap above the barrier
            t = (delta_r - d_lo) / (d_hi - d_lo) * (N_DELTA_TABLE - 1)
            t = jnp.clip(t, 0.0, N_DELTA_TABLE - 1.001)
            i0 = t.astype(jnp.int32)
            frac = t - i0
            fcoll = table[i0] * (1 - frac) + table[i0 + 1] * frac
            fcoll = jnp.where(delta_r >= d_hi, cap, fcoll)
            fcoll = jnp.clip(fcoll, 1e-40, 1.0)
        else:
            # closed-form conditional EPS erfc (hmf.c:1221-1241) — no tables
            sigdiff = jnp.sqrt(
                jnp.maximum(sigma_min**2 - sig_r**2, 1e-30)
            )
            arg = (physconst.delta_c_sph - delta_r) / growth / (jnp.sqrt(2.0) * sigdiff)
            fcoll = jax.scipy.special.erfc(arg)

        if use_minihalos:
            nion_out, nion_mini_out = fcoll, fcoll_mini  # pre-mean-fix, stored
            # for the next snapshot's trapezoidal smoothing
        if not lagrangian:
            # mean fix: normalize the grid mean to the global unconditional value
            grid_mean = jnp.maximum(gops.mean(fcoll, shape), f_limit)
            fcoll = fcoll * (mean_fcoll_global / grid_mean)
            if mass_dep:
                fcoll = jnp.maximum(fcoll, f_limit)
        if use_minihalos:
            grid_mean_mini = jnp.maximum(gops.mean(fcoll_mini, shape), f_limit_mini)
            fcoll_mini = jnp.maximum(
                fcoll_mini * (mean_fcoll_mini / grid_mean_mini), f_limit_mini
            )
        else:
            fcoll_mini = 0.0

        # recombinations per baryon: CELL_RECOMB uses the previous snapshot's
        # cumulative N_rec unfiltered, otherwise N_rec is filtered at each R
        # like the other grids (IonisationBox.c:1084-1099)
        if filter_recomb:
            rec = jnp.maximum(_filtered(rec_k, rec_box, hii_filter), 0.0)
            rec = rec / (1.0 + delta_r)
        elif use_recomb:
            rec = rec_box / (1.0 + delta_r)
        else:
            rec = 0.0

        ionized = fcoll * ion_eff + fcoll_mini * ion_eff_mini > (1.0 - xe_r) * (
            1.0 + rec
        )
        newly = ionized & (xh > FRACT_FLOAT_ERR)
        if track_gamma:
            if lagrangian:
                gamma = jnp.where(
                    newly, r * gamma_prefactor / (1.0 + delta_r) * sfr_r, gamma
                )
            else:
                gamma = jnp.where(
                    newly,
                    r * (gamma_prefactor * fcoll + gamma_prefactor_mini * fcoll_mini),
                    gamma,
                )
            if track_mfp:
                # MINIMIZE_MEMORY drops the per-cell MFP (the reference frees
                # it too, IonisationBox.c:543,1137): skipping the update keeps
                # the carry a (1,1,1) placeholder instead of a full grid.
                mfp = jnp.where(newly, r, mfp)

        if paint_spheres:
            # IONISE_ENTIRE_SPHERE (reference update_in_sphere,
            # bubble_helper_progs.c:341): zero the whole R-sphere around each
            # newly flagged center.  TPU-native: convolve the flag field with
            # the normalized spherical tophat; any cell within R of a center
            # has (flags (*) K) >= 1/N_sphere_cells (FFT sidelobes are ~1e-2
            # of that, so the half threshold is safe).
            flags = (ionized & (xh > FRACT_FLOAT_ERR)).astype(jnp.float32)
            m_k = gops.rfft3(flags)
            painted = gops.irfft3(
                filters.filter_kbox(m_k, kmag, filters.TOPHAT, r), shape
            )
            n_sph = jnp.maximum(
                (4.0 * np.pi / 3.0) * (r / cell_len_paint) ** 3, 1.0
            )
            xh = jnp.where(painted > 0.5 / n_sph, 0.0, xh)
        else:
            xh = jnp.where(ionized, 0.0, xh)

        # partial ionization on the last (smallest) step (IonisationBox.c:1161-1196)
        def partial_ion(xh):
            res = 1.0 - fcoll * ion_eff - fcoll_mini * ion_eff_mini - xe_r
            res = jnp.clip(res, 0.0, 1.0)
            return jnp.where((~ionized) & (xh > TINY), res, xh)

        xh = jax.lax.cond(is_last, partial_ion, lambda x: x, xh)
        ys = (grid_mean, nion_out, nion_mini_out) if use_minihalos else grid_mean
        return (xh, gamma, mfp), ys

    # the neutral-fraction buffer starts at 1 (reference outputs.py:1525);
    # x-ray ionization enters via the criterion and the last-step partial branch
    xh0 = jnp.ones_like(delta)
    gamma0 = jnp.zeros_like(delta)
    mfp0 = jnp.zeros_like(delta) if track_mfp else jnp.zeros((1, 1, 1), jnp.float32)
    xs = [
        r_values,
        sigma_r,
        table_dlo,
        table_dhi,
        fcoll_tables,
        fcoll_caps,
        jnp.arange(n_r),
    ]
    if lagrangian:
        pass
    elif use_cheby:
        xs.extend([cheby_coeffs, cheby_edge])
    elif use_minihalos:
        xs.extend([fcoll_tables_mini, fcoll_caps_mini])
        if track_nion:
            xs.extend([
                tables_prev, caps_prev, tables_prev_mini, caps_prev_mini,
                prev_dlo, prev_dhi,
                prev_nion_stack, prev_nion_mini_stack,
            ])
    (xh, gamma, mfp), ys = jax.lax.scan(step, (xh0, gamma0, mfp0), tuple(xs))
    if use_minihalos:
        grid_means, nion_stack, nion_mini_stack = ys
    else:
        grid_means = ys
        nion_stack = jnp.zeros((1,), jnp.float32)
        nion_mini_stack = jnp.zeros((1,), jnp.float32)

    ionized_final = xh < TINY
    z_reion = jnp.where(
        ionized_final,
        jnp.where(prev_z_reion >= 0, prev_z_reion, redshift),
        jnp.where(prev_z_reion >= 0, prev_z_reion, -1.0),
    )
    return xh, gamma, mfp, z_reion, grid_means, nion_stack, nion_mini_stack


def compute_ionization_field(
    redshift: float,
    inputs: InputParameters,
    perturbed_field: PerturbedField,
    previous_ionized_box: IonizedBox | None = None,
    spin_temp: TsBox | None = None,
    halobox: HaloBox | None = None,
    previous_perturbed_field: PerturbedField | None = None,
    prev_redshift: float | None = None,
    photoncons_state=None,
    vcb_box=None,
    mesh=None,
) -> IonizedBox:
    so = inputs.simulation_options
    mo = inputs.matter_options
    ao = inputs.astro_options
    ap = inputs.astro_params
    cosmo = inputs.cosmology
    shape = so.lowres_shape
    box_lens = so.box_lens

    # photon non-conservation: shift the effective redshift and rescale the
    # density field by the growth ratio (IonisationBox.c:1389-1407)
    stored_redshift = redshift
    photoncons_factor = 1.0
    photoncons_fit = None
    if photoncons_state is not None:
        if hasattr(photoncons_state, "adjusted_redshift"):
            redshift = photoncons_state.adjusted_redshift(redshift)
            photoncons_factor = float(
                cosmo.dicke(redshift) / cosmo.dicke(stored_redshift)
            )
            # the fit-based variants flow through scaling constants instead
        else:
            photoncons_fit = photoncons_state
            photoncons_state = None

    growth = float(cosmo.dicke(redshift))
    sc = hmf.set_scaling_constants(redshift, inputs)
    if photoncons_fit is not None:
        # ALPHA/F-PHOTONCONS: replace the escape-fraction parameter by its
        # Q-dependent fit (reference get_fesc_fit, photoncons.c; applied to the
        # ACG scaling relations — MCG escape params are left as-is)
        v = photoncons_fit.value_at(stored_redshift)
        if photoncons_fit.kind == "fesc":
            fesc_new = float(np.clip(v, 1e-6, 1.0))
            sc = dataclasses.replace(
                sc, fesc_10=fesc_new,
                Mlim_Fesc=hmf.mass_limit_where_scaling_hits_unity(
                    sc.alpha_esc, fesc_new
                ),
            )
        else:
            sc = dataclasses.replace(
                sc, alpha_esc=float(v),
                Mlim_Fesc=hmf.mass_limit_where_scaling_hits_unity(
                    float(v), sc.fesc_10
                ),
            )
    m_min = hmf.minimum_source_mass(redshift, inputs, xray=False)
    sigma_min = float(cosmo.sigma_z0(m_min))
    sigma_table = _get_sigma_table(inputs)
    ln_m_min, ln_m_max = np.log(m_min), np.log(hmf.M_MAX_INTEGRAL)
    hmf_int = hmf.HMF_NAMES[mo.HMF]

    mass_dep = mo.source_model_is_mass_dependent
    lagrangian = mo.source_model_uses_lagrangian_grids and halobox is not None

    if mass_dep:
        ion_eff_gl = sc.pop2_ion * sc.fstar_10 * sc.fesc_10
    else:
        ion_eff_gl = ap.HII_EFF_FACTOR
    # halo grids already carry fesc/pop factors per halo (set_ionbox_constants:172-178)
    ion_eff = 1.0 if lagrangian else ion_eff_gl

    # --- global normalization (set_mean_fcoll, IonisationBox.c:468-529) -----
    if mass_dep:
        mean_fcoll = float(
            hmf.nion_general(
                sigma_table, cosmo, hmf_int, redshift, ln_m_min, ln_m_max,
                sc.mturn_a_nofb, sc,
            )
        )
        f_limit = float(
            hmf.nion_general(
                sigma_table, cosmo, hmf_int, so.Z_HEAT_MAX, ln_m_min, ln_m_max,
                sc.mturn_a_nofb, sc,
            )
        )
        log10_mturn_ave = np.log10(sc.mturn_a_nofb)
    else:
        mean_fcoll = float(
            hmf.fcoll_general(sigma_table, cosmo, hmf_int, redshift, ln_m_min, ln_m_max)
        )
        f_limit = FRACT_FLOAT_ERR
        log10_mturn_ave = np.log10(m_min)

    prev_z_reion = (
        previous_ionized_box.z_reion
        if previous_ionized_box is not None
        else jnp.full(shape, -1.0, jnp.float32)
    )

    # --- early exit: nothing ionizes (IonisationBox.c:1472-1475) ------------
    if mean_fcoll * ion_eff_gl < HII_ROUND_ERR:
        rec_hist = RecombinationHistory(cosmo)
        if spin_temp is not None:
            xh = 1.0 - spin_temp.xray_ionised_fraction
        else:
            xh = jnp.full(shape, 1.0 - float(rec_hist.x_e(redshift)), jnp.float32)
        return IonizedBox(
            redshift=np.float32(stored_redshift),
            neutral_fraction=xh,
            z_reion=prev_z_reion,
            ionisation_rate_G12=jnp.zeros(shape, jnp.float32),
            mean_f_coll=np.float32(mean_fcoll),
            mean_f_coll_MINI=np.float32(0.0),
            log10_Mturnover_ave=np.float32(log10_mturn_ave),
            log10_Mturnover_MINI_ave=np.float32(0.0),
        )

    # --- minihalo turnover-mass grids + 2D tables (calculate_mcrit_boxes:403) ---
    use_minihalos = ao.USE_MINI_HALOS and mass_dep and not lagrangian
    mturn_a_box = jnp.zeros(shape, jnp.float32)
    mturn_m_box = jnp.zeros(shape, jnp.float32)
    tables_mini = np.zeros((1, 1, 1))
    caps_mini = np.zeros(1)
    mt_bounds = np.array([0.0, 1.0])
    mean_fcoll_mini = 0.0
    f_limit_mini = 0.0
    ion_eff_mini = sc.pop3_ion * sc.fstar_7 * sc.fesc_7
    if use_minihalos:
        j21 = (
            spin_temp.J_21_LW
            if (spin_temp is not None and spin_temp.J_21_LW is not None)
            else jnp.zeros(shape, jnp.float32)
        )
        prev_g12 = (
            previous_ionized_box.ionisation_rate_G12
            if previous_ionized_box is not None
            else jnp.zeros(shape, jnp.float32)
        )
        prev_zre = prev_z_reion
        mturn_a_box, mturn_m_box = _mcrit_kernel(
            prev_g12, prev_zre, j21,
            jnp.float32(redshift),
            jnp.float32(sc.mturn_a_nofb),
            jnp.float32(sc.mturn_m_nofb),
            (jnp.asarray(vcb_box, jnp.float32) if vcb_box is not None
             else jnp.float32(sc.vcb_const)),
            jnp.float32(ap.A_LW), jnp.float32(ap.BETA_LW),
            jnp.float32(ap.A_VCB), jnp.float32(ap.BETA_VCB),
            jnp.float32(sc.v_cb_avg * np.sqrt(3.0 * np.pi / 8.0)),
        )
        log10_mturn_ave = float(jnp.mean(mturn_a_box))
        log10_mturn_m_ave = float(jnp.mean(mturn_m_box))
        mt_bounds = np.array([5.0, 10.0])  # LOG10_MTURN range (IonisationBox.c:34)

        # re-derive global normalizations at the average turnovers
        mean_fcoll = float(
            hmf.nion_general(sigma_table, cosmo, hmf_int, redshift, ln_m_min, ln_m_max,
                             10.0 ** log10_mturn_ave, sc)
        )
        f_limit = float(
            hmf.nion_general(sigma_table, cosmo, hmf_int, so.Z_HEAT_MAX, ln_m_min,
                             ln_m_max, 10.0 ** log10_mturn_ave, sc)
        )
        mean_fcoll_mini = float(
            hmf.nion_general_mini(sigma_table, cosmo, hmf_int, redshift, ln_m_min,
                                  ln_m_max, 10.0 ** log10_mturn_m_ave, sc)
        )
        f_limit_mini = float(
            hmf.nion_general_mini(sigma_table, cosmo, hmf_int, so.Z_HEAT_MAX, ln_m_min,
                                  ln_m_max, 10.0 ** log10_mturn_m_ave, sc)
        )

        # --- trapezoidal prev-snapshot integration (set_mean_fcoll:463-529 +
        # the per-R Nion smoothing, IonisationBox.c:834-880): MCG star
        # formation responds to the Mturn *history*, so Nion is carried as
        # Nion(z) = Nion_prev + Nion(z, Mt) - Nion(z_prev, Mt).
        prev_mfc = (
            float(previous_ionized_box.mean_f_coll)
            if previous_ionized_box is not None else 0.0
        )
        prev_mfc_mini = (
            float(previous_ionized_box.mean_f_coll_MINI)
            if previous_ionized_box is not None else 0.0
        )
        prev_z_adj = prev_redshift
        if photoncons_state is not None and prev_redshift is not None:
            prev_z_adj = photoncons_state.adjusted_redshift(prev_redshift)
        if prev_z_adj is not None and prev_mfc * ion_eff_gl > 1e-4:
            f_prev = float(
                hmf.nion_general(sigma_table, cosmo, hmf_int, prev_z_adj, ln_m_min,
                                 ln_m_max, 10.0 ** log10_mturn_ave, sc)
            )
            mean_fcoll = prev_mfc + mean_fcoll - f_prev
        if prev_z_adj is not None and prev_mfc_mini * ion_eff_mini > 1e-4:
            f_prev_mini = float(
                hmf.nion_general_mini(sigma_table, cosmo, hmf_int, prev_z_adj,
                                      ln_m_min, ln_m_max, 10.0 ** log10_mturn_m_ave, sc)
            )
            mean_fcoll_mini = prev_mfc_mini + mean_fcoll_mini - f_prev_mini

    track_nion = bool(
        use_minihalos
        and previous_ionized_box is not None
        and previous_perturbed_field is not None
        and prev_redshift is not None
        and previous_ionized_box.unnormalised_nion is not None
        and (prev_mfc * ion_eff_gl + prev_mfc_mini * ion_eff_mini) > 1e-4
    )

    ladder = setup_radii(inputs, m_min)
    n_r = ladder.n
    if track_nion and np.shape(previous_ionized_box.unnormalised_nion)[0] != n_r:
        track_nion = False  # radius ladder changed (m_min moved): restart tracking

    # --- per-R tables (mass-dep only) ---------------------------------------
    if use_minihalos:
        d_lo, d_hi, tables, caps, tables_mini, caps_mini = _build_nion_tables_mini(
            inputs, ladder, sigma_table, growth, m_min, sc,
            np.linspace(mt_bounds[0], mt_bounds[1], N_MTURN_TABLE),
        )
    elif mass_dep and not lagrangian:
        d_lo, d_hi, tables, caps = _build_nion_tables(
            inputs, ladder, sigma_table, growth, m_min, sc
        )
    else:
        d_lo = np.zeros(n_r)
        d_hi = np.ones(n_r)
        tables = np.zeros((n_r, N_DELTA_TABLE))
        caps = np.zeros(n_r)

    # Chebyshev fits of the per-R log-Nion tables (gathers are the dominant
    # device cost on TPU; Clenshaw is vector FMA)
    use_cheby = False
    cheby_coeffs = np.zeros((n_r, CHEBY_DEG + 1))
    cheby_edge = np.zeros(n_r)
    if mass_dep and not lagrangian and not use_minihalos:
        cheby_coeffs, cheby_edge, use_cheby = _fit_log_cheby(tables, caps)

    # previous-snapshot tables for the per-R trapezoidal Nion smoothing
    prev_dlo = np.zeros(n_r)
    prev_dhi = np.ones(n_r)
    tables_prev = np.zeros((1, 1, 1))
    caps_prev = np.zeros(1)
    tables_prev_mini = np.zeros((1, 1, 1))
    caps_prev_mini = np.zeros(1)
    prev_pc_factor = 1.0
    if track_nion:
        growth_prev = float(cosmo.dicke(prev_z_adj))
        (prev_dlo, prev_dhi, tables_prev, caps_prev,
         tables_prev_mini, caps_prev_mini) = _build_nion_tables_mini(
            inputs, ladder, sigma_table, growth_prev, m_min, sc,
            np.linspace(mt_bounds[0], mt_bounds[1], N_MTURN_TABLE),
        )
        if photoncons_state is not None:
            prev_pc_factor = float(
                cosmo.dicke(prev_z_adj) / cosmo.dicke(prev_redshift)
            )

    gamma_prefactor = (
        (1 + redshift) ** 2
        * physconst.cm_per_Mpc
        * physconst.sigma_HI
        * ap.ALPHA_UVB
        / (ap.ALPHA_UVB + 2.75)
        * cosmo.N_b0
        * ion_eff
        / 1.0e-12
    )
    if not lagrangian and mass_dep:
        gamma_prefactor /= sc.t_h * sc.t_star
    # Lagrangian: the 1/(rho_crit OMb) absorber factor is pre-applied to the
    # grids below, so gamma_prefactor stays as-is (IonisationBox.c:215-218)
    gamma_prefactor_mini = gamma_prefactor * (ion_eff_mini / max(ion_eff_gl, 1e-30))

    rho_b = cosmo.rho_mean * cosmo.OMb / cosmo.OMm  # Msun/Mpc^3
    if lagrangian:
        stars_box = halobox.n_ion / jnp.float32(rho_b)
        wsfr_box = (
            halobox.whalo_sfr / jnp.float32(rho_b)
            if halobox.whalo_sfr is not None
            else jnp.zeros(shape, jnp.float32)
        )
    else:
        stars_box = jnp.zeros(shape, jnp.float32)
        wsfr_box = jnp.zeros(shape, jnp.float32)
    mfp_meandens = 25.483241248322766 / cosmo.hlittle  # Songaila+10 fit (const)

    use_recomb = ao.uses_recombination
    if use_recomb and previous_ionized_box is not None and (
        previous_ionized_box.cumulative_recombinations is not None
    ):
        rec_box = previous_ionized_box.cumulative_recombinations
    else:
        rec_box = jnp.zeros(shape, jnp.float32)

    # descending order for the scan (largest R first)
    order = np.argsort(ladder.R)[::-1]
    if track_nion:
        prev_pf_density = previous_perturbed_field.density
        prev_nion_stack = previous_ionized_box.unnormalised_nion
        prev_nion_mini_stack = previous_ionized_box.unnormalised_nion_mini
    else:
        prev_pf_density = jnp.zeros((1, 1, 1), jnp.float32)
        prev_nion_stack = jnp.zeros((n_r, 1, 1, 1), jnp.float32)
        prev_nion_mini_stack = jnp.zeros((n_r, 1, 1, 1), jnp.float32)
    _scan_args = (
        perturbed_field.density,
        spin_temp.xray_ionised_fraction if spin_temp is not None else jnp.zeros(shape, jnp.float32),
        rec_box,
        stars_box,
        wsfr_box,
        jnp.float32(mfp_meandens),
        mturn_a_box,
        mturn_m_box,
        jnp.asarray(tables_mini[order] if use_minihalos else np.zeros((n_r, 2, 2)), jnp.float32),
        jnp.asarray(caps_mini[order] if use_minihalos else np.zeros(n_r), jnp.float32),
        jnp.asarray(mt_bounds, jnp.float32),
        jnp.float32(mean_fcoll_mini),
        jnp.float32(f_limit_mini),
        jnp.float32(ion_eff_mini),
        jnp.float32(gamma_prefactor_mini),
        prev_pf_density,
        prev_nion_stack,
        prev_nion_mini_stack,
        jnp.asarray(tables_prev[order] if track_nion else tables_prev, jnp.float32),
        jnp.asarray(caps_prev[order] if track_nion else caps_prev, jnp.float32),
        jnp.asarray(tables_prev_mini[order] if track_nion else tables_prev_mini, jnp.float32),
        jnp.asarray(caps_prev_mini[order] if track_nion else caps_prev_mini, jnp.float32),
        jnp.asarray(prev_dlo[order] if track_nion else prev_dlo, jnp.float32),
        jnp.asarray(prev_dhi[order] if track_nion else prev_dhi, jnp.float32),
        jnp.float32(prev_pc_factor),
        jnp.asarray(ladder.R[order], jnp.float32),
        jnp.asarray(ladder.sigma_max[order], jnp.float32),
        jnp.asarray(d_lo[order], jnp.float32),
        jnp.asarray(d_hi[order], jnp.float32),
        jnp.asarray(tables[order], jnp.float32),
        jnp.asarray(caps[order], jnp.float32),
        jnp.asarray(cheby_coeffs[order], jnp.float32),
        jnp.asarray(cheby_edge[order], jnp.float32),
        jnp.float32(mean_fcoll),
        jnp.float32(f_limit),
        jnp.float32(ion_eff),
        jnp.float32(gamma_prefactor),
        jnp.float32(sigma_min),
        jnp.float32(growth),
        prev_z_reion,
        jnp.float32(redshift),
        jnp.float32(photoncons_factor),
    )
    _scan_static = dict(
        shape=shape,
        box_lens=box_lens,
        hii_filter=ao.hii_filter_int,
        mass_dep=mass_dep,
        use_ts=spin_temp is not None,
        use_recomb=use_recomb,
        filter_recomb=use_recomb and not ao.CELL_RECOMB,
        track_gamma=True,
        last_filtered=False,
        lagrangian=lagrangian,
        use_exp_filter=lagrangian and ao.USE_EXP_FILTER,
        use_minihalos=use_minihalos,
        track_nion=track_nion,
        track_mfp=not mo.MINIMIZE_MEMORY,
        use_cheby=use_cheby,
        paint_spheres=ao.IONISE_ENTIRE_SPHERE,
    )
    if mesh is not None:
        from ..parallel.shardcall import sharded_kernel_call

        (xh, gamma, mfp, z_reion, _, nion_stack, nion_mini_stack
         ) = sharded_kernel_call(mesh, _ionize_scan, _scan_args, _scan_static, shape)
    else:
        (xh, gamma, mfp, z_reion, _, nion_stack, nion_mini_stack
         ) = _ionize_scan(*_scan_args, **_scan_static)

    # --- cumulative recombination update (set_recombination_rates:1258-1342) ---
    cumulative_rec = None
    if use_recomb:
        from . import recomb as recomb_module

        rt = recomb_module.get_recomb_tables(cosmo)
        if prev_redshift is None or prev_redshift < 1:
            dz = (1.0 + redshift) * (so.ZPRIME_STEP_FACTOR - 1.0)
        else:
            dz = prev_redshift - redshift
        fabs_dtdz = abs(float(cosmo.dtdz(redshift))) / 1e15
        if ao.RECOMB_MODEL == "INHOMOGENEOUS":
            cumulative_rec = _recomb_update(
                rec_box,
                perturbed_field.density,
                gamma,
                xh,
                jnp.asarray(rt.table, jnp.float32),
                jnp.float32(rt.ln_gamma[0]),
                jnp.float32(recomb_module.RR_DEL_LNGAMMA),
                jnp.float32(recomb_module.RR_DEL_Z),
                jnp.float32(redshift),
                jnp.float32(fabs_dtdz * dz),
            )
        else:  # homogeneous: single global rate broadcast
            global_xh = float(jnp.mean(xh))
            global_gamma = float(jnp.mean(gamma))
            d_nrec = (
                rt.evaluate(redshift, max(global_gamma, 1e-30))[0]
                * fabs_dtdz
                * dz
                * (1.0 - global_xh)
            )
            cumulative_rec = rec_box + jnp.float32(d_nrec)

    # kinetic temperature of the (partially) ionized IGM (reference
    # set_ionized_temperatures + ComputeFully/PartiallyIonizedTemperature,
    # IonisationBox.c:1203-1257, thermochem.c:31-64).  MINIMIZE_MEMORY drops
    # this optional field and the per-cell mean free path, matching the
    # reference's memory-model (IonisationBox.c:543,1137,1589).
    kinetic_temperature = None
    minimize_memory = inputs.matter_options.MINIMIZE_MEMORY
    if not minimize_memory:
        if spin_temp is not None:
            tk_neutral = spin_temp.kinetic_temp_neutral
        else:
            rec_hist = RecombinationHistory(cosmo)
            tk_neutral = jnp.float32(float(rec_hist.Tk(redshift))) * (
                1.0 + jnp.float32(float(rec_hist.cT_approx(redshift)))
                * perturbed_field.density
            )
        kinetic_temperature = _ionized_temperature(
            xh, z_reion, perturbed_field.density, tk_neutral,
            jnp.float32(ap.T_RE), jnp.float32(stored_redshift),
        )

    return IonizedBox(
        redshift=np.float32(stored_redshift),
        neutral_fraction=xh,
        z_reion=z_reion,
        ionisation_rate_G12=gamma,
        mean_f_coll=np.float32(mean_fcoll),
        mean_f_coll_MINI=np.float32(mean_fcoll_mini),
        log10_Mturnover_ave=np.float32(log10_mturn_ave),
        log10_Mturnover_MINI_ave=np.float32(
            log10_mturn_m_ave if use_minihalos else 0.0
        ),
        kinetic_temperature=kinetic_temperature,
        mean_free_path=None if minimize_memory else mfp,
        cumulative_recombinations=cumulative_rec,
        unnormalised_nion=nion_stack if use_minihalos else None,
        unnormalised_nion_mini=nion_mini_stack if use_minihalos else None,
    )


@jax.jit
def _ionized_temperature(xh, z_reion, density, tk_neutral, t_re, redshift):
    """Kinetic temperature incl. ionized regions (thermochem.c:31-64):
    fully ionized cells follow the McQuinn 2015 evolving-ionized-gas fit from
    their reionization redshift; partially ionized cells mix the neutral and
    reionization temperatures linearly in the residual neutral fraction."""
    delta = jnp.maximum(density, -1.0 + 1e-9)
    z_re = jnp.maximum(z_reion, redshift)
    delta_re = jnp.maximum(delta * (1.0 + redshift) / (1.0 + z_re), -1.0 + 1e-9)
    res = (
        ((1.0 + delta) / (1.0 + delta_re)) ** 1.1333
        * ((1.0 + redshift) / (1.0 + z_re)) ** 3.4
        * jnp.exp(((1.0 + redshift) / 7.1) ** 2.5 - ((1.0 + z_re) / 7.1) ** 2.5)
    )
    res = jnp.where(jnp.abs(redshift - z_re) < 1e-4, 1.0, res)
    res = res * t_re**1.7 + (1e4 * (1.0 + redshift) / 4.0) ** 1.7 * (1.0 + delta)
    t_full = jnp.maximum(res**0.5882, tk_neutral)
    t_partial = tk_neutral * xh + t_re * (1.0 - xh)
    fully = (z_reion > 0) & (xh < TINY)
    return jnp.where(fully, t_full, t_partial)


@jax.jit
def _recomb_update(
    rec_prev, density, gamma12, xh, rr_table, ln_g_min, dln_g, dz_tab, redshift, dtdz_dz
):
    """dN_rec = RR(z_eff, Gamma12) |dt/dz| dz (1 - xH), z_eff from the local
    density via (1+z_eff) = (1+z)(1+delta)^(1/3) (IonisationBox.c:1277-1335)."""
    z_eff = (1.0 + redshift) * jnp.cbrt(1.0 + density) - 1.0
    n_z, n_g = rr_table.shape
    z_idx = jnp.clip(jnp.round(z_eff / dz_tab).astype(jnp.int32), 0, n_z - 1)
    ln_g = jnp.log(jnp.maximum(gamma12, 1e-35))
    t = jnp.clip((ln_g - ln_g_min) / dln_g, 0.0, n_g - 1.001)
    i0 = t.astype(jnp.int32)
    frac = t - i0
    rr = rr_table[z_idx, i0] * (1 - frac) + rr_table[z_idx, i0 + 1] * frac
    rr = jnp.where(ln_g < ln_g_min, 0.0, rr)
    return rec_prev + rr * dtdz_dz * (1.0 - xh)


_sigma_table_cache = {}


def _get_sigma_table(inputs: InputParameters):
    key = inputs.matter_cosmo_hash
    if key not in _sigma_table_cache:
        _sigma_table_cache[key] = inputs.cosmology.build_sigma_table(
            m_min=1e2, m_max=1e20, n=600
        )
    return _sigma_table_cache[key]


@jax.jit
def _mcrit_kernel(prev_g12, prev_zre, j21, redshift, mturn_a_nofb, mturn_m_nofb,
                  vcb_const, a_lw, beta_lw, a_vcb, beta_vcb,
                  # plain float, NOT jnp: a jnp default would allocate a device
                  # array at import time (breaking jax.distributed.initialize)
                  sigmavcb=np.float32(27.0 * np.sqrt(3.0 * np.pi / 8.0))):
    """Per-cell feedback turnover masses (calculate_mcrit_boxes:403-460 +
    thermochem.c reionization_feedback / lyman_werner_threshold)."""
    # Sobacchi & Mesinger 2013 reionization feedback
    zfrac = jnp.clip(1.0 - ((1.0 + redshift) / (1.0 + prev_zre)) ** 2.0, 0.0, None)
    mcrit_re = 3e9 * (2.0 * jnp.maximum(prev_g12, 1e-20)) ** 0.17 * (
        (1.0 + redshift) / 10.0
    ) ** -2.1 * zfrac ** 2.5
    mcrit_re = jnp.where(prev_zre <= 1e-19, 1e-40, mcrit_re)

    # Lyman-Werner + streaming-velocity feedback (Visbal+15 / Schauer+20 form)
    mcrit_nolw = 3.314e7 * (1.0 + redshift) ** -1.5
    f_lw = 1.0 + a_lw * jnp.maximum(j21, 0.0) ** beta_lw
    f_vcb = (1.0 + a_vcb * vcb_const / sigmavcb) ** beta_vcb
    mcrit_lw = mcrit_nolw * f_lw * f_vcb

    mt_a = jnp.log10(jnp.maximum(mcrit_re, mturn_a_nofb))
    mt_m = jnp.log10(jnp.maximum(mcrit_re, jnp.maximum(mcrit_lw, mturn_m_nofb)))
    return mt_a, mt_m


def _build_nion_tables_mini(inputs, ladder, sigma_table, growth, m_min, sc, l10_mturns):
    """3D (R, Mturn, delta) conditional Nion tables for ACG + MCG."""
    hmf_int = hmf.HMF_NAMES[inputs.matter_options.HMF]
    ln_m_min = np.log(m_min)
    n_r = ladder.n
    n_mt = len(l10_mturns)
    d_lo = np.full(n_r, -1.0 + 1e-6)
    d_hi = np.empty(n_r)
    tables = np.empty((n_r, n_mt, N_DELTA_TABLE))
    tables_mini = np.empty((n_r, n_mt, N_DELTA_TABLE))
    eff_hmf = hmf_int if hmf_int in (hmf.HMF_PS, hmf.HMF_ST, hmf.HMF_DELOS) else hmf.HMF_PS
    for i in range(n_r):
        sig = ladder.sigma_max[i]
        dcrit = float(hmf.get_delta_crit(eff_hmf, sig, growth))
        d_hi[i] = dcrit * hmf.MAX_DELTAC_FRAC
        deltas = np.linspace(d_lo[i], d_hi[i], N_DELTA_TABLE)
        ln_mc = float(np.log(ladder.M_max[i]))
        tables[i] = hmf.build_nion_mturn_tables(
            sigma_table, hmf_int, growth, ln_m_min, ln_mc, sig, deltas, l10_mturns, sc,
            method=inputs.astro_options.INTEGRATION_METHOD_ATOMIC,
        )
        tables_mini[i] = hmf.build_nion_mturn_tables(
            sigma_table, hmf_int, growth, ln_m_min, ln_mc, sig, deltas, l10_mturns,
            sc, mini=True, method=inputs.astro_options.INTEGRATION_METHOD_MINI,
        )
    caps = np.array(
        [hmf.nion_weight(np.array([np.log(m)]), sc, sc.mturn_a_nofb)[0] / m
         for m in ladder.M_max]
    )
    caps_mini = np.array(
        [hmf.nion_weight_mini(np.array([np.log(m)]), sc, sc.mturn_m_nofb)[0] / m
         for m in ladder.M_max]
    )
    return d_lo, d_hi, tables, caps, tables_mini, caps_mini
