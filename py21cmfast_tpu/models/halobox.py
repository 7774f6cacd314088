"""HaloBox: paint discrete halo properties onto the HII grid.

TPU-native equivalent of reference HaloBox.c:563-880: per-halo galaxy
properties from the stochastic scaling relations (scaling_relations.c:326-501)
are scatter-added (NGP, like the reference's pos_to_index deposit) onto the
lowres grid as comoving densities [Msun / Mpc^3] (and 1e38 erg/s/Mpc^3 for
X-rays).

Round-1 scope notes:
 * The sub-resolution source contribution (set_fixed_grids:297-436, halos
   below SAMPLER_MIN_MASS) is included via `compute_fixed_halo_grid(...,
   m_max=SAMPLER_MIN_MASS)` but conditioned at Lagrangian cell positions
   (not velocity-displaced as in move_grid_galprops).
 * Mean-fixing to the global HMF (mean_fix_grids:207-244) applies only to
   HMFs without a conditional form (Watson/Reed/Yung) — not yet wired.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..cosmology.constants import physconst
from ..inputs import InputParameters
from ..outputs import HaloBox, PerturbedHaloCatalog
from . import hmf

__all__ = ["compute_halo_grid", "halo_properties"]


@partial(jax.jit, static_argnames=("use_upper",))
def _halo_props_kernel(
    masses, star_rng, sfr_rng, xray_rng, consts, *, use_upper
):
    """Vectorized scaling relations for every halo (scaling_relations.c:326-501).

    Returns (stellar, sfr, n_ion_weight, wsfr, xray38)."""
    (fstar_10, alpha_star, sigma_star, alpha_upper, pivot_upper, upper_ratio,
     t_star, t_h, sigma_sfr_lim, sigma_sfr_idx, l_x, sigma_xray, fesc_10,
     alpha_esc, pop2_ion, mturn_a, baryon_ratio, redshift, median_flag) = consts

    m = masses
    # stellar fraction: double power law with upper turnover (or single PL)
    if use_upper:
        mu_fstar = fstar_10 * upper_ratio / (
            (m / pivot_upper) ** (-alpha_star) + (m / pivot_upper) ** (-alpha_upper)
        )
    else:
        mu_fstar = fstar_10 * (m / 1e10) ** alpha_star
    stoc_adj = jnp.where(median_flag > 0, 0.0, sigma_star * sigma_star / 2.0)
    f_sample = mu_fstar * jnp.exp(-mturn_a / m + star_rng * sigma_star - stoc_adj)
    f_sample = jnp.minimum(f_sample, 1.0)
    stellar = f_sample * m * baryon_ratio

    # SFR with stellar-mass-dependent lognormal scatter
    sigma_sfr = jnp.maximum(
        sigma_sfr_idx * jnp.log10(jnp.maximum(stellar, 1e-30) / 1e10) + sigma_sfr_lim,
        sigma_sfr_lim,
    )
    sigma_sfr = jnp.where(sigma_sfr_lim > 0, sigma_sfr, 0.0)
    mu_sfr = stellar / (t_star * t_h)
    stoc_adj_sfr = jnp.where(median_flag > 0, 0.0, sigma_sfr * sigma_sfr / 2.0)
    sfr = mu_sfr * jnp.exp(sfr_rng * sigma_sfr - stoc_adj_sfr)  # Msun/s

    # metallicity (Eq. 14-15 of 2504.17254) for LX(Z)
    z_scaling = 10.0 ** (-0.056 * redshift + 0.064)
    m0 = 1.28825e10 * jnp.maximum(sfr * physconst.s_per_yr, 1e-30) ** 0.56
    stellar_term = (1.0 + (jnp.maximum(stellar, 1e-30) / m0) ** -2.1) ** -0.148
    metallicity = 1.23 * stellar_term * z_scaling

    # X-ray: L_X/SFR double power-law in Z (lx_on_sfr_doublePL)
    lx_on_sfr = l_x * 1.0 / ((metallicity / 0.05) ** 0.64 + 1.0) * 2.0
    mu_x = lx_on_sfr * sfr * physconst.s_per_yr
    stoc_adj_x = jnp.where(median_flag > 0, 0.0, sigma_xray * sigma_xray / 2.0)
    xray38 = mu_x * jnp.exp(xray_rng * sigma_xray - stoc_adj_x)  # 1e38 erg/s

    # escape fraction per halo
    fesc = jnp.minimum(fesc_10 * (m / 1e10) ** alpha_esc, 1.0)
    n_ion_w = stellar * fesc * pop2_ion
    wsfr = sfr * fesc * pop2_ion
    return stellar, sfr, n_ion_w, wsfr, xray38


@partial(jax.jit, static_argnames=("shape",))
def _deposit(masses, pos, props, cell_lens, *, shape):
    """NGP scatter of per-halo properties onto the grid."""
    nx, ny, nz = shape
    valid = masses > 0
    ix = (pos[:, 0] / cell_lens[0]).astype(jnp.int32) % nx
    iy = (pos[:, 1] / cell_lens[1]).astype(jnp.int32) % ny
    iz = (pos[:, 2] / cell_lens[2]).astype(jnp.int32) % nz
    idx = (ix * ny + iy) * nz + iz
    out = []
    for p in props:
        g = jnp.zeros(nx * ny * nz, jnp.float32)
        g = g.at[idx].add(jnp.where(valid, p, 0.0))
        out.append(g.reshape(shape))
    return out


def compute_halo_grid(
    redshift: float,
    inputs: InputParameters,
    pt_halos: PerturbedHaloCatalog,
    previous_spin_temp=None,
    previous_ionized_box=None,
    lagrangian_delta=None,
) -> HaloBox:
    """Grid the halo catalog into source fields (reference ComputeHaloBox:563).

    When `lagrangian_delta` (the lowres IC density) is given, the expectation
    of sources below SAMPLER_MIN_MASS is added from the deterministic
    conditional integrals (reference HaloBox.c:626-640 sub-resolution
    component) — without it, high-z SFR/X-ray output is truncated at the
    sampler's mass floor.  Round-1 approximation: the sub-grid component is
    conditioned on (and placed at) the Lagrangian cell, not displaced with the
    velocity field (reference move_grid_galprops); this preserves means and
    large-scale power but softens small-scale source-density cross power."""
    so = inputs.simulation_options
    sc = hmf.set_scaling_constants(redshift, inputs)
    ao = inputs.astro_options
    cosmo = inputs.cosmology
    shape = so.lowres_shape
    cell_vol = (so.box_len / so.HII_DIM) ** 3 * so.NON_CUBIC_FACTOR ** 0  # Mpc^3

    consts = tuple(
        jnp.float32(v)
        for v in (
            sc.fstar_10, sc.alpha_star, sc.sigma_star, sc.alpha_upper, sc.pivot_upper,
            sc.upper_pivot_ratio, sc.t_star, sc.t_h, sc.sigma_sfr_lim, sc.sigma_sfr_idx,
            sc.l_x, sc.sigma_xray, sc.fesc_10, sc.alpha_esc, sc.pop2_ion,
            sc.mturn_a_nofb, cosmo.OMb / cosmo.OMm, redshift,
            1.0 if ao.HALO_SCALING_RELATIONS_MEDIAN else 0.0,
        )
    )
    stellar, sfr, n_ion_w, wsfr, xray38 = _halo_props_kernel(
        pt_halos.halo_masses,
        pt_halos.star_rng,
        pt_halos.sfr_rng,
        pt_halos.xray_rng,
        consts,
        use_upper=ao.USE_UPPER_STELLAR_TURNOVER and sc.alpha_star > sc.alpha_upper,
    )
    cell_lens = jnp.asarray(
        [so.box_len / so.HII_DIM] * 3, jnp.float32
    )
    n_ion_g, sfr_g, wsfr_g, xray_g, stars_g, count_g = _deposit(
        pt_halos.halo_masses,
        pt_halos.halo_coords,
        (n_ion_w, sfr, wsfr, xray38, stellar, jnp.ones_like(stellar)),
        cell_lens,
        shape=shape,
    )
    inv_vol = jnp.float32(1.0 / cell_vol)
    box = HaloBox(
        redshift=np.float32(redshift),
        n_ion=n_ion_g * inv_vol,
        halo_sfr=sfr_g * inv_vol,
        whalo_sfr=wsfr_g * inv_vol,
        halo_xray=xray_g * inv_vol,
        halo_stars=stars_g * inv_vol,
        count=count_g,
        log10_Mcrit_ACG_ave=np.float32(np.log10(sc.mturn_a_nofb)),
        log10_Mcrit_MCG_ave=np.float32(0.0),
    )
    if lagrangian_delta is not None:
        sub = compute_fixed_halo_grid(
            redshift, inputs, lagrangian_delta, m_max=so.SAMPLER_MIN_MASS
        )
        if sub is not None:
            import dataclasses

            box = dataclasses.replace(
                box,
                n_ion=box.n_ion + sub.n_ion,
                halo_sfr=box.halo_sfr + sub.halo_sfr,
                whalo_sfr=box.whalo_sfr + sub.whalo_sfr,
                halo_xray=box.halo_xray + sub.halo_xray,
                halo_stars=box.halo_stars + sub.halo_stars,
            )
    return box


def halo_properties(redshift, inputs, catalog):
    """Convenience: per-halo property arrays (reference convert_halo_props:781)."""
    sc = hmf.set_scaling_constants(redshift, inputs)
    ao = inputs.astro_options
    cosmo = inputs.cosmology
    consts = tuple(
        jnp.float32(v)
        for v in (
            sc.fstar_10, sc.alpha_star, sc.sigma_star, sc.alpha_upper, sc.pivot_upper,
            sc.upper_pivot_ratio, sc.t_star, sc.t_h, sc.sigma_sfr_lim, sc.sigma_sfr_idx,
            sc.l_x, sc.sigma_xray, sc.fesc_10, sc.alpha_esc, sc.pop2_ion,
            sc.mturn_a_nofb, cosmo.OMb / cosmo.OMm, redshift,
            1.0 if ao.HALO_SCALING_RELATIONS_MEDIAN else 0.0,
        )
    )
    return _halo_props_kernel(
        catalog.halo_masses, catalog.star_rng, catalog.sfr_rng, catalog.xray_rng,
        consts, use_upper=ao.USE_UPPER_STELLAR_TURNOVER and sc.alpha_star > sc.alpha_upper,
    )


def compute_fixed_halo_grid(
    redshift: float,
    inputs: InputParameters,
    lagrangian_delta,  # lowres IC density (z=0 normalization)
    m_max: float | None = None,
) -> HaloBox | None:
    """Deterministic (expectation-value) source grids
    (reference set_fixed_grids:297-436): per-cell conditional Nion/SFR
    integrals evaluated via a delta-table gather.

    Used two ways, as in the reference (HaloBox.c:624-640):
     * SOURCE_MODEL='L-INTEGRAL': full mass range (m_max=None).
     * sub-resolution component of the halo-sampler source model:
       m_max=SAMPLER_MIN_MASS restricts the integral to halos too small for
       the stochastic sampler; the result is *added* to the sampled deposit.

    Returns None when the mass range is empty (m_max <= minimum source mass)."""
    import jax

    so = inputs.simulation_options
    cosmo = inputs.cosmology
    sc = hmf.set_scaling_constants(redshift, inputs)
    sc_sfrd = sc.without_esc()
    from .ionization import _get_sigma_table

    sigma_table = _get_sigma_table(inputs)
    growth = float(cosmo.dicke(redshift))
    hmf_int = hmf.HMF_NAMES[inputs.matter_options.HMF]

    cell_len = so.box_len / so.HII_DIM
    m_cell = cosmo.rho_mean * cell_len**3
    m_min = hmf.minimum_source_mass(redshift, inputs)
    ln_mmin, ln_mcell = np.log(m_min), np.log(m_cell)
    ln_hi = ln_mcell if m_max is None else min(np.log(m_max), ln_mcell)
    if ln_mmin >= ln_hi:
        return None
    sigma_cell = float(sigma_table.sigma_of_lnm(ln_mcell))
    eff_hmf = hmf_int if hmf_int in (0, 1, 4) else 0
    dcrit = float(hmf.get_delta_crit(eff_hmf, sigma_cell, growth))
    d_lo, d_hi = -1.0 + 1e-6, dcrit * hmf.MAX_DELTAC_FRAC
    deltas = np.linspace(d_lo, d_hi, 400)

    nion_tab = hmf.nion_conditional(
        sigma_table, hmf_int, growth, ln_mmin, ln_mcell, sigma_cell, deltas,
        sc.mturn_a_nofb, sc, ln_hi=ln_hi,
    )
    sfrd_tab = hmf.nion_conditional(
        sigma_table, hmf_int, growth, ln_mmin, ln_mcell, sigma_cell, deltas,
        sc_sfrd.mturn_a_nofb, sc_sfrd, ln_hi=ln_hi,
    )

    prefactor_nion = cosmo.rho_crit * cosmo.OMb * sc.fstar_10 * sc.fesc_10 * sc.pop2_ion
    prefactor_stars = cosmo.rho_crit * cosmo.OMb * sc.fstar_10
    prefactor_sfr = prefactor_stars / sc.t_star / sc.t_h
    prefactor_wsfr = prefactor_sfr * sc.fesc_10 * sc.pop2_ion
    prefactor_xray = sc.l_x * prefactor_sfr * physconst.s_per_yr  # 1e38 erg/s/Mpc^3

    @jax.jit
    def kernel(delta_l):
        d = jnp.clip(delta_l * growth, d_lo, d_hi)
        t = (d - d_lo) / (d_hi - d_lo) * (len(deltas) - 1)
        i0 = jnp.clip(t.astype(jnp.int32), 0, len(deltas) - 2)
        fr = t - i0
        nion_t = jnp.asarray(nion_tab, jnp.float32)
        sfrd_t = jnp.asarray(sfrd_tab, jnp.float32)
        nion = nion_t[i0] * (1 - fr) + nion_t[i0 + 1] * fr
        sfrd = sfrd_t[i0] * (1 - fr) + sfrd_t[i0 + 1] * fr
        one_p = 1.0 + d
        return nion * one_p, sfrd * one_p

    nion_rel, sfrd_rel = kernel(lagrangian_delta)

    # Mean-fix (reference mean_fix_grids:207-244, gated by fix_mean in
    # scaling_relations.c:40-43): HMFs with no conditional form fall back to
    # the EPS CMF above, so rescale the box means to the chosen HMF's
    # unconditional Nion/SFRD integrals over the same mass range.
    if hmf_int in (hmf.HMF_WATSON, hmf.HMF_WATSON_Z, hmf.HMF_REED07, hmf.HMF_YUNG24):
        nion_u = hmf.nion_general(
            sigma_table, cosmo, hmf_int, redshift, ln_mmin, ln_hi,
            sc.mturn_a_nofb, sc,
        )
        sfrd_u = hmf.nion_general(
            sigma_table, cosmo, hmf_int, redshift, ln_mmin, ln_hi,
            sc_sfrd.mturn_a_nofb, sc_sfrd,
        )
        nion_mean = float(jnp.mean(nion_rel))
        sfrd_mean = float(jnp.mean(sfrd_rel))
        if nion_mean > 0:
            nion_rel = nion_rel * jnp.float32(nion_u / nion_mean)
        if sfrd_mean > 0:
            sfrd_rel = sfrd_rel * jnp.float32(sfrd_u / sfrd_mean)

    return HaloBox(
        redshift=np.float32(redshift),
        n_ion=nion_rel * jnp.float32(prefactor_nion),
        halo_sfr=sfrd_rel * jnp.float32(prefactor_sfr),
        whalo_sfr=nion_rel * jnp.float32(prefactor_wsfr),
        halo_xray=sfrd_rel * jnp.float32(prefactor_xray),
        halo_stars=sfrd_rel * jnp.float32(prefactor_stars),
        log10_Mcrit_ACG_ave=np.float32(np.log10(sc.mturn_a_nofb)),
        log10_Mcrit_MCG_ave=np.float32(0.0),
    )
