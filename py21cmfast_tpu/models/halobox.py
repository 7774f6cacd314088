"""HaloBox: paint discrete halo properties onto the HII grid.

TPU-native equivalent of reference HaloBox.c:563-880 + map_mass.c:346-470:
per-halo galaxy properties from the stochastic scaling relations
(scaling_relations.c:326-501, incl. the molecularly-cooled-galaxy branches)
are CIC scatter-added (do_cic_interpolation, map_mass.c:19-100) onto the
lowres grid as comoving densities [Msun / Mpc^3] (and 1e38 erg/s/Mpc^3 for
X-rays).  With USE_MINI_HALOS, per-cell feedback turnover grids (LW +
streaming + reionization feedback; get_log10_turnovers, HaloBox.c:465-517)
are CIC-read at each halo position to set the halo's ACG/MCG turnover masses.

The sub-resolution source contribution (halos below SAMPLER_MIN_MASS, and
the L-INTEGRAL fixed grids) is conditioned on the Lagrangian cell density and
then velocity-displaced to Eulerian positions with the same CIC machinery
(move_grid_galprops, map_mass.c:215-344) when the ICs are passed.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..cosmology.constants import physconst
from ..inputs import InputParameters
from ..outputs import HaloBox, PerturbedHaloCatalog
from . import hmf

__all__ = ["compute_halo_grid", "halo_properties", "compute_fixed_halo_grid"]


def _scaling_consts_dict(sc, cosmo, redshift, ao):
    return {
        k: jnp.float32(v)
        for k, v in dict(
            fstar_10=sc.fstar_10, alpha_star=sc.alpha_star, sigma_star=sc.sigma_star,
            alpha_upper=sc.alpha_upper, pivot_upper=sc.pivot_upper,
            upper_ratio=sc.upper_pivot_ratio, t_star=sc.t_star, t_h=sc.t_h,
            sigma_sfr_lim=sc.sigma_sfr_lim, sigma_sfr_idx=sc.sigma_sfr_idx,
            l_x=sc.l_x, l_x_mini=sc.l_x_mini, sigma_xray=sc.sigma_xray,
            fesc_10=sc.fesc_10, alpha_esc=sc.alpha_esc, fesc_7=sc.fesc_7,
            pop2_ion=sc.pop2_ion, pop3_ion=sc.pop3_ion,
            fstar_7=sc.fstar_7, alpha_star_mini=sc.alpha_star_mini,
            acg_thresh=sc.acg_thresh, mturn_a=sc.mturn_a_nofb,
            mturn_m=sc.mturn_m_nofb,
            baryon_ratio=cosmo.OMb / cosmo.OMm, redshift=redshift,
            median_flag=1.0 if ao.HALO_SCALING_RELATIONS_MEDIAN else 0.0,
        ).items()
    }


@partial(jax.jit, static_argnames=("use_upper", "use_mini", "use_metal_lx"))
def _halo_props_kernel(
    masses, star_rng, sfr_rng, xray_rng, mturn_a, mturn_m, c, *, use_upper,
    use_mini, use_metal_lx=True
):
    """Vectorized scaling relations for every halo (set_halo_properties,
    HaloBox.c + scaling_relations.c:326-501).

    `mturn_a`/`mturn_m` are per-halo turnover masses (linear Msun); without
    minihalos they are the no-feedback constants.  Returns a dict of per-halo
    properties (stellar, sfr, n_ion, wsfr, xray38, stellar_mini, sfr_mini)."""
    m = masses
    stoc_adj = jnp.where(c["median_flag"] > 0, 0.0, c["sigma_star"] ** 2 / 2.0)
    # ACG stellar fraction: double power law with upper turnover (or single PL)
    if use_upper:
        mu_fstar = c["fstar_10"] * c["upper_ratio"] / (
            (m / c["pivot_upper"]) ** (-c["alpha_star"])
            + (m / c["pivot_upper"]) ** (-c["alpha_upper"])
        )
    else:
        mu_fstar = c["fstar_10"] * (m / 1e10) ** c["alpha_star"]
    f_sample = mu_fstar * jnp.exp(
        -mturn_a / m + star_rng * c["sigma_star"] - stoc_adj
    )
    f_sample = jnp.minimum(f_sample, 1.0)
    stellar = f_sample * m * c["baryon_ratio"]

    if use_mini:
        mu_fstar_mini = c["fstar_7"] * (m / 1e7) ** c["alpha_star_mini"]
        f_mini = mu_fstar_mini * jnp.exp(
            -mturn_m / m - m / c["acg_thresh"] + star_rng * c["sigma_star"] - stoc_adj
        )
        f_mini = jnp.minimum(f_mini, 1.0)
        stellar_mini = f_mini * m * c["baryon_ratio"]
    else:
        stellar_mini = jnp.zeros_like(stellar)

    # SFR with (total) stellar-mass-dependent lognormal scatter
    stellar_tot = stellar + stellar_mini
    sigma_sfr = jnp.maximum(
        c["sigma_sfr_idx"] * jnp.log10(jnp.maximum(stellar_tot, 1e-30) / 1e10)
        + c["sigma_sfr_lim"],
        c["sigma_sfr_lim"],
    )
    sigma_sfr = jnp.where(c["sigma_sfr_lim"] > 0, sigma_sfr, 0.0)
    stoc_adj_sfr = jnp.where(c["median_flag"] > 0, 0.0, sigma_sfr**2 / 2.0)
    sfr_scatter = jnp.exp(sfr_rng * sigma_sfr - stoc_adj_sfr)
    inv_tstar_th = 1.0 / (c["t_star"] * c["t_h"])
    sfr = stellar * inv_tstar_th * sfr_scatter  # Msun/s
    sfr_mini = stellar_mini * inv_tstar_th * sfr_scatter

    # X-ray: L_X/SFR double power-law in metallicity (lx_on_sfr_doublePL) —
    # but ONLY when USE_UPPER_STELLAR_TURNOVER: the reference's get_lx_on_sfr
    # (scaling_relations.c:315-324) returns the constant L_X otherwise.
    if use_metal_lx:
        # metallicity (Eq. 14-15 of 2504.17254) for LX(Z), from TOTAL sfr/stars
        sfr_tot = sfr + sfr_mini
        z_scaling = 10.0 ** (-0.056 * c["redshift"] + 0.064)
        m0 = 1.28825e10 * jnp.maximum(sfr_tot * physconst.s_per_yr, 1e-30) ** 0.56
        stellar_term = (1.0 + (jnp.maximum(stellar_tot, 1e-30) / m0) ** -2.1) ** -0.148
        metallicity = 1.23 * stellar_term * z_scaling

        def lx_on_sfr(lnorm):
            return lnorm * 2.0 / ((metallicity / 0.05) ** 0.64 + 1.0)
    else:
        def lx_on_sfr(lnorm):
            return lnorm

    mu_x = lx_on_sfr(c["l_x"]) * sfr * physconst.s_per_yr
    if use_mini:
        mu_x = mu_x + lx_on_sfr(c["l_x_mini"]) * sfr_mini * physconst.s_per_yr
    stoc_adj_x = jnp.where(c["median_flag"] > 0, 0.0, c["sigma_xray"] ** 2 / 2.0)
    xray38 = mu_x * jnp.exp(xray_rng * c["sigma_xray"] - stoc_adj_x)  # 1e38 erg/s

    # escape fractions (no rng yet, matching reference)
    fesc = jnp.minimum(c["fesc_10"] * (m / 1e10) ** c["alpha_esc"], 1.0)
    n_ion = stellar * c["pop2_ion"] * fesc
    wsfr = sfr * c["pop2_ion"] * fesc
    if use_mini:
        fesc_mini = jnp.minimum(c["fesc_7"] * (m / 1e7) ** c["alpha_esc"], 1.0)
        n_ion = n_ion + stellar_mini * c["pop3_ion"] * fesc_mini
        wsfr = wsfr + sfr_mini * c["pop3_ion"] * fesc_mini

    return dict(
        stellar=stellar, sfr=sfr, n_ion=n_ion, wsfr=wsfr, xray38=xray38,
        stellar_mini=stellar_mini, sfr_mini=sfr_mini,
    )


@partial(jax.jit, static_argnames=("shape",))
def _cic_deposit(masses, pos_cells, props, *, shape):
    """CIC scatter of per-halo properties onto the grid (map_mass.c:19-100;
    pos_cells in cell units, cell 0 centred at the origin)."""
    nx, ny, nz = shape
    valid = masses > 0
    i0 = jnp.floor(pos_cells).astype(jnp.int32)
    frac = pos_cells - i0

    out = []
    flat_props = [jnp.where(valid, p, 0.0) for p in props]
    grids_out = [jnp.zeros(nx * ny * nz, jnp.float32) for _ in props]
    dims = jnp.asarray([nx, ny, nz], jnp.int32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ix = (i0[:, 0] + dx) % nx
                iy = (i0[:, 1] + dy) % ny
                iz = (i0[:, 2] + dz) % nz
                idx = (ix * ny + iy) * nz + iz
                w = (
                    (frac[:, 0] if dx else 1.0 - frac[:, 0])
                    * (frac[:, 1] if dy else 1.0 - frac[:, 1])
                    * (frac[:, 2] if dz else 1.0 - frac[:, 2])
                )
                grids_out = [
                    g.at[idx].add(p * w) for g, p in zip(grids_out, flat_props)
                ]
    del dims
    for g in grids_out:
        out.append(g.reshape(shape))
    return out


@partial(jax.jit, static_argnames=("shape", "use_2lpt"))
def _displace_grids(props, vx, vy, vz, v2x, v2y, v2z, fac_za, fac_2lpt,
                    disp_to_cells, *, shape, use_2lpt):
    """Move per-cell property grids from Lagrangian to Eulerian positions
    (reference move_grid_galprops, map_mass.c:215-344): each cell's value is
    carried to `index + psi(cell) * factor` and CIC-deposited.  The velocity
    grids must be at the same resolution as the property grids."""
    nx, ny, nz = shape
    ii = jnp.arange(nx, dtype=jnp.float32)[:, None, None]
    jj = jnp.arange(ny, dtype=jnp.float32)[None, :, None]
    kk = jnp.arange(nz, dtype=jnp.float32)[None, None, :]
    dx = vx * fac_za
    dy = vy * fac_za
    dz = vz * fac_za
    if use_2lpt:
        dx = dx + v2x * fac_2lpt
        dy = dy + v2y * fac_2lpt
        dz = dz + v2z * fac_2lpt
    px = (ii + dx * disp_to_cells).reshape(-1)
    py = (jj + dy * disp_to_cells).reshape(-1)
    pz = (kk + dz * disp_to_cells).reshape(-1)
    pos_cells = jnp.stack([px, py, pz], axis=-1)
    flat_props = tuple(p.reshape(-1) for p in props)
    ones = jnp.ones(nx * ny * nz, jnp.float32)
    return _cic_deposit(ones, pos_cells, flat_props, shape=shape)


@partial(jax.jit, static_argnames=("shape",))
def _cic_read(grid, pos_cells, *, shape):
    """CIC (trilinear) read of a grid at scattered positions (cic_read_float)."""
    nx, ny, nz = shape
    i0 = jnp.floor(pos_cells).astype(jnp.int32)
    frac = pos_cells - i0
    val = jnp.zeros(pos_cells.shape[0], grid.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ix = (i0[:, 0] + dx) % nx
                iy = (i0[:, 1] + dy) % ny
                iz = (i0[:, 2] + dz) % nz
                w = (
                    (frac[:, 0] if dx else 1.0 - frac[:, 0])
                    * (frac[:, 1] if dy else 1.0 - frac[:, 1])
                    * (frac[:, 2] if dz else 1.0 - frac[:, 2])
                )
                val = val + grid[ix, iy, iz] * w
    return val


def _mcrit_grids(redshift, inputs, sc, previous_spin_temp, previous_ionized_box,
                 lowres_vcb):
    """Per-cell log10 feedback turnover grids (get_log10_turnovers,
    HaloBox.c:465-517), reusing the ionization-module kernel."""
    from .ionization import _mcrit_kernel

    so = inputs.simulation_options
    ap = inputs.astro_params
    shape = so.lowres_shape
    started = redshift < so.Z_HEAT_MAX
    j21 = (
        previous_spin_temp.J_21_LW
        if (started and previous_spin_temp is not None
            and previous_spin_temp.J_21_LW is not None)
        else jnp.zeros(shape, jnp.float32)
    )
    g12 = (
        previous_ionized_box.ionisation_rate_G12
        if (started and previous_ionized_box is not None)
        else jnp.zeros(shape, jnp.float32)
    )
    zre = (
        previous_ionized_box.z_reion
        if (started and previous_ionized_box is not None)
        else jnp.full(shape, -1.0, jnp.float32)
    )
    vcb = (
        lowres_vcb
        if (lowres_vcb is not None
            and inputs.matter_options.V_CB_MODEL == "FLUCTS")
        else jnp.full(shape, jnp.float32(sc.vcb_const))
    )
    mt_a, mt_m = _mcrit_kernel(
        g12, zre, j21,
        jnp.float32(redshift),
        jnp.float32(sc.mturn_a_nofb), jnp.float32(sc.mturn_m_nofb),
        vcb,
        jnp.float32(ap.A_LW), jnp.float32(ap.BETA_LW),
        jnp.float32(ap.A_VCB), jnp.float32(ap.BETA_VCB),
        jnp.float32(sc.v_cb_avg * np.sqrt(3.0 * np.pi / 8.0)),
    )
    return mt_a, mt_m


def compute_halo_grid(
    redshift: float,
    inputs: InputParameters,
    pt_halos: PerturbedHaloCatalog,
    previous_spin_temp=None,
    previous_ionized_box=None,
    lagrangian_delta=None,
    lowres_vcb=None,
    ics=None,
) -> HaloBox:
    """Grid the halo catalog into source fields (reference ComputeHaloBox:563).

    With USE_MINI_HALOS, `previous_spin_temp` (J_21_LW) and
    `previous_ionized_box` (Gamma12, z_reion) feed the per-cell feedback
    turnover grids, which are CIC-read at each halo position
    (move_halo_galprops, map_mass.c:412-414) and set the MCG properties.

    When `lagrangian_delta` (the lowres IC density) is given, the expectation
    of sources below SAMPLER_MIN_MASS is added from the deterministic
    conditional integrals (reference HaloBox.c:626-640)."""
    so = inputs.simulation_options
    sc = hmf.set_scaling_constants(redshift, inputs)
    ao = inputs.astro_options
    cosmo = inputs.cosmology
    shape = so.lowres_shape
    cell_vol = (so.box_len / so.HII_DIM) ** 3
    use_mini = bool(ao.USE_MINI_HALOS)

    cell_lens = jnp.asarray([so.box_len / so.HII_DIM] * 3, jnp.float32)
    pos_cells = pt_halos.halo_coords / cell_lens[None, :]

    if use_mini:
        mt_a_grid, mt_m_grid = _mcrit_grids(
            redshift, inputs, sc, previous_spin_temp, previous_ionized_box,
            lowres_vcb,
        )
        l10_mt_a_ave = float(jnp.mean(mt_a_grid))
        l10_mt_m_ave = float(jnp.mean(mt_m_grid))
        halo_mt_a = 10.0 ** _cic_read(mt_a_grid, pos_cells, shape=shape)
        halo_mt_m = 10.0 ** _cic_read(mt_m_grid, pos_cells, shape=shape)
    else:
        mt_a_grid = mt_m_grid = None
        l10_mt_a_ave = float(np.log10(sc.mturn_a_nofb))
        l10_mt_m_ave = float(np.log10(max(sc.mturn_m_nofb, 1.0)))
        halo_mt_a = jnp.full_like(pt_halos.halo_masses, jnp.float32(sc.mturn_a_nofb))
        halo_mt_m = jnp.full_like(pt_halos.halo_masses, jnp.float32(sc.mturn_m_nofb))

    c = _scaling_consts_dict(sc, cosmo, redshift, ao)
    props = _halo_props_kernel(
        pt_halos.halo_masses,
        pt_halos.star_rng,
        pt_halos.sfr_rng,
        pt_halos.xray_rng,
        halo_mt_a,
        halo_mt_m,
        c,
        use_upper=ao.USE_UPPER_STELLAR_TURNOVER and sc.alpha_star > sc.alpha_upper,
        use_mini=use_mini,
        use_metal_lx=bool(ao.USE_UPPER_STELLAR_TURNOVER),
    )
    dep_fields = [
        props["n_ion"], props["sfr"], props["wsfr"], props["xray38"],
        props["stellar"], jnp.ones_like(props["stellar"]),
    ]
    if use_mini:
        dep_fields += [props["sfr_mini"], props["stellar_mini"]]
    deposited = _cic_deposit(
        pt_halos.halo_masses, pos_cells, tuple(dep_fields), shape=shape
    )
    n_ion_g, sfr_g, wsfr_g, xray_g, stars_g, count_g = deposited[:6]
    inv_vol = jnp.float32(1.0 / cell_vol)
    box = HaloBox(
        redshift=np.float32(redshift),
        n_ion=n_ion_g * inv_vol,
        halo_sfr=sfr_g * inv_vol,
        whalo_sfr=wsfr_g * inv_vol,
        halo_xray=xray_g * inv_vol,
        halo_stars=stars_g * inv_vol,
        count=count_g,
        halo_sfr_mini=deposited[6] * inv_vol if use_mini else None,
        halo_stars_mini=deposited[7] * inv_vol if use_mini else None,
        log10_Mcrit_ACG_ave=np.float32(l10_mt_a_ave),
        log10_Mcrit_MCG_ave=np.float32(l10_mt_m_ave),
    )
    if lagrangian_delta is not None:
        sub = compute_fixed_halo_grid(
            redshift, inputs, lagrangian_delta, m_max=so.SAMPLER_MIN_MASS,
            mt_a_grid=mt_a_grid, mt_m_grid=mt_m_grid, ics=ics,
        )
        if sub is not None:
            box = dataclasses.replace(
                box,
                n_ion=box.n_ion + sub.n_ion,
                halo_sfr=box.halo_sfr + sub.halo_sfr,
                whalo_sfr=box.whalo_sfr + sub.whalo_sfr,
                halo_xray=box.halo_xray + sub.halo_xray,
                halo_stars=box.halo_stars + sub.halo_stars,
                halo_sfr_mini=(
                    box.halo_sfr_mini + sub.halo_sfr_mini
                    if use_mini and sub.halo_sfr_mini is not None
                    else box.halo_sfr_mini
                ),
                halo_stars_mini=(
                    box.halo_stars_mini + sub.halo_stars_mini
                    if use_mini and sub.halo_stars_mini is not None
                    else box.halo_stars_mini
                ),
            )
    return box


def halo_properties(redshift, inputs, catalog):
    """Convenience: per-halo property arrays (reference convert_halo_props:781)."""
    sc = hmf.set_scaling_constants(redshift, inputs)
    ao = inputs.astro_options
    cosmo = inputs.cosmology
    c = _scaling_consts_dict(sc, cosmo, redshift, ao)
    mturn_a = jnp.full_like(catalog.halo_masses, jnp.float32(sc.mturn_a_nofb))
    mturn_m = jnp.full_like(catalog.halo_masses, jnp.float32(sc.mturn_m_nofb))
    props = _halo_props_kernel(
        catalog.halo_masses, catalog.star_rng, catalog.sfr_rng, catalog.xray_rng,
        mturn_a, mturn_m, c,
        use_upper=ao.USE_UPPER_STELLAR_TURNOVER and sc.alpha_star > sc.alpha_upper,
        use_mini=bool(ao.USE_MINI_HALOS),
        use_metal_lx=bool(ao.USE_UPPER_STELLAR_TURNOVER),
    )
    return (
        props["stellar"], props["sfr"], props["n_ion"], props["wsfr"],
        props["xray38"],
    )


N_MT_FIXED = 24  # Mturn axis points of the sub-resolution MCG tables


def compute_fixed_halo_grid(
    redshift: float,
    inputs: InputParameters,
    lagrangian_delta,  # lowres IC density (z=0 normalization)
    m_max: float | None = None,
    mt_a_grid=None,
    mt_m_grid=None,
    ics=None,
) -> HaloBox | None:
    """Deterministic (expectation-value) source grids
    (reference set_fixed_grids:297-436): per-cell conditional Nion/SFR
    integrals evaluated via a delta-table gather.

    Used two ways, as in the reference (HaloBox.c:624-640):
     * SOURCE_MODEL='L-INTEGRAL': full mass range (m_max=None).
     * sub-resolution component of the halo-sampler source model:
       m_max=SAMPLER_MIN_MASS restricts the integral to halos too small for
       the stochastic sampler; the result is *added* to the sampled deposit.

    With USE_MINI_HALOS, `mt_a_grid`/`mt_m_grid` (log10 per-cell turnovers)
    select the local table row via a bilinear (Mturn, delta) gather, and the
    MCG integrals populate halo_sfr_mini/halo_stars_mini (get_cell_integrals,
    HaloBox.c:245-296).

    Returns None when the mass range is empty (m_max <= minimum source mass)."""
    so = inputs.simulation_options
    ao = inputs.astro_options
    cosmo = inputs.cosmology
    sc = hmf.set_scaling_constants(redshift, inputs)
    sc_sfrd = sc.without_esc()
    from .ionization import _get_sigma_table

    sigma_table = _get_sigma_table(inputs)
    growth = float(cosmo.dicke(redshift))
    hmf_int = hmf.HMF_NAMES[inputs.matter_options.HMF]
    use_mini = bool(ao.USE_MINI_HALOS)

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
    n_delta = 400
    deltas = np.linspace(d_lo, d_hi, n_delta)

    if use_mini:
        # 2D (Mturn, delta) tables for ACG + MCG
        mt_lo, mt_hi = 5.0, 10.0
        mturn_axis = np.linspace(mt_lo, mt_hi, N_MT_FIXED)
        nion_tab = np.stack([
            hmf.nion_conditional(
                sigma_table, hmf_int, growth, ln_mmin, ln_mcell, sigma_cell,
                deltas, 10.0**mt, sc, ln_hi=ln_hi,
                method=inputs.astro_options.INTEGRATION_METHOD_ATOMIC,
            )
            for mt in mturn_axis
        ])
        sfrd_tab = np.stack([
            hmf.nion_conditional(
                sigma_table, hmf_int, growth, ln_mmin, ln_mcell, sigma_cell,
                deltas, 10.0**mt, sc_sfrd, ln_hi=ln_hi,
                method=inputs.astro_options.INTEGRATION_METHOD_ATOMIC,
            )
            for mt in mturn_axis
        ])
        nion_tab_mini = np.stack([
            hmf.nion_conditional(
                sigma_table, hmf_int, growth, ln_mmin, ln_mcell, sigma_cell,
                deltas, 10.0**mt, sc, mini=True, ln_hi=ln_hi,
                method=inputs.astro_options.INTEGRATION_METHOD_MINI,
            )
            for mt in mturn_axis
        ])
        sfrd_tab_mini = np.stack([
            hmf.nion_conditional(
                sigma_table, hmf_int, growth, ln_mmin, ln_mcell, sigma_cell,
                deltas, 10.0**mt, sc_sfrd, mini=True, ln_hi=ln_hi,
                method=inputs.astro_options.INTEGRATION_METHOD_MINI,
            )
            for mt in mturn_axis
        ])
        if mt_a_grid is None:
            mt_a_grid = jnp.full(
                so.lowres_shape, jnp.float32(np.log10(sc.mturn_a_nofb))
            )
        if mt_m_grid is None:
            mt_m_grid = jnp.full(
                so.lowres_shape, jnp.float32(np.log10(max(sc.mturn_m_nofb, 1.0)))
            )
    else:
        nion_tab = hmf.nion_conditional(
            sigma_table, hmf_int, growth, ln_mmin, ln_mcell, sigma_cell, deltas,
            sc.mturn_a_nofb, sc, ln_hi=ln_hi,
            method=inputs.astro_options.INTEGRATION_METHOD_ATOMIC,
        )
        sfrd_tab = hmf.nion_conditional(
            sigma_table, hmf_int, growth, ln_mmin, ln_mcell, sigma_cell, deltas,
            sc_sfrd.mturn_a_nofb, sc_sfrd, ln_hi=ln_hi,
            method=inputs.astro_options.INTEGRATION_METHOD_ATOMIC,
        )

    prefactor_nion = cosmo.rho_crit * cosmo.OMb * sc.fstar_10 * sc.fesc_10 * sc.pop2_ion
    prefactor_stars = cosmo.rho_crit * cosmo.OMb * sc.fstar_10
    prefactor_sfr = prefactor_stars / sc.t_star / sc.t_h
    prefactor_wsfr = prefactor_sfr * sc.fesc_10 * sc.pop2_ion
    prefactor_xray = sc.l_x * prefactor_sfr * physconst.s_per_yr  # 1e38 erg/s/Mpc^3
    prefactor_stars_mini = cosmo.rho_crit * cosmo.OMb * sc.fstar_7
    prefactor_sfr_mini = prefactor_stars_mini / sc.t_star / sc.t_h
    prefactor_nion_mini = prefactor_stars_mini * sc.fesc_7 * sc.pop3_ion
    prefactor_wsfr_mini = prefactor_sfr_mini * sc.fesc_7 * sc.pop3_ion
    prefactor_xray_mini = sc.l_x_mini * prefactor_sfr_mini * physconst.s_per_yr

    # Lagrangian -> Eulerian density factor: when the expectation grids are
    # velocity-displaced below, the Eulerian pile-up of sources comes from the
    # CIC deposit itself and the reference deposits the BARE cell integrals
    # (move_grid_galprops, map_mass.c:299-320 — no (1+delta)); only the
    # undisplaced fallback needs the explicit (1+delta) conversion.
    will_displace = (
        ics is not None and ics.vx is not None and ics.vx.shape == so.lowres_shape
    )
    if not use_mini:
        @jax.jit
        def kernel(delta_l):
            d = jnp.clip(delta_l * growth, d_lo, d_hi)
            t = (d - d_lo) / (d_hi - d_lo) * (n_delta - 1)
            i0 = jnp.clip(t.astype(jnp.int32), 0, n_delta - 2)
            fr = t - i0
            nion_t = jnp.asarray(nion_tab, jnp.float32)
            sfrd_t = jnp.asarray(sfrd_tab, jnp.float32)
            nion = nion_t[i0] * (1 - fr) + nion_t[i0 + 1] * fr
            sfrd = sfrd_t[i0] * (1 - fr) + sfrd_t[i0 + 1] * fr
            one_p = 1.0 if will_displace else 1.0 + d
            return nion * one_p, sfrd * one_p

        nion_rel, sfrd_rel = kernel(lagrangian_delta)
        nion_rel_mini = sfrd_rel_mini = None
    else:
        @jax.jit
        def kernel_mini(delta_l, mta, mtm):
            d = jnp.clip(delta_l * growth, d_lo, d_hi)
            t = (d - d_lo) / (d_hi - d_lo) * (n_delta - 1)
            i0 = jnp.clip(t.astype(jnp.int32), 0, n_delta - 2)
            fr = t - i0

            def gather2d(tab, mt):
                tm = jnp.clip(
                    (mt - mt_lo) / (mt_hi - mt_lo) * (N_MT_FIXED - 1),
                    0.0, N_MT_FIXED - 1.001,
                )
                j0 = tm.astype(jnp.int32)
                fm = tm - j0
                v00 = tab[j0, i0]
                v01 = tab[j0, i0 + 1]
                v10 = tab[j0 + 1, i0]
                v11 = tab[j0 + 1, i0 + 1]
                return (v00 * (1 - fr) + v01 * fr) * (1 - fm) + (
                    v10 * (1 - fr) + v11 * fr
                ) * fm

            one_p = 1.0 if will_displace else 1.0 + d
            return (
                gather2d(jnp.asarray(nion_tab, jnp.float32), mta) * one_p,
                gather2d(jnp.asarray(sfrd_tab, jnp.float32), mta) * one_p,
                gather2d(jnp.asarray(nion_tab_mini, jnp.float32), mtm) * one_p,
                gather2d(jnp.asarray(sfrd_tab_mini, jnp.float32), mtm) * one_p,
            )

        nion_rel, sfrd_rel, nion_rel_mini, sfrd_rel_mini = kernel_mini(
            lagrangian_delta, mt_a_grid, mt_m_grid
        )

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

    n_ion = nion_rel * jnp.float32(prefactor_nion)
    halo_sfr = sfrd_rel * jnp.float32(prefactor_sfr)
    whalo_sfr = nion_rel * jnp.float32(prefactor_wsfr)
    halo_xray = sfrd_rel * jnp.float32(prefactor_xray)
    halo_stars = sfrd_rel * jnp.float32(prefactor_stars)
    halo_sfr_mini = halo_stars_mini = None
    if use_mini:
        n_ion = n_ion + nion_rel_mini * jnp.float32(prefactor_nion_mini)
        whalo_sfr = whalo_sfr + nion_rel_mini * jnp.float32(prefactor_wsfr_mini)
        halo_xray = halo_xray + sfrd_rel_mini * jnp.float32(prefactor_xray_mini)
        halo_sfr_mini = sfrd_rel_mini * jnp.float32(prefactor_sfr_mini)
        halo_stars_mini = sfrd_rel_mini * jnp.float32(prefactor_stars_mini)

    # velocity-displace the expectation grids to Eulerian positions
    # (reference move_grid_galprops, map_mass.c:215-344) when the ICs are
    # available; sub-grid sources then track the matter flow instead of
    # sitting at Lagrangian cell centres
    if will_displace:
        from .perturb import _displacement_factors

        _, _, fac_za, fac_2lpt = _displacement_factors(inputs, redshift)
        use_2lpt = (
            inputs.matter_options.PERTURB_ALGORITHM == "2LPT"
            and ics.vx_2LPT is not None
        )
        props = [n_ion, halo_sfr, whalo_sfr, halo_xray, halo_stars]
        if use_mini:
            props += [halo_sfr_mini, halo_stars_mini]
        zero_v = jnp.zeros(so.lowres_shape, jnp.float32)
        moved = _displace_grids(
            tuple(props),
            ics.vx, ics.vy, ics.vz,
            ics.vx_2LPT if use_2lpt else zero_v,
            ics.vy_2LPT if use_2lpt else zero_v,
            ics.vz_2LPT if use_2lpt else zero_v,
            jnp.float32(fac_za), jnp.float32(fac_2lpt),
            jnp.float32(so.HII_DIM / so.box_len),
            shape=so.lowres_shape,
            use_2lpt=use_2lpt,
        )
        n_ion, halo_sfr, whalo_sfr, halo_xray, halo_stars = moved[:5]
        if use_mini:
            halo_sfr_mini, halo_stars_mini = moved[5:]

    # box-level turnover averages: the reference sets these from the
    # feedback-included grids (get_log10_turnovers, HaloBox.c:511-517) BEFORE
    # any consumer (mean_fix_grids:207-214, the XraySourceBox per-shell means
    # feeding the Ts ladder's MCG tau_X) — the no-feedback constants are only
    # the fallback when the grids are absent.
    l10_mt_a_ave = (
        float(jnp.mean(mt_a_grid))
        if use_mini and mt_a_grid is not None
        else float(np.log10(sc.mturn_a_nofb))
    )
    l10_mt_m_ave = (
        float(jnp.mean(mt_m_grid))
        if use_mini and mt_m_grid is not None
        else float(np.log10(max(sc.mturn_m_nofb, 1.0)))
    )
    return HaloBox(
        redshift=np.float32(redshift),
        n_ion=n_ion,
        halo_sfr=halo_sfr,
        whalo_sfr=whalo_sfr,
        halo_xray=halo_xray,
        halo_stars=halo_stars,
        halo_sfr_mini=halo_sfr_mini,
        halo_stars_mini=halo_stars_mini,
        log10_Mcrit_ACG_ave=np.float32(l10_mt_a_ave),
        log10_Mcrit_MCG_ave=np.float32(l10_mt_m_ave),
    )
