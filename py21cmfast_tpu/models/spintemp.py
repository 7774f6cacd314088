"""Spin-temperature box: X-ray heating, Lyman-alpha coupling, IGM thermal state.

TPU-native equivalent of reference SpinTemperatureBox.c (ts_main:1387-1949).
Architecture:

 * Host (numpy float64, once per snapshot): the z'' shell ladder
   (setup_z_edges:312), Lyman-series spectral prefactors
   (calculate_spectral_factors:364), global Nion/SFRD tables, tau_X=1 horizons
   and X-ray frequency-integral tables (fill_freqint_tables:810), and per-shell
   conditional-SFRD(delta) tables (calculate_sfrd_from_grid:1010).
 * Device (one jitted kernel): a `lax.scan` over the N_STEP_TS shells doing
   filter -> iFFT -> table-gather -> accumulate of the radiative terms
   (the reference's R-loop, :1562-1803), followed by the fused elementwise
   per-cell ODE step + Wouthuysen-Field Ts solve (get_Ts_fast:1210-1384).

Known approximations vs the reference (documented for parity review):
 * Ly-a heating tables are *generated* from the Fokker-Planck solution
   (models/lya_heating.py) rather than read from the reference's external
   download (`Lyman_alpha_heating_table.dat`).
 * RECFAST initial conditions come from our own Peebles solver (~1% of RECFAST).
 * The per-cell Mcrit box for the MCG SFRD includes LW, streaming-velocity,
   and (when the previous IonizedBox is passed) reionization feedback.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..cosmology.constants import FRACT_FLOAT_ERR, physconst
from ..cosmology.recombination import RecombinationHistory
from ..inputs import InputParameters
from ..ops import fft, filters, grids
from ..ops.gridops import SINGLE, GridOps
from ..outputs import PerturbedField, TsBox, XraySourceBox
from . import heating, hmf

__all__ = ["compute_spin_temperature"]

MAX_TK = 5e4
N_DELTA_SFRD = 400
N_MTURN_TS = 24          # log10-Mturn axis of the MCG SFRD tables (LOG10_MTURN range)
MT_TS_LO, MT_TS_HI = 5.0, 10.0
# Shell-filter radius attribution for the Eulerian Ts ladder.  The flux from
# shell [R_inner, R_outer] carries density structure at scales between the two
# edges; smoothing at the geometric mid-radius is second-order accurate in the
# shell width, where the outer-edge choice is first-order and systematically
# under-resolves the Lya/X-ray flux structure at N_STEP_TS=40 (measured: Tb
# power converges 1.095 -> 1.029 gold/ours as N_STEP_TS 40 -> 160 with
# "outer"; "mid" at N=40 reproduces both that continuum limit and the
# reference's N=40 golden spectra to ~2-4%, within realization scatter).
# The reference's Lagrangian path gets this right via annular XraySourceBox
# windows; its Eulerian fill_Rbox_table nominally smooths at the outer edge.
_FILTER_RADIUS_MODE = "mid"   # "outer" | "mid" | "inner"


# ---------------------------------------------------------------------------
# host-side shell setup


@dataclasses.dataclass
class ShellLadder:
    """The N_STEP_TS concentric shells and their emission redshifts."""

    R: np.ndarray  # outer radius of each shell [Mpc]
    R_inner: np.ndarray
    zpp_edge: np.ndarray  # redshift at the outer edge
    zpp: np.ndarray  # shell-centre redshift
    dzpp: np.ndarray
    dtdz: np.ndarray
    growth: np.ndarray
    m_min: np.ndarray
    m_max: np.ndarray


def setup_z_edges(zp: float, inputs: InputParameters) -> ShellLadder:
    """Reference setup_z_edges (SpinTemperatureBox.c:312-362)."""
    so = inputs.simulation_options
    ap = inputs.astro_params
    cosmo = inputs.cosmology
    n_step = ap.N_STEP_TS

    cell = 1.5 if so.HII_DIM == 1 else so.box_len / so.HII_DIM
    R = physconst.l_factor * cell
    R_factor = (ap.R_MAX_TS / R) ** (1.0 / n_step)

    Rs, R_in, z_edges, zpps, dzpps, dtdzs, growths = [], [], [], [], [], [], []
    prev_zpp, prev_R = zp, 0.0
    for _ in range(n_step):
        drdz = (1.0 + prev_zpp) * physconst.c_cms * cosmo.dtdz(prev_zpp)  # cm per dz
        z_edge = prev_zpp - (R - prev_R) * physconst.cm_per_Mpc / drdz
        zpp = 0.5 * (z_edge + prev_zpp)
        Rs.append(R)
        R_in.append(prev_R)
        z_edges.append(z_edge)
        zpps.append(zpp)
        dzpps.append(prev_zpp - z_edge)
        dtdzs.append(float(cosmo.dtdz(zpp)))
        growths.append(float(cosmo.dicke(zpp)))
        prev_zpp, prev_R = z_edge, R
        R = R * R_factor

    zpps = np.array(zpps)
    m_min = np.array([hmf.minimum_source_mass(z, inputs, xray=True) for z in zpps])
    m_max = np.asarray(cosmo.RtoM(np.array(Rs)))
    return ShellLadder(
        R=np.array(Rs),
        R_inner=np.array(R_in),
        zpp_edge=np.array(z_edges),
        zpp=zpps,
        dzpp=np.array(dzpps),
        dtdz=np.array(dtdzs),
        growth=np.array(growths),
        m_min=m_min,
        m_max=m_max,
    )


def spectral_prefactors(zp, ladder: ShellLadder, inputs: InputParameters):
    """Lyman-n recycling sums per shell (calculate_spectral_factors:364-499).

    Returns a dict with per-shell prefactor arrays: starlya/cont/inj (Pop II),
    starlya_mini (Pop III), lw and lw_mini (Lyman-Werner bands)."""
    ap = inputs.astro_params
    ao = inputs.astro_options
    spectra = heating.StellarSpectra(ap.POP2_ION, ap.POP3_ION)
    n_r = len(ladder.R)
    starlya = np.zeros(n_r)
    cont = np.zeros(n_r)
    inj = np.zeros(n_r)
    starlya_mini = np.zeros(n_r)
    cont_mini = np.zeros(n_r)
    inj_mini = np.zeros(n_r)
    lw = np.zeros(n_r)
    lw_mini = np.zeros(n_r)
    nu_lw_norm = 2.70331197e15 / 3.288465e15  # nu_LW_thresh / nu_ion_HI

    sum_prev = ly2_prev = lynto2_prev = 0.0
    mini_prev = ly2_mini_prev = lynto2_mini_prev = 0.0
    first_radii, first_zero = True, True
    prev_zpp = 0.0
    for i in range(n_r):
        zpp = ladder.zpp[i]
        sum_ly2 = sum_lynto2 = 0.0
        sum_mini = sum_ly2_mini = sum_lynto2_mini = sum_lw = sum_lw_mini = 0.0
        # n=2 (continuum photons that redshift into Lya)
        if zpp < heating.zmax_lyn(zp, 2):
            nuprime = heating.nu_n(2) * (1 + zpp) / (1 + zp)
            sum_ly2 = heating.frecycle(2) * spectra.emissivity(nuprime, 2)
            if ao.USE_MINI_HALOS:
                sum_ly2_mini = heating.frecycle(2) * spectra.emissivity(nuprime, 3)
                sum_mini += sum_ly2_mini
                nu_lw = max(nuprime, nu_lw_norm)
                if nu_lw < heating.nu_n(3):
                    sum_lw += (1 - ap.F_H2_SHIELD) * spectra.emissivity_band_integral(nu_lw, 2, 2)
                    sum_lw_mini += (1 - ap.F_H2_SHIELD) * spectra.emissivity_band_integral(nu_lw, 2, 3)
        # n>=3 (injected at line centre after cascade)
        for n in range(heating.NSPEC_MAX, 2, -1):
            if zpp > heating.zmax_lyn(zp, n):
                continue
            nuprime = heating.nu_n(n) * (1 + zpp) / (1 + zp)
            sum_lynto2 += heating.frecycle(n) * spectra.emissivity(nuprime, 2)
            if ao.USE_MINI_HALOS:
                _mini_n = heating.frecycle(n) * spectra.emissivity(nuprime, 3)
                sum_lynto2_mini += _mini_n
                sum_mini += _mini_n
                nu_lw = max(nuprime, nu_lw_norm)
                if nu_lw < heating.nu_n(n + 1):
                    sum_lw += (1 - ap.F_H2_SHIELD) * spectra.emissivity_band_integral(nu_lw, n, 2)
                    sum_lw_mini += (1 - ap.F_H2_SHIELD) * spectra.emissivity_band_integral(nu_lw, n, 3)
        sum_lyn = sum_ly2 + sum_lynto2

        # partial-shell edge correction (reference :439-463)
        if i > 1 and sum_lyn == 0.0 and sum_prev > 0.0 and first_radii:
            weight = 0.0
            n_pts = 1000
            for ii in range(n_pts):
                trial = prev_zpp + (zpp - prev_zpp) * ii / (n_pts - 1)
                counter = sum(
                    1 for n in range(heating.NSPEC_MAX, 1, -1)
                    if trial <= heating.zmax_lyn(zp, n)
                )
                if counter == 0 and first_zero:
                    first_zero = False
                    weight = ii / n_pts
            sum_lyn = weight * sum_prev
            sum_ly2 = weight * ly2_prev
            sum_lynto2 = weight * lynto2_prev
            if ao.USE_MINI_HALOS:
                # the reference corrects the Pop III sums in the same branch
                # (SpinTemperatureBox.c:456-459)
                sum_mini = weight * mini_prev
                sum_ly2_mini = weight * ly2_mini_prev
                sum_lynto2_mini = weight * lynto2_mini_prev
            first_radii = False

        zpp_integrand = (1 + zp) ** 2 * (1 + zpp)
        starlya[i] = zpp_integrand * sum_lyn
        cont[i] = zpp_integrand * sum_ly2
        inj[i] = zpp_integrand * sum_lynto2
        starlya_mini[i] = zpp_integrand * sum_mini
        cont_mini[i] = zpp_integrand * sum_ly2_mini
        inj_mini[i] = zpp_integrand * sum_lynto2_mini
        lw[i] = zpp_integrand * sum_lw
        lw_mini[i] = zpp_integrand * sum_lw_mini

        sum_prev, ly2_prev, lynto2_prev = sum_lyn, sum_ly2, sum_lynto2
        mini_prev, ly2_mini_prev, lynto2_mini_prev = (
            sum_mini, sum_ly2_mini, sum_lynto2_mini
        )
        prev_zpp = zpp
    return {"starlya": starlya, "cont": cont, "inj": inj,
            "starlya_mini": starlya_mini, "cont_mini": cont_mini,
            "inj_mini": inj_mini, "lw": lw, "lw_mini": lw_mini}


def _build_sfrd_tables(inputs, ladder, sigma_table, sc_zp):
    """Per-shell conditional SFRD(delta) tables (E-INTEGRAL path).

    Table axis is delta *at zpp* in [-1+eps, 0.99*delta_crit]."""
    n_r = len(ladder.R)
    hmf_int = hmf.HMF_NAMES[inputs.matter_options.HMF]
    eff_hmf = hmf_int if hmf_int in (hmf.HMF_PS, hmf.HMF_ST, hmf.HMF_DELOS) else hmf.HMF_PS
    d_lo = np.full(n_r, -1.0 + 1e-6)
    d_hi = np.empty(n_r)
    tables = np.empty((n_r, N_DELTA_SFRD))
    caps = np.empty(n_r)
    sigma_cond = sigma_table.sigma_of_lnm(np.log(ladder.m_max))
    for i in range(n_r):
        growth = ladder.growth[i]
        sc = hmf.set_scaling_constants(ladder.zpp[i], inputs).without_esc()
        dcrit = float(hmf.get_delta_crit(eff_hmf, sigma_cond[i], growth))
        d_hi[i] = dcrit * hmf.MAX_DELTAC_FRAC
        deltas = np.linspace(d_lo[i], d_hi[i], N_DELTA_SFRD)
        tables[i] = hmf.nion_conditional(
            sigma_table,
            hmf_int,
            growth,
            float(np.log(ladder.m_min[i])),
            float(np.log(ladder.m_max[i])),
            sigma_cond[i],
            deltas,
            sc.mturn_a_nofb,
            sc,
            method=inputs.astro_options.INTEGRATION_METHOD_ATOMIC,
        )
        caps[i] = (
            hmf.nion_weight(np.array([np.log(ladder.m_max[i])]), sc, sc.mturn_a_nofb)[0]
            / ladder.m_max[i]
        )
    return d_lo, d_hi, tables, caps


# next-node SFRD-table prefetch: ~0.35 s/node of pure-numpy host work that
# otherwise serializes with the device kernels.  A single worker thread
# builds the NEXT node's tables while the main thread blocks on this node's
# device execution (numpy releases the GIL, so the overlap is real even on
# one core).
_SFRD_PREFETCH: dict = {"pool": None, "futs": {}}


def prefetch_sfrd_tables(zp: float, inputs: InputParameters) -> None:
    """Start building the E-INTEGRAL per-shell SFRD tables for a future node
    on a worker thread.  No-op for source models that don't use them."""
    if inputs.matter_options.SOURCE_MODEL != "E-INTEGRAL":
        return
    import concurrent.futures

    if _SFRD_PREFETCH["pool"] is None:
        _SFRD_PREFETCH["pool"] = concurrent.futures.ThreadPoolExecutor(
            1, thread_name_prefix="sfrd-prefetch"
        )
    key = (round(float(zp), 9), inputs.full_hash)
    futs = _SFRD_PREFETCH["futs"]
    if key in futs:
        return
    if len(futs) > 4:  # stale entries (cache-resumed nodes)
        futs.clear()

    def work():
        ladder = setup_z_edges(float(zp), inputs)
        return _build_sfrd_tables(
            inputs, ladder, _get_sigma_table(inputs),
            hmf.set_scaling_constants(float(zp), inputs),
        )

    futs[key] = _SFRD_PREFETCH["pool"].submit(work)


def _sfrd_tables_for(zp, inputs, ladder, sigma_table, sc_zp):
    """The prefetched tables when available, a synchronous build otherwise."""
    fut = _SFRD_PREFETCH["futs"].pop(
        (round(float(zp), 9), inputs.full_hash), None
    )
    if fut is not None:
        return fut.result()
    return _build_sfrd_tables(inputs, ladder, sigma_table, sc_zp)


# ---------------------------------------------------------------------------
# device kernel


def _trilerp_pair(tbl_pair, t, s, g, t_ax, s_ax, g_ax):
    """Trilinear interpolation of TWO stacked tables (nt, ns, ng, 2) with ONE
    row-gather per cell: the 8 corners x 2 tables are pre-expanded into
    contiguous 32-wide rows, so each cell fetches a single 128-byte row
    instead of 16 scattered elements (grid-size gathers are row-cost-bound on
    TPU; this was 3.3 s/node).  Chunked with lax.scan to keep the padded
    (chunk, 32) gather buffer small.  Returns (out_a, out_b) on the grid."""
    shape = t.shape
    n = int(np.prod(shape))
    nt, ns, ng, _ = tbl_pair.shape

    # expanded corner table: E[i, j, k] = tbl[i:i+2, j:j+2, k:k+2, :].ravel()
    E = jnp.stack(
        [
            tbl_pair[dt:nt - 1 + dt, ds:ns - 1 + ds, dg:ng - 1 + dg, p]
            for dt in (0, 1)
            for ds in (0, 1)
            for dg in (0, 1)
            for p in (0, 1)
        ],
        axis=-1,
    ).reshape((nt - 1) * (ns - 1) * (ng - 1), 16)

    def _idx(v, lo, hi, nn):
        u = (jnp.clip(v, lo, hi) - lo) / (hi - lo) * (nn - 1)
        i0 = jnp.clip(u.astype(jnp.int32), 0, nn - 2)
        return i0.reshape(-1), (u.reshape(-1) - i0.reshape(-1))

    it, ft = _idx(t, t_ax[0], t_ax[1], nt)
    is_, fs = _idx(s, s_ax[0], s_ax[1], ns)
    ig, fg = _idx(g, g_ax[0], g_ax[1], ng)
    idx = (it * (ns - 1) + is_) * (ng - 1) + ig

    n_chunks = max(1, n // (1 << 21))
    while n % n_chunks:
        n_chunks += 1
    chunk = n // n_chunks

    def step(carry, c):
        out_a, out_b = carry
        sl = c * chunk
        ci = jax.lax.dynamic_slice_in_dim(idx, sl, chunk)
        cft = jax.lax.dynamic_slice_in_dim(ft, sl, chunk)
        cfs = jax.lax.dynamic_slice_in_dim(fs, sl, chunk)
        cfg = jax.lax.dynamic_slice_in_dim(fg, sl, chunk)
        rows = jnp.take(E, ci, axis=0, indices_are_sorted=False)  # (chunk, 16)
        wt = jnp.stack([1.0 - cft, cft], axis=-1)
        ws = jnp.stack([1.0 - cfs, cfs], axis=-1)
        wg = jnp.stack([1.0 - cfg, cfg], axis=-1)
        # row layout: ((dt*2 + ds)*2 + dg)*2 + p
        w8 = (
            wt[:, :, None, None] * ws[:, None, :, None] * wg[:, None, None, :]
        ).reshape(chunk, 8)
        va = jnp.sum(w8 * rows[:, 0::2], axis=-1)
        vb = jnp.sum(w8 * rows[:, 1::2], axis=-1)
        out_a = jax.lax.dynamic_update_slice_in_dim(out_a, va, sl, axis=0)
        out_b = jax.lax.dynamic_update_slice_in_dim(out_b, vb, sl, axis=0)
        return (out_a, out_b), None

    zero = jnp.zeros(n, jnp.float32)
    (out_a, out_b), _ = jax.lax.scan(
        step, (zero, zero), jnp.arange(n_chunks)
    )
    return out_a.reshape(shape), out_b.reshape(shape)


def _trilerp(tbl, t, s, g, t_ax, s_ax, g_ax):
    """Trilinear gather on a (nt, ns, ng) table with uniform axes given as
    (min, max) bounds (reference interpolate_heating_efficiencies,
    heating_helper_progs.c:1260-1331)."""
    def _idx(v, lo, hi, n):
        u = (jnp.clip(v, lo, hi) - lo) / (hi - lo) * (n - 1)
        i0 = jnp.clip(u.astype(jnp.int32), 0, n - 2)
        return i0, u - i0

    nt, ns, ng = tbl.shape
    it, ft = _idx(t, t_ax[0], t_ax[1], nt)
    is_, fs = _idx(s, s_ax[0], s_ax[1], ns)
    ig, fg = _idx(g, g_ax[0], g_ax[1], ng)
    out = 0.0
    for dt_ in (0, 1):
        wt = jnp.where(dt_ == 0, 1.0 - ft, ft)
        for ds_ in (0, 1):
            ws = jnp.where(ds_ == 0, 1.0 - fs, fs)
            for dg_ in (0, 1):
                wg = jnp.where(dg_ == 0, 1.0 - fg, fg)
                out = out + tbl[it + dt_, is_ + ds_, ig + dg_] * (wt * ws * wg)
    return out


@partial(
    jax.jit,
    static_argnames=(
        "shape", "box_lens", "heat_filter", "use_xray_heat", "use_cmb_heat", "lagrangian",
        "use_minihalos", "use_minihalos_lagr", "use_lw_shells", "use_lya_heat",
        "use_cheby", "const_model", "gops",
    ),
)
def _ts_shell_scan(
    density_pf,
    prev_ts,
    prev_tk,
    prev_xe,
    sfr_shells,
    xray_shells,
    sfr_mini_shells,
    sfr_lw_shells,
    sfr_mini_lw_shells,
    # per-R stacked arrays (largest index = largest R; loop order irrelevant for sums)
    r_values,
    do_filter,
    zpp_growth,
    z_edge_factor,
    xray_r_factor,
    sfrd_dlo,
    sfrd_dhi,
    sfrd_tables,
    sfrd_tables_fc,
    sfrd_caps,
    sfrd_cheby,
    sfrd_edge,
    mean_sfrd,
    tbl_heat,
    tbl_ion,
    tbl_lya,
    pref_starlya,
    pref_lya_cont,
    pref_lya_inj,
    lya_tbl_cont,
    lya_tbl_inj,
    gp_norm,
    sfrd_tables_mini,
    mean_sfrd_mini,
    pref_starlya_mini,
    pref_lya_cont_mini,
    pref_lya_inj_mini,
    pref_lw,
    pref_lw_mini,
    mcrit_box,
    mcrit_clip,
    # scalars
    inv_growth_pf,
    fstar10,
    fstar7,
    lx_ratio,
    # cell-ODE constants
    consts,
    kappa_knots,
    *,
    shape,
    box_lens,
    heat_filter,
    use_xray_heat,
    use_cmb_heat,
    lagrangian,
    use_minihalos,
    use_minihalos_lagr,
    use_lw_shells=False,
    use_lya_heat=False,
    use_cheby=False,
    const_model=False,
    gops: GridOps = SINGLE,
):
    kmag = gops.kmag(shape, box_lens)
    d_k = gops.rfft3(density_pf * inv_growth_pf)
    n_r = r_values.shape[0]

    # per-cell x_e interpolation index into the 14-point deposition-fraction axis
    xhii_grid = jnp.asarray(heating.X_INT_XHII, jnp.float32)
    xe_call = jnp.clip(prev_xe, xhii_grid[0] * 1.001, xhii_grid[-1] * 0.999)
    # comparison-sum index into the 14-point axis (searchsorted is slow on TPU)
    xidx = jnp.clip(
        jnp.sum(xe_call[..., None] >= xhii_grid[None, None, None, :], axis=-1) - 1,
        0, 12,
    )
    ival = (xe_call - xhii_grid[xidx]) / (xhii_grid[xidx + 1] - xhii_grid[xidx])

    # Filtered shells are computed INSIDE the scan step (one filter+iFFT fused
    # with its consumers per step): nothing materializes an n_R*N^3 stack in
    # HBM.  This is the reference's MINIMIZE_MEMORY execution order
    # (SpinTemperatureBox.c:1583-1609), adopted unconditionally — on TPU it is
    # also faster than hoisting, which round-trips each shell through HBM.
    if use_minihalos and not lagrangian:
        mc_k = gops.rfft3(mcrit_box)

    # scan carry: only the accumulators the static config actually uses
    # (each is a full grid; dropping the unused ones saves up to 2.1 GB at
    # 512^3 and was the difference between fitting and OOM on one 16 GB chip)
    carry_names = ["dxion", "dxlya", "dstarlya"]
    if use_xray_heat:
        carry_names.insert(0, "dxheat")
    if use_lya_heat:
        carry_names += ["dlya_cont", "dlya_inj"]
    if use_minihalos or use_minihalos_lagr:
        carry_names.append("dstarlw")

    def shell_step(carry, xs):
        acc = dict(zip(carry_names, carry))
        dxheat = acc.get("dxheat", 0.0)
        dxion = acc["dxion"]
        dxlya = acc["dxlya"]
        dstarlya = acc["dstarlya"]
        dstarlw = acc.get("dstarlw", 0.0)
        dlya_cont = acc.get("dlya_cont", 0.0)
        dlya_inj = acc.get("dlya_inj", 0.0)
        (r, do_f, growth, zfac, xr_fac, dlo, dhi, table, table_fc, cap,
         cheb_c, cheb_e,
         msfrd, th, ti, tl, p_star, p_cont, p_inj, sfr_sh, xray_sh, sfr_mini_sh,
         sfr_lw_sh, sfr_mini_lw_sh,
         table_mini, msfrd_mini, p_star_mini, p_cont_mini, p_inj_mini,
         p_lw, p_lw_mini) = xs

        if not lagrangian:
            delta0 = gops.irfft3(
                jax.lax.cond(
                    do_f,
                    lambda: filters.filter_kbox(d_k, kmag, heat_filter, r),
                    lambda: d_k,
                ),
                shape,
            )
        if use_minihalos and not lagrangian:
            # filtered log10-Mcrit shell (reference fill_Rbox_table of
            # log10_Mcrit_LW, SpinTemperatureBox.c:1464-1473; clipped below at
            # the no-feedback LW threshold)
            mc_r = jnp.maximum(
                gops.irfft3(
                    jax.lax.cond(
                        do_f,
                        lambda: filters.filter_kbox(mc_k, kmag, heat_filter, r),
                        lambda: mc_k,
                    ),
                    shape,
                ),
                mcrit_clip,
            )

        if lagrangian:
            # halo-model shells already filtered (XraySourceBox); units folded
            # on host: sfr_term dimensionless, xray_sfr in table units.
            # MCG X-rays are already inside halo_xray (get_halo_xray sums the
            # ACG + MCG luminosities), so only the Lya/LW SFR splits out.
            sfr_term = sfr_sh * zfac
            xray_sfr = xray_sh * (zfac * xr_fac)
            sfr_term_mini = sfr_mini_sh * zfac if use_minihalos_lagr else 0.0
            # LW photons travel in straight lines: under the MS Lya window
            # they get their own annulus-filtered shells
            # (SpinTemperatureBox.c:1676-1683, 1698-1706)
            if use_lw_shells:
                sfr_term_lw = sfr_lw_sh * zfac
                sfr_term_mini_lw = sfr_mini_lw_sh * zfac
            else:
                sfr_term_lw = sfr_term
                sfr_term_mini_lw = sfr_term_mini
        else:
            # aliasing clip at delta = -1 in PERTURBED-FIELD-redshift units,
            # i.e. BEFORE the 1/D(z_pf) extrapolation factor (fill_Rbox_table:
            # 619-625: `if (curr < min_value) curr = min_value;` precedes
            # `curr *= const_factor`).  delta0 here is z=0-normalized, so the
            # floor is -1/D(z_pf); clipping at -1 in these units would saturate
            # every underdense cell and flatten the Lya/X-ray flux fluctuations.
            delta0 = jnp.maximum(delta0, -inv_growth_pf)
            delta_zpp = delta0 * growth

            # conditional SFRD: log-Chebyshev Clenshaw (vector FMA) when the
            # host fit passed, table gather otherwise (see models/ionization)
            if use_cheby:
                from .ionization import CHEBY_DEG, CHEBY_X_SAFE, _clenshaw

                xch = jnp.clip(
                    (delta_zpp - dlo) / (dhi - dlo) * 2.0 - 1.0, -1.0, 1.0
                )
                flog = _clenshaw(cheb_c, jnp.minimum(xch, CHEBY_X_SAFE), CHEBY_DEG)
                blend = jnp.clip(
                    (xch - CHEBY_X_SAFE) / (1.0 - CHEBY_X_SAFE), 0.0, 1.0
                )
                fcoll = jnp.exp(flog * (1.0 - blend) + cheb_e * blend)
            else:
                t = (delta_zpp - dlo) / (dhi - dlo) * (N_DELTA_SFRD - 1)
                t = jnp.clip(t, 0.0, N_DELTA_SFRD - 1.001)
                i0 = t.astype(jnp.int32)
                frac = t - i0
                fcoll = table[i0] * (1 - frac) + table[i0 + 1] * frac
            fcoll = jnp.where(delta_zpp >= dhi, cap, fcoll)
            fcoll = jnp.maximum(fcoll, 1e-35)

            if const_model:
                # `table` holds -dfcoll/dz (the SFRD proxy); the mean fix uses
                # the plain fcoll grid vs Fcoll_General (calculate_sfrd_from_
                # grid:1061-1073: ave_sfrd accumulates fcoll, grid holds dfcoll)
                fc = table_fc[i0] * (1 - frac) + table_fc[i0 + 1] * frac
                fc = jnp.where(delta_zpp >= dhi, 1.0, fc)
                ave_fcoll = jnp.maximum(gops.mean(fc, shape), 1e-35)
            else:
                ave_fcoll = jnp.maximum(gops.mean(fcoll, shape), 1e-35)
            # form the O(1) grid/mean ratio BEFORE scaling by the global
            # expectation: the reference's avg_fix = mean_sfr_zpp/ave_fcoll
            # (SpinTemperatureBox.c:1617) is a double; in f32 it overflows to
            # inf when the shell's conditional SFRD is ~0 everywhere (e.g.
            # GAMMA-APPROX sharp cutoffs with Mturn_LW > M_atomic), and
            # inf * flushed-subnormal = NaN.  Floors sit in the f32 normal
            # range for the same reason.
            sfr_term = (
                (1.0 + delta_zpp) * (fcoll / ave_fcoll) * (zfac * msfrd * fstar10)
            )
            # L_X * s/yr and the unit conversions are folded into the tables (host)
            if use_minihalos:
                if use_cheby:
                    t = (delta_zpp - dlo) / (dhi - dlo) * (N_DELTA_SFRD - 1)
                    t = jnp.clip(t, 0.0, N_DELTA_SFRD - 1.001)
                    i0 = t.astype(jnp.int32)
                    frac = t - i0
                # bilinear (log10 Mcrit, delta) gather from the per-shell 2D
                # MCG SFRD table (reference calculate_sfrd_from_grid:1010-1060)
                tm = (jnp.clip(mc_r, MT_TS_LO, MT_TS_HI) - MT_TS_LO) / (
                    MT_TS_HI - MT_TS_LO
                ) * (N_MTURN_TS - 1)
                tm = jnp.clip(tm, 0.0, N_MTURN_TS - 1.001)
                j0 = tm.astype(jnp.int32)
                fm = tm - j0
                v00 = table_mini[j0, i0]
                v01 = table_mini[j0, i0 + 1]
                v10 = table_mini[j0 + 1, i0]
                v11 = table_mini[j0 + 1, i0 + 1]
                fcoll_mini = (v00 * (1 - frac) + v01 * frac) * (1 - fm) + (
                    v10 * (1 - frac) + v11 * frac
                ) * fm
                fcoll_mini = jnp.maximum(fcoll_mini, 1e-35)
                ave_mini = jnp.maximum(gops.mean(fcoll_mini, shape), 1e-35)
                # grid/mean ratio first — see the ACG avg_fix note above
                sfr_term_mini = (
                    (1.0 + delta_zpp) * (fcoll_mini / ave_mini)
                    * (zfac * msfrd_mini * fstar7)
                )
                xray_sfr = (sfr_term + sfr_term_mini * lx_ratio) * xr_fac
            else:
                sfr_term_mini = 0.0
                xray_sfr = sfr_term * xr_fac
            sfr_term_lw = sfr_term
            sfr_term_mini_lw = sfr_term_mini

        # frequency-integral gathers: th/ti/tl are (14,) vectors for this shell
        f_heat = th[xidx] + ival * (th[xidx + 1] - th[xidx])
        f_ion = ti[xidx] + ival * (ti[xidx + 1] - ti[xidx])
        f_lya = tl[xidx] + ival * (tl[xidx + 1] - tl[xidx])

        if use_xray_heat:
            dxheat = dxheat + xray_sfr * f_heat
        dxion = dxion + xray_sfr * f_ion
        dxlya = dxlya + xray_sfr * f_lya
        dstarlya = dstarlya + sfr_term * p_star
        if use_lya_heat:
            # continuum (n=2 band) / injected (n>=3 cascades) Ly-a split for
            # both ACG and MCG flux (reference SpinTemperatureBox.c:1730-1737)
            dlya_cont = dlya_cont + sfr_term * p_cont
            dlya_inj = dlya_inj + sfr_term * p_inj
            if use_minihalos or use_minihalos_lagr:
                dlya_cont = dlya_cont + sfr_term_mini * p_cont_mini
                dlya_inj = dlya_inj + sfr_term_mini * p_inj_mini
        if use_minihalos or use_minihalos_lagr:
            dstarlya = dstarlya + sfr_term_mini * p_star_mini
            dstarlw = dstarlw + sfr_term_lw * p_lw + sfr_term_mini_lw * p_lw_mini
        acc = dict(
            dxheat=dxheat, dxion=dxion, dxlya=dxlya, dstarlya=dstarlya,
            dstarlw=dstarlw, dlya_cont=dlya_cont, dlya_inj=dlya_inj,
        )
        return tuple(acc[n] for n in carry_names), None

    zero = jnp.zeros_like(density_pf)  # local shard shape under shard_map
    carry_out, _ = jax.lax.scan(
        shell_step,
        tuple(zero for _ in carry_names),
        (
            r_values, do_filter, zpp_growth, z_edge_factor, xray_r_factor,
            sfrd_dlo, sfrd_dhi, sfrd_tables, sfrd_tables_fc, sfrd_caps,
            sfrd_cheby, sfrd_edge,
            mean_sfrd,
            tbl_heat, tbl_ion, tbl_lya, pref_starlya, pref_lya_cont, pref_lya_inj,
            sfr_shells, xray_shells, sfr_mini_shells,
            sfr_lw_shells, sfr_mini_lw_shells,
            sfrd_tables_mini, mean_sfrd_mini, pref_starlya_mini,
            pref_lya_cont_mini, pref_lya_inj_mini, pref_lw, pref_lw_mini,
        ),
    )
    # return ONLY the accumulators this static config uses (zero-padding the
    # absent ones would materialize full grids; the cell update re-derives
    # the same name list from the same flags)
    return carry_out


@partial(
    jax.jit,
    static_argnames=(
        "shape", "box_lens", "use_xray_heat", "use_cmb_heat",
        "use_lya_heat", "use_minihalos", "use_minihalos_lagr", "gops",
    ),
)
def _ts_cell_update(
    density_pf,
    prev_ts,
    prev_tk,
    prev_xe,
    accs,
    lya_tbl_cont,
    lya_tbl_inj,
    gp_norm,
    inv_growth_pf,
    consts,
    kappa_knots,
    *,
    shape,
    box_lens,
    use_xray_heat,
    use_cmb_heat,
    use_lya_heat,
    use_minihalos,
    use_minihalos_lagr,
    gops: GridOps = SINGLE,
):
    """Per-cell x_e/Tk ODE + WF spin-temperature solve (get_Ts_fast,
    SpinTemperatureBox.c:1210-1384).  Split from the shell scan into its own
    jit so the two stages' HBM peaks don't stack (512^3 single-chip)."""
    carry_names = ["dxion", "dxlya", "dstarlya"]
    if use_xray_heat:
        carry_names.insert(0, "dxheat")
    if use_lya_heat:
        carry_names += ["dlya_cont", "dlya_inj"]
    if use_minihalos or use_minihalos_lagr:
        carry_names.append("dstarlw")
    acc = dict(zip(carry_names, accs))
    dxheat = acc.get("dxheat", 0.0)
    dxion = acc["dxion"]
    dxlya = acc["dxlya"]
    dstarlya = acc["dstarlya"]
    dstarlw = acc.get("dstarlw", None)
    dlya_cont = acc.get("dlya_cont", 0.0)
    dlya_inj = acc.get("dlya_inj", 0.0)
    # ------------------------------------------------------- per-cell update
    # NOTE: the reference's unit prefactors (xray_prefactor, volunit_inv,
    # lya_star_prefactor...) span 1e-64..1e66 individually; they are folded
    # into the host-side tables (see compute_spin_temperature) so that every
    # device-side quantity stays within float32 range.
    (zp, dzp, growth_zp, inv_growth_pf_c, dgrowth_dzp, dt_dzp, hubble_zp, trad,
     nb_zp, n_zp, xc_inverse, xa_tilde_prefactor, ts_prefactor, dcomp_prefactor,
     clump, fH, fHe, no_total, nb0_total,
     s_heat, s_ion, s_lya, s_star, s_cont, s_inj, s_lw) = consts

    delta = density_pf * (growth_zp * inv_growth_pf_c)
    delta = jnp.maximum(delta, -1.0 + FRACT_FLOAT_ERR)

    # the tables were peak-normalized for f32 on the host (dynamic-range
    # note in compute_spin_temperature); rescale each accumulator ONCE here
    dxheat_dt = dxheat * s_heat
    dxion_dt = dxion * s_ion
    dxlya_dt = dxlya * (1.0 + delta) * s_lya
    dstarlya_dt = dstarlya * s_star

    # --- x_e evolution ---
    logT = jnp.log(jnp.clip(prev_tk, 1e-2, 1e6) / 1.1604505e4)
    alpha_a = jnp.exp(
        -28.6130338
        - 0.72411256 * logT
        - 2.02604473e-2 * logT**2
        - 2.38086188e-3 * logT**3
        - 3.21260521e-4 * logT**4
        - 1.42150291e-5 * logT**5
        + 4.98910892e-6 * logT**6
        + 5.75561414e-7 * logT**7
        - 1.85676704e-8 * logT**8
        - 3.07113524e-9 * logT**9
    )
    dxion_sink = alpha_a * clump * prev_xe * prev_xe * fH * nb_zp * (1.0 + delta)
    dxe_dzp = dt_dzp * (dxion_dt - dxion_sink)
    x_e = jnp.clip(prev_xe + dxe_dzp * dzp, 0.0, 1.0 - FRACT_FLOAT_ERR)

    # --- Tk evolution ---
    dadia = 3.0 / (1.0 + zp) + jnp.where(
        jnp.abs(delta) > FRACT_FLOAT_ERR,
        dgrowth_dzp / (growth_zp * (1.0 / delta + 1.0)),
        0.0,
    )
    dadia = dadia * (2.0 / 3.0) * prev_tk
    dspec = -dxe_dzp * prev_tk / (1.0 + prev_xe)
    dcomp = dcomp_prefactor * (prev_xe / (1.0 + prev_xe + fHe)) * (trad - prev_tk)
    # 1/k_B is folded into tbl_heat on the host (see the fold note in
    # compute_spin_temperature) so the f32 heat table cannot denormal-flush
    dxheat_dzp = (
        dxheat_dt * dt_dzp * 2.0 / 3.0 / (1.0 + prev_xe)
        if use_xray_heat
        else 0.0
    )
    dcmb = 0.0
    if use_cmb_heat:
        eps_cmb = (
            (3.0 / 4.0)
            * (trad / physconst.T_21)
            * physconst.A10
            * fH
            * (physconst.h_p**2 / physconst.lambda_21**2 / physconst.m_p)
            * (1.0 + 2.0 * prev_tk / physconst.T_21)
        )
        dcmb = (
            -eps_cmb
            * (2.0 / 3.0 / physconst.k_B / (1.0 + prev_xe))
            / hubble_zp
            / (1.0 + zp)
        )

    dlya = 0.0
    if use_lya_heat:
        # Ly-a heating (reference SpinTemperatureBox.c:1270-1293): the energy
        # transfer per photon crossing the resonance is gathered from the
        # Fokker-Planck tables at (prev_Tk, prev_Ts, tau_GP); the tables come
        # in pre-scaled by 4 pi nu_a/(c n_b (1+zp)) * 2/(3 k_B) so the device
        # term is just flux * dE / ((1+delta)(1+x_e)).
        from .lya_heating import LOG_GP_MAX, LOG_GP_MIN, LOG_T_MAX, LOG_T_MIN

        taugp = gp_norm * (1.0 + delta) * (1.0 - prev_xe)
        lt = jnp.log10(jnp.clip(prev_tk, 10.0**LOG_T_MIN, 10.0**LOG_T_MAX))
        ls = jnp.log10(jnp.clip(prev_ts, 10.0**LOG_T_MIN, 10.0**LOG_T_MAX))
        lg = jnp.log10(jnp.clip(taugp, 10.0**LOG_GP_MIN, 10.0**LOG_GP_MAX))
        t_ax = (LOG_T_MIN, LOG_T_MAX)
        g_ax = (LOG_GP_MIN, LOG_GP_MAX)
        tbl_pair = jnp.stack([lya_tbl_cont, lya_tbl_inj], axis=-1)
        e_cont, e_inj = _trilerp_pair(tbl_pair, lt, ls, lg, t_ax, t_ax, g_ax)
        dlya = -(dlya_cont * s_cont * e_cont + dlya_inj * s_inj * e_inj) / (
            (1.0 + delta) * (1.0 + prev_xe)
        )

    dtk_total = dxheat_dzp + dcomp + dspec + dadia + dcmb + dlya
    tk = jnp.where(prev_tk < MAX_TK, prev_tk + dtk_total * dzp, prev_tk)
    tk = jnp.where(tk < 0, trad, tk)

    # --- spin temperature (WF + collisional couplings) ---
    tau21 = (
        (3 * physconst.h_p * physconst.A10 * physconst.c_cms * physconst.lambda_21**2
         / 32.0 / np.pi / physconst.k_B)
        * ((1.0 - prev_xe) * n_zp)
        / prev_ts
        / hubble_zp
    )
    xcmb = jnp.where(
        tau21 > 1e-8,
        (1.0 - jnp.exp(-tau21)) / jnp.maximum(tau21, 1e-30),
        1.0 - tau21 / 2 * (1 - tau21 / 3 * (1 - tau21 / 4)),
    )

    hh_t, hh_k, eh_t, eh_k, ph_t, ph_k = kappa_knots
    log_tk = jnp.log(jnp.clip(tk, 1.0, 1e12))

    def _small_interp(x, xs, ys):
        # piecewise-linear interp over a SMALL non-uniform knot table via
        # vectorized comparisons (jnp.interp's searchsorted is pathologically
        # slow on TPU at grid scale)
        n = xs.shape[0]
        idx = jnp.sum(x[..., None] >= xs[None, :], axis=-1)
        i0 = jnp.clip(idx - 1, 0, n - 2)
        x0_, x1_ = xs[i0], xs[i0 + 1]
        y0_, y1_ = ys[i0], ys[i0 + 1]
        f = jnp.clip((x - x0_) / (x1_ - x0_), 0.0, 1.0)
        return y0_ * (1.0 - f) + y1_ * f

    def interp_kappa(logt_knots, logk_knots, logT, hh_slope=None):
        out = _small_interp(logT, logt_knots, logk_knots)
        if hh_slope is not None:
            # power-law extrapolation above the last knot (kappa_10:439-442)
            out = jnp.where(
                logT > logt_knots[-1],
                logk_knots[-1] + hh_slope * (logT - logt_knots[-1]),
                out,
            )
        else:
            slope = (logk_knots[-1] - logk_knots[-2]) / (logt_knots[-1] - logt_knots[-2])
            out = jnp.where(
                logT > logt_knots[-1],
                logk_knots[-1] + slope * (logT - logt_knots[-1]),
                out,
            )
        return jnp.exp(out)

    kappa_hh = interp_kappa(hh_t, hh_k, log_tk, hh_slope=0.381)
    kappa_eh = interp_kappa(eh_t, eh_k, log_tk)
    kappa_ph = interp_kappa(ph_t, ph_k, log_tk)

    xc = (
        (1.0 + delta)
        * xc_inverse
        * ((1.0 - x_e) * no_total * kappa_hh + x_e * nb0_total * kappa_eh + x_e * no_total * kappa_ph)
    )

    j_alpha = dstarlya_dt + dxlya_dt
    t_inv = 1.0 / tk
    t_inv_sq = t_inv * t_inv
    xi = ts_prefactor * jnp.cbrt((1.0 + delta) * (1.0 - x_e) * t_inv_sq)
    xa_arg = (
        xa_tilde_prefactor
        * j_alpha
        / (1.0 + 2.98394 * xi + 1.53583 * xi**2 + 3.85289 * xi**3)
    )

    def wf_iteration(ts, _):
        ts_inv = 1.0 / ts
        xa = (
            1.0
            - 0.0631789 * t_inv
            + 0.115995 * t_inv_sq
            - 0.401403 * t_inv * ts_inv
            + 0.336463 * t_inv_sq * ts_inv
        ) * xa_arg
        ts_new = (xcmb + xa + xc) / (
            xcmb / trad + xa * (t_inv + 0.405535 * t_inv * ts_inv - 0.405535 * t_inv_sq)
            + xc * t_inv
        )
        return ts_new, None

    ts_wf, _ = jax.lax.scan(wf_iteration, jnp.full_like(density_pf, trad), None, length=10)
    ts_coll = (xcmb + xc) / (xcmb / trad + xc * t_inv)
    ts = jnp.where(j_alpha > 1e-20, ts_wf, ts_coll)
    ts = jnp.abs(ts)

    if dstarlw is not None:
        dstarlw = dstarlw * s_lw
    return ts, tk, x_e, j_alpha, dstarlw


# ---------------------------------------------------------------------------
# public entry


def _init_first_ts(redshift, inputs, perturbed_field):
    """First snapshot / z >= Z_HEAT_MAX: RECFAST-like adiabatic state
    (reference init_first_Ts:892-926)."""
    cosmo = inputs.cosmology
    rec = RecombinationHistory(cosmo)
    xe = float(rec.x_e(redshift))
    tk = float(rec.Tk(redshift))
    # adiabatic Tk fluctuations at init, gated like the reference
    # (init_first_Ts, SpinTemperatureBox.c:900-904)
    ct_ad = (
        float(rec.cT_approx(redshift))
        if inputs.astro_options.USE_ADIABATIC_FLUCTUATIONS
        else 0.0
    )
    growth_zp = float(cosmo.dicke(redshift))
    inv_growth_pf = 1.0 / float(cosmo.dicke(float(perturbed_field.redshift)))

    dens = perturbed_field.density * jnp.float32(growth_zp * inv_growth_pf)
    tk_box = jnp.float32(tk) * (1.0 + jnp.float32(ct_ad) * dens)

    # collisional-only Ts (get_Ts with Jalpha=0, heating_helper:738-740)
    trad = physconst.T_cmb * (1 + redshift)
    no = cosmo.N_b0 * (1 - cosmo.Y_He) / (
        (1 - cosmo.Y_He) + cosmo.Y_He / 4
    )  # hydrogen only
    no = cosmo.rho_crit_cgs * cosmo.OMb * (1 - cosmo.Y_He) / physconst.m_p
    nb0 = cosmo.N_b0

    kt = heating.kappa_tables()
    kap_hh = np.exp(np.interp(np.log(np.maximum(tk, 1.0)), kt["HH"][0], kt["HH"][1]))
    kap_eh = np.exp(np.interp(np.log(np.maximum(tk, 1.0)), kt["eH"][0], kt["eH"][1]))
    kap_ph = np.exp(np.interp(np.log(np.maximum(tk, 1.0)), kt["pH"][0], kt["pH"][1]))
    zp3 = (1.0 + redshift) ** 3

    nH = (1 - xe) * no * zp3 * (1.0 + dens)
    ne = xe * nb0 * zp3 * (1.0 + dens)
    npr = xe * no * zp3 * (1.0 + dens)
    xc = (
        physconst.T_21
        / trad
        * (nH * kap_hh + ne * kap_eh + npr * kap_ph)
        / physconst.A10
    )
    ts = (1.0 + xc) / (1.0 / trad + xc / tk_box)

    box = TsBox(
        redshift=np.float32(redshift),
        spin_temperature=ts.astype(jnp.float32),
        xray_ionised_fraction=jnp.full_like(dens, xe),
        kinetic_temp_neutral=tk_box.astype(jnp.float32),
        J_21_LW=(
            jnp.zeros_like(dens)
            if inputs.astro_options.USE_MINI_HALOS
            else None
        ),
    )
    return box, box


def compute_spin_temperature(
    redshift: float,
    inputs: InputParameters,
    perturbed_field: PerturbedField,
    prev_state: TsBox | None = None,
    prev_redshift: float | None = None,
    initial_conditions=None,
    source_box: XraySourceBox | None = None,
    previous_ionized_box=None,
    mesh=None,
):
    """Compute the TsBox at `redshift`, evolving from the previous snapshot.

    Returns (ts_box, state); `state` is passed back as `prev_state`."""
    so = inputs.simulation_options
    ao = inputs.astro_options
    ap = inputs.astro_params
    cosmo = inputs.cosmology
    shape = so.lowres_shape
    box_lens = so.box_lens

    if prev_state is None or redshift >= so.Z_HEAT_MAX:
        return _init_first_ts(redshift, inputs, perturbed_field)

    if prev_redshift is None:
        prev_redshift = (1 + redshift) * so.ZPRIME_STEP_FACTOR - 1

    lagrangian = source_box is not None
    # CONST-ION-EFF: SFRD from the fcoll redshift derivative, not the
    # scaling-relation Nion integrals (reference calculate_sfrd_from_grid:
    # 1061-1067, global_reion_properties:927-943)
    const_model = (
        not lagrangian
        and inputs.matter_options.SOURCE_MODEL == "CONST-ION-EFF"
    )

    # ---------------- host-side setup ----------------
    ladder = setup_z_edges(redshift, inputs)
    n_r = len(ladder.R)
    sigma_table = _get_sigma_table(inputs)
    sc_zp = hmf.set_scaling_constants(redshift, inputs)
    sc_sfrd = sc_zp.without_esc()
    hmf_int = hmf.HMF_NAMES[inputs.matter_options.HMF]

    spec = spectral_prefactors(redshift, ladder, inputs)
    starlya_pref = spec["starlya"]
    lya_cont_pref = spec["cont"]
    lya_inj_pref = spec["inj"]
    starlya_mini_pref = spec["starlya_mini"]
    lya_cont_mini_pref = spec["cont_mini"]
    lya_inj_mini_pref = spec["inj_mini"]
    lw_pref = spec["lw"]
    lw_mini_pref = spec["lw_mini"]

    # global Nion(z) for the tau_X filling factor + mean SFRD per shell
    z_grid = np.linspace(redshift * 0.999, ladder.zpp[-1] * 1.001, 128)
    ln_mmin_zp = np.log(hmf.minimum_source_mass(redshift, inputs, xray=True))
    ln_mmax = np.log(hmf.M_MAX_INTEGRAL)
    if const_model:
        # constant ionizing efficiency: Nion == fcoll, zeta == HII_EFF_FACTOR
        # (reference global_reion_properties:985-991)
        nion_vals = np.array(
            [
                hmf.fcoll_general(sigma_table, cosmo, hmf_int, z, ln_mmin_zp, ln_mmax)
                for z in z_grid
            ]
        )
    else:
        nion_vals = np.array(
            [
                hmf.nion_general(sigma_table, cosmo, hmf_int, z, ln_mmin_zp, ln_mmax,
                                 sc_zp.mturn_a_nofb, sc_zp)
                for z in z_grid
            ]
        )

    def nion_of_z(z):
        return np.interp(z, z_grid, nion_vals)

    if const_model:
        # EvaluateSFRD for SOURCE_MODEL=CONST-ION-EFF is Fcoll_General over
        # [minimum_source_mass(zpp, xray), M_MAX] (interp_tables.c:923-943)
        mean_sfrd = np.array(
            [
                hmf.fcoll_general(
                    sigma_table, cosmo, hmf_int, ladder.zpp[i],
                    float(np.log(ladder.m_min[i])), ln_mmax,
                )
                for i in range(n_r)
            ]
        )
    else:
        mean_sfrd = np.array(
            [
                hmf.nion_general(
                    sigma_table, cosmo, hmf_int, ladder.zpp[i],
                    float(np.log(ladder.m_min[i])), ln_mmax,
                    sc_sfrd.mturn_a_nofb, sc_sfrd,
                )
                for i in range(n_r)
            ]
        )

    x_e_ave = float(jnp.mean(prev_state.xray_ionised_fraction))
    if const_model:
        ion_eff = float(inputs.astro_params.HII_EFF_FACTOR)
    else:
        ion_eff = sc_zp.pop2_ion * sc_zp.fstar_10 * sc_zp.fesc_10

    # minihalo feedback state needed ahead of the tau_X horizons: per-cell
    # log10-Mcrit box (Eulerian) or the per-shell halobox means (Lagrangian)
    use_minihalos = ao.USE_MINI_HALOS and not lagrangian
    mcrit_box = jnp.zeros(shape, jnp.float32)
    mcrit_clip = 0.0
    ave_mcrit = 0.0
    if use_minihalos:
        j21_box = (
            prev_state.J_21_LW
            if prev_state.J_21_LW is not None
            else jnp.zeros(shape, jnp.float32)
        )
        vcb = (
            initial_conditions.lowres_vcb
            if (initial_conditions is not None
                and getattr(initial_conditions, "lowres_vcb", None) is not None)
            else jnp.full(shape, jnp.float32(sc_zp.vcb_const))
        )
        # full feedback turnover: LW + streaming + Sobacchi-Mesinger
        # reionization feedback when the previous IonizedBox is available
        from .ionization import _mcrit_kernel

        prev_g12 = (
            previous_ionized_box.ionisation_rate_G12
            if previous_ionized_box is not None
            else jnp.zeros(shape, jnp.float32)
        )
        prev_zre = (
            previous_ionized_box.z_reion
            if previous_ionized_box is not None
            else jnp.full(shape, -1.0, jnp.float32)
        )
        _, mcrit_box = _mcrit_kernel(
            prev_g12, prev_zre, j21_box,
            jnp.float32(redshift),
            jnp.float32(sc_zp.mturn_a_nofb),
            jnp.float32(sc_zp.mturn_m_nofb),
            vcb,
            jnp.float32(ap.A_LW), jnp.float32(ap.BETA_LW),
            jnp.float32(ap.A_VCB), jnp.float32(ap.BETA_VCB),
            jnp.float32(sc_zp.v_cb_avg * np.sqrt(3.0 * np.pi / 8.0)),
        )
        mcrit_clip = float(np.log10(hmf.lyman_werner_threshold(redshift, 0.0, 0.0, ap)))
        ave_mcrit = float(jnp.mean(mcrit_box))

    # MCG contribution to the tau_X filling factor (nu_tau_one_MINI,
    # heating_helper_progs.c:901-941 + fill_freqint_tables:838): per shell,
    # the global MCG Nion(z) at that shell's mean LW turnover mass.  The
    # Eulerian per-shell filtered average equals the box average (the annulus
    # filter preserves the mean); the Lagrangian means come from the halobox
    # nodes via the source box (ts_main:1481).
    nion_mini_shells = [None] * n_r
    ion_eff_mini = 0.0
    has_lagr_mcrit = (source_box is not None
                      and source_box.mean_log10_Mcrit_LW is not None)
    if ao.USE_MINI_HALOS and not const_model and (not lagrangian or has_lagr_mcrit):
        # Lagrangian mode without per-shell halobox Mcrit means carries no
        # minihalo information at all — the shell path treats that case as
        # "no minihalos" (use_minihalos_lagr=False below), so the MCG tau_X
        # term is skipped too rather than run at an unphysical Mturn.
        ion_eff_mini = sc_zp.pop3_ion * sc_zp.fstar_7 * sc_zp.fesc_7
        if lagrangian:
            shell_mcrit = np.asarray(source_box.mean_log10_Mcrit_LW, np.float64)
        else:
            shell_mcrit = np.full(n_r, max(ave_mcrit, mcrit_clip))
        zg_mini = np.linspace(redshift * 0.999, ladder.zpp[-1] * 1.001, 48)
        _curves = {}
        for i in range(n_r):
            key = round(float(shell_mcrit[i]), 3)
            if key not in _curves:
                mt = 10.0 ** key
                vals = np.array([
                    hmf.nion_general_mini(
                        sigma_table, cosmo, hmf_int, z,
                        float(np.log(hmf.minimum_source_mass(z, inputs, xray=True))),
                        ln_mmax, mt, sc_zp,
                    )
                    for z in zg_mini
                ])
                _curves[key] = lambda zz, v=vals: np.interp(zz, zg_mini, v)
            nion_mini_shells[i] = _curves[key]

    # tau_X = 1 horizons and frequency-integral tables.  Single-cell (0-D
    # global evolution) runs zero the collapsed fractions in the tau_X
    # integrand while <x_e> is still tiny, exactly like the reference
    # (tauX_integrand, heating_helper_progs.c:914-923: HII_DIM==1 &&
    # x_e_ave < MIN_XE_FOR_FCOLL_IN_TAUX -> fcoll = fcoll_MINI = 0).
    zero_fcoll_in_tau = (
        inputs.simulation_options.HII_DIM == 1
        and x_e_ave < inputs.simulation_options.MIN_XE_FOR_FCOLL_IN_TAUX
    )
    nion_of_z_tau = (lambda z: np.zeros_like(np.asarray(z, np.float64))) \
        if zero_fcoll_in_tau else nion_of_z
    nu_th = ap.NU_X_THRESH * physconst.eV_to_Hz
    lower_limits = np.array(
        [
            max(
                heating.nu_tau_one(
                    redshift, ladder.zpp[i], x_e_ave, nion_of_z_tau, ion_eff,
                    cosmo.N_b0, cosmo.dtdz, cosmo.Y_He,
                    nion_mini_of_z=None if zero_fcoll_in_tau else nion_mini_shells[i],
                    ion_eff_mini=0.0 if zero_fcoll_in_tau else ion_eff_mini,
                ),
                nu_th,
            )
            for i in range(n_r)
        ]
    )
    tbl_heat, tbl_ion, tbl_lya = heating.freq_integrals(
        redshift, heating.X_INT_XHII, lower_limits, ap, cosmo.Y_He
    )

    # conditional SFRD tables (density path only)
    use_cheby = False
    sfrd_cheby = np.zeros((n_r, 17))
    sfrd_edge = np.zeros(n_r)
    sfrd_tables_fc = np.zeros((n_r, 2))
    if lagrangian:
        d_lo = np.zeros(n_r)
        d_hi = np.ones(n_r)
        sfrd_tables = np.zeros((n_r, N_DELTA_SFRD))
        sfrd_caps = np.zeros(n_r)
        mean_sfrd = np.zeros(n_r)
        # Lagrangian shells carry SFR density directly (ts_main:1570-1572)
        z_edge_factor = np.abs(ladder.dzpp * ladder.dtdz)
    elif const_model:
        # CONST-ION-EFF: per-shell closed-form EPS tables of fcoll (for the
        # mean fix) and -dfcoll/dz (the SFRD; calculate_sfrd_from_grid:
        # 1061-1067); z_edge_factor is just the shell dz (ts_main:1566-1567)
        d_lo = np.full(n_r, -1.0 + 1e-6)
        d_hi = np.empty(n_r)
        sfrd_tables = np.empty((n_r, N_DELTA_SFRD))
        sfrd_tables_fc = np.empty((n_r, N_DELTA_SFRD))
        sfrd_caps = np.empty(n_r)
        sigma_cond_r = sigma_table.sigma_of_lnm(np.log(ladder.m_max))
        sigma_min_r = sigma_table.sigma_of_lnm(np.log(ladder.m_min))
        for i in range(n_r):
            d_hi[i] = physconst.delta_c_sph * hmf.MAX_DELTAC_FRAC
            deltas = np.linspace(d_lo[i], d_hi[i], N_DELTA_SFRD)
            sfrd_tables[i] = -hmf.dfcoll_dz(
                cosmo, float(ladder.zpp[i]), deltas, sigma_min_r[i], sigma_cond_r[i]
            )
            sfrd_tables_fc[i] = hmf.fcoll_conditional_eps(
                float(ladder.growth[i]), deltas, sigma_min_r[i], sigma_cond_r[i]
            )
            sfrd_caps[i] = sfrd_tables[i][-1]
        z_edge_factor = np.abs(ladder.dzpp)
    else:
        d_lo, d_hi, sfrd_tables, sfrd_caps = _sfrd_tables_for(
            redshift, inputs, ladder, sigma_table, sc_zp
        )
        from .ionization import CHEBY_DEG, _fit_log_cheby

        sfrd_cheby = np.zeros((n_r, CHEBY_DEG + 1))
        sfrd_cheby, sfrd_edge, use_cheby = _fit_log_cheby(sfrd_tables, sfrd_caps)
        # z-edge factors (ts_main:1566-1572, E-INTEGRAL branch)
        z_edge_factor = np.abs(ladder.dzpp * ladder.dtdz) * np.asarray(
            cosmo.hubble(ladder.zpp)
        ) / ap.t_STAR
    xray_r_factor = (1 + ladder.zpp) ** (-ap.X_RAY_SPEC_INDEX)

    # minihalo (MCG) SFRD: per-cell log10-Mcrit box (LW + streaming feedback,
    # built above ahead of the tau_X horizons) filtered per shell in the
    # kernel, gathered from 2D (Mcrit, delta) tables (reference
    # fill_Rbox_table of log10_Mcrit_LW + calculate_sfrd_from_grid)
    sfrd_tables_mini = np.zeros((n_r, 2, N_DELTA_SFRD))
    mean_sfrd_mini = np.zeros(n_r)
    if use_minihalos:
        mturn_axis = np.linspace(MT_TS_LO, MT_TS_HI, N_MTURN_TS)
        sfrd_tables_mini = np.zeros((n_r, N_MTURN_TS, N_DELTA_SFRD))
        hmf_i = hmf.HMF_NAMES[inputs.matter_options.HMF]
        for i in range(n_r):
            zpp = float(ladder.zpp[i])
            sc_pp = hmf.set_scaling_constants(zpp, inputs).without_esc()
            sigma_cond = float(sigma_table.sigma_of_lnm(np.log(ladder.m_max[i])))
            deltas = np.linspace(d_lo[i], d_hi[i], N_DELTA_SFRD)
            # single CMF evaluation matmul'd against the Mturn weight matrix
            # (see hmf.build_nion_mturn_tables) — the round-1 host bottleneck
            sfrd_tables_mini[i] = hmf.build_nion_mturn_tables(
                sigma_table, hmf_i, ladder.growth[i],
                float(np.log(ladder.m_min[i])),
                float(np.log(ladder.m_max[i])), sigma_cond, deltas,
                mturn_axis, sc_pp, mini=True,
                method=inputs.astro_options.INTEGRATION_METHOD_MINI,
            )
            mean_sfrd_mini[i] = hmf.nion_general_mini(
                sigma_table, cosmo, hmf_i, zpp,
                float(np.log(ladder.m_min[i])), np.log(hmf.M_MAX_INTEGRAL),
                10.0 ** max(ave_mcrit, mcrit_clip), sc_pp,
            )

    # ---------------- per-snapshot constants (set_zp_consts:1098-1183) -------
    zp = redshift
    dzp = zp - prev_redshift
    growth_zp = float(cosmo.dicke(zp))
    inv_growth_pf = 1.0 / float(cosmo.dicke(float(perturbed_field.redshift)))
    hubble_zp = float(cosmo.hubble(zp))
    trad = physconst.T_cmb * (1 + zp)

    if abs(ap.X_RAY_SPEC_INDEX - 1.0) < 1e-6:
        lum_conv = 1.0 / (nu_th * np.log(ap.NU_X_BAND_MAX / ap.NU_X_THRESH))
    else:
        lum_conv = (ap.NU_X_BAND_MAX * physconst.eV_to_Hz) ** (1 - ap.X_RAY_SPEC_INDEX) - (
            nu_th
        ) ** (1 - ap.X_RAY_SPEC_INDEX)
        lum_conv = (1.0 / lum_conv) * nu_th ** (-ap.X_RAY_SPEC_INDEX) * (
            1 - ap.X_RAY_SPEC_INDEX
        )
    lum_conv /= physconst.h_p
    xray_prefactor = (
        lum_conv / nu_th * physconst.c_cms * (1 + zp) ** (ap.X_RAY_SPEC_INDEX + 3)
    )

    no_total = cosmo.rho_crit_cgs * cosmo.OMb * (1 - cosmo.Y_He) / physconst.m_p
    nb0_total = cosmo.N_b0
    nb_zp = nb0_total * (1 + zp) ** 3
    n_zp = no_total * (1 + zp) ** 3
    lya_star_prefactor = (
        physconst.c_cms / (4 * np.pi) * physconst.Msun / physconst.m_p
        * (1 - 0.75 * cosmo.Y_He)
    )
    volunit_inv = cosmo.OMb * cosmo.rho_crit / physconst.cm_per_Mpc**3

    ts_prefactor = (1e-7 * (1.342881e-7 / hubble_zp) * no_total * (1 + zp) ** 3) ** (1 / 3)
    gamma_alpha = physconst.f_alpha * (
        physconst.nu_Ly_alpha * physconst.e_charge / (physconst.c_cms / 10.0)
    ) ** 2
    gamma_alpha /= (
        6.0 * (physconst.m_e / 1000.0) * (physconst.c_cms / 100.0) ** 3 * physconst.vac_perm
    )
    xa_tilde_prefactor = (
        8.0 * np.pi * (physconst.lambda_Ly_alpha * 1e-8) ** 2 * gamma_alpha * physconst.T_21
    ) / (9.0 * physconst.A10 * trad)
    xc_inverse = (1 + zp) ** 3 * physconst.T_21 / (trad * physconst.A10)
    dcomp_prefactor = (
        -1.51e-4 / (hubble_zp / (cosmo.hlittle * 3.2407e-18)) / cosmo.hlittle
        * trad**4 / (1 + zp)
    )
    fH = heating.h_frac(cosmo.Y_He)
    fHe = heating.he_frac(cosmo.Y_He)
    dgrowth_dzp = float(cosmo.ddicke_dz(zp))
    dt_dzp = float(cosmo.dtdz(zp))

    # Fold unit conversions into the tables (f64 on host) so all device-side
    # scalars are float32-safe: the raw prefactors span ~1e-64..1e66.
    # NOTE on the 1/k_B fold: the heating frequency integral is ~1e-15 in raw
    # units, 9-11 orders below the ion/lya integrals, and the Lagrangian
    # branch's folded heat table landed at ~1e-43 — below float32's normal
    # range, so XLA's denormal flushing silently ZEROED all X-ray heating for
    # every Lagrangian-source Ts run (Tk ran ~0.5 K cold by z=18, the
    # mini-family Tb parity gap).  Folding the consumer's 1/k_B (7.2e15)
    # here keeps the f32 table comfortably normal in both branches; the
    # device-side Tk update (dxheat_dzp) no longer divides by k_B.
    if lagrangian:
        # halo grids are Msun/s/Mpc^3 (SFR) and 1e38 erg/s/Mpc^3 (X-ray);
        # the emissivity-to-per-baryon conversion is 1/cm_per_Mpc^3
        # (set_zp_consts:1171-1175)
        volunit_inv = physconst.cm_per_Mpc**-3
        xray_norm = xray_prefactor * volunit_inv * 1e38
        lya_norm = lya_star_prefactor * volunit_inv
        tbl_heat = tbl_heat * (xray_norm / physconst.k_B)
        tbl_ion = tbl_ion * xray_norm
        tbl_lya = tbl_lya * (xray_norm * nb_zp)
        starlya_pref = starlya_pref * lya_norm
    else:
        xray_norm = xray_prefactor * volunit_inv
        lya_norm = lya_star_prefactor * volunit_inv
        lx_lin = ap.l_x * physconst.s_per_yr  # L_X * s/yr
        tbl_heat = tbl_heat * (xray_norm * lx_lin / physconst.k_B)
        tbl_ion = tbl_ion * (xray_norm * lx_lin)
        tbl_lya = tbl_lya * (xray_norm * lx_lin * nb_zp)  # (1+delta) applied on device
        starlya_pref = starlya_pref * lya_norm

    # --- Ly-a heating tables (Fokker-Planck, see models/lya_heating.py) ---
    use_lya_heat = bool(ao.USE_LYA_HEATING)
    if use_lya_heat:
        from . import lya_heating

        lht = lya_heating.get_lya_heat_tables()
        # fold 4 pi nu_a / (c n_b (1+zp)) * 2/(3 k_B) into the dE tables
        # (reference Ndot_alpha_* and eps_Lya_*, SpinTemperatureBox.c:1283-1293)
        e_norm = (
            4.0 * np.pi * physconst.nu_Ly_alpha
            / (physconst.c_cms * nb_zp * (1.0 + zp))
            * 2.0 / (3.0 * physconst.k_B)
        )
        lya_tbl_cont = jnp.asarray(lht.de_cont * e_norm, jnp.float32)
        lya_tbl_inj = jnp.asarray(lht.de_inj * e_norm, jnp.float32)
        gp_norm = lya_heating.gunn_peterson_coef() / hubble_zp * n_zp
        lya_cont_pref = lya_cont_pref * lya_norm
        lya_inj_pref = lya_inj_pref * lya_norm
        lya_cont_mini_pref = lya_cont_mini_pref * lya_norm
        lya_inj_mini_pref = lya_inj_mini_pref * lya_norm
    else:
        lya_tbl_cont = jnp.zeros((2, 2, 2), jnp.float32)
        lya_tbl_inj = jnp.zeros((2, 2, 2), jnp.float32)
        gp_norm = 0.0
        lya_cont_pref = np.zeros_like(lya_cont_pref)
        lya_inj_pref = np.zeros_like(lya_inj_pref)
        lya_cont_mini_pref = np.zeros_like(lya_cont_mini_pref)
        lya_inj_mini_pref = np.zeros_like(lya_inj_mini_pref)

    consts = tuple(
        jnp.float32(v)
        for v in (
            zp, dzp, growth_zp, inv_growth_pf, dgrowth_dzp, dt_dzp, hubble_zp, trad,
            nb_zp, n_zp, xc_inverse, xa_tilde_prefactor, ts_prefactor,
            dcomp_prefactor, ap.CLUMPING_FACTOR, fH, fHe, no_total, nb0_total,
        )
    )

    kt = heating.kappa_tables()
    kappa_knots = tuple(
        jnp.asarray(a, jnp.float32)
        for a in (kt["HH"][0], kt["HH"][1], kt["eH"][0], kt["eH"][1], kt["pH"][0], kt["pH"][1])
    )

    cell_R = physconst.l_factor * so.box_len / so.HII_DIM
    # Shell-filter radius attribution (debug/validation knob): the flux from
    # shell [R_inner, R] physically carries structure at scales between the
    # two edges; "outer" (reference fill_Rbox_table) over-smooths at coarse
    # N_STEP_TS and converges to the continuum from below.
    if _FILTER_RADIUS_MODE == "inner":
        filter_R = np.where(ladder.R_inner > 0, ladder.R_inner, ladder.R)
    elif _FILTER_RADIUS_MODE == "mid":
        filter_R = np.sqrt(np.maximum(ladder.R_inner, cell_R / 10.0) * ladder.R)
    else:
        filter_R = ladder.R
    do_filter = filter_R > cell_R

    use_minihalos_lagr = False
    use_lw_shells = False
    shell_ph = jnp.zeros((n_r, 1, 1, 1), jnp.float32)
    sfr_lw_shells = sfr_mini_lw_shells = shell_ph
    if lagrangian:
        sfr_shells = source_box.filtered_sfr
        xray_shells = source_box.filtered_xray
        if ao.USE_MINI_HALOS and source_box.filtered_sfr_mini is not None:
            use_minihalos_lagr = True
            sfr_mini_shells = source_box.filtered_sfr_mini
            if source_box.filtered_sfr_lw is not None:
                # straight-line LW shells (MS + minihalos only)
                use_lw_shells = True
                sfr_lw_shells = source_box.filtered_sfr_lw
                sfr_mini_lw_shells = source_box.filtered_sfr_mini_lw
        else:
            sfr_mini_shells = shell_ph
    else:
        sfr_shells = shell_ph
        xray_shells = shell_ph
        sfr_mini_shells = shell_ph

    # ---- f32 dynamic-range normalization -----------------------------------
    # The folded tables/prefactors can land anywhere in ~[1e-44, 1e0]
    # depending on the units branch and astro params — the Lagrangian heat
    # table once folded to ~1e-43 and was silently denormal-flushed to zero
    # on device (ZERO X-ray heating for every Lagrangian Ts run; the
    # mini-family Tb parity gap).  Normalize each group to peak 1.0 for the
    # f32 kernels and hand the true peaks to _ts_cell_update via `consts`;
    # each accumulator is rescaled exactly once on consumption.  Groups that
    # add into the same accumulator (ACG + MCG prefactor pairs) share one
    # scale.
    starlya_mini_f = starlya_mini_pref * lya_norm
    lw_f = lw_pref * lya_norm * physconst.h_p * 1e21
    lw_mini_f = lw_mini_pref * lya_norm * physconst.h_p * 1e21

    def _norm_group(*arrs):
        peak = max(float(np.max(np.abs(np.asarray(a, np.float64)))) for a in arrs)
        if peak > 1e37:
            raise FloatingPointError(
                f"folded Ts table peaks at {peak:.2e} — beyond float32 range;"
                " rebalance the unit folding (see the fold note above)"
            )
        if peak < 1e-37:
            # the whole group is numerically negligible even after descale
            # (~40 orders below the signal terms); zero it explicitly rather
            # than let the device flush it
            return tuple(
                np.zeros_like(np.asarray(a, np.float64)) for a in arrs
            ) + (0.0,)
        return tuple(np.asarray(a, np.float64) / peak for a in arrs) + (peak,)

    tbl_heat, s_heat = _norm_group(tbl_heat)
    tbl_ion, s_ion = _norm_group(tbl_ion)
    tbl_lya, s_lya = _norm_group(tbl_lya)
    starlya_pref, starlya_mini_f, s_star = _norm_group(starlya_pref, starlya_mini_f)
    lya_cont_pref, lya_cont_mini_pref, s_cont = _norm_group(
        lya_cont_pref, lya_cont_mini_pref)
    lya_inj_pref, lya_inj_mini_pref, s_inj = _norm_group(
        lya_inj_pref, lya_inj_mini_pref)
    lw_f, lw_mini_f, s_lw = _norm_group(lw_f, lw_mini_f)
    consts = consts + tuple(
        jnp.float32(v)
        for v in (s_heat, s_ion, s_lya, s_star, s_cont, s_inj, s_lw)
    )

    _ts_args = (
        perturbed_field.density,
        prev_state.spin_temperature,
        prev_state.kinetic_temp_neutral,
        prev_state.xray_ionised_fraction,
        sfr_shells,
        xray_shells,
        sfr_mini_shells,
        sfr_lw_shells,
        sfr_mini_lw_shells,
        jnp.asarray(filter_R, jnp.float32),
        jnp.asarray(do_filter),
        jnp.asarray(ladder.growth, jnp.float32),
        jnp.asarray(z_edge_factor, jnp.float32),
        jnp.asarray(xray_r_factor, jnp.float32),
        jnp.asarray(d_lo, jnp.float32),
        jnp.asarray(d_hi, jnp.float32),
        jnp.asarray(sfrd_tables, jnp.float32),
        jnp.asarray(sfrd_tables_fc, jnp.float32),
        jnp.asarray(sfrd_caps, jnp.float32),
        jnp.asarray(sfrd_cheby, jnp.float32),
        jnp.asarray(sfrd_edge, jnp.float32),
        jnp.asarray(mean_sfrd, jnp.float32),
        jnp.asarray(tbl_heat, jnp.float32),
        jnp.asarray(tbl_ion, jnp.float32),
        jnp.asarray(tbl_lya, jnp.float32),
        jnp.asarray(starlya_pref, jnp.float32),
        jnp.asarray(lya_cont_pref, jnp.float32),
        jnp.asarray(lya_inj_pref, jnp.float32),
        lya_tbl_cont,
        lya_tbl_inj,
        jnp.float32(gp_norm),
        jnp.asarray(sfrd_tables_mini, jnp.float32),
        jnp.asarray(mean_sfrd_mini, jnp.float32),
        jnp.asarray(starlya_mini_f, jnp.float32),
        jnp.asarray(lya_cont_mini_pref, jnp.float32),
        jnp.asarray(lya_inj_mini_pref, jnp.float32),
        jnp.asarray(lw_f, jnp.float32),
        jnp.asarray(lw_mini_f, jnp.float32),
        mcrit_box,
        jnp.float32(mcrit_clip),
        jnp.float32(inv_growth_pf),
        jnp.float32(sc_zp.fstar_10),
        jnp.float32(sc_zp.fstar_7),
        jnp.float32(ap.l_x_mini / max(ap.l_x, 1e-30)),
        consts,
        kappa_knots,
    )
    _ts_static = dict(
        shape=shape,
        box_lens=box_lens,
        heat_filter=ao.heat_filter_int,
        use_xray_heat=ao.USE_X_RAY_HEATING,
        use_cmb_heat=ao.USE_CMB_HEATING,
        lagrangian=lagrangian,
        use_minihalos=use_minihalos,
        use_minihalos_lagr=use_minihalos_lagr,
        use_lw_shells=use_lw_shells,
        use_lya_heat=use_lya_heat,
        use_cheby=use_cheby,
        const_model=const_model,
    )
    _upd_static = dict(
        shape=shape,
        box_lens=_ts_static["box_lens"],
        use_xray_heat=_ts_static["use_xray_heat"],
        use_cmb_heat=_ts_static["use_cmb_heat"],
        use_lya_heat=_ts_static["use_lya_heat"],
        use_minihalos=_ts_static["use_minihalos"],
        use_minihalos_lagr=_ts_static["use_minihalos_lagr"],
    )
    if mesh is not None:
        from ..parallel.shardcall import sharded_kernel_call

        accs = sharded_kernel_call(mesh, _ts_shell_scan, _ts_args, _ts_static, shape)
        _upd_args = (
            perturbed_field.density,
            prev_state.spin_temperature,
            prev_state.kinetic_temp_neutral,
            prev_state.xray_ionised_fraction,
            accs,
            lya_tbl_cont, lya_tbl_inj, jnp.float32(gp_norm),
            jnp.float32(inv_growth_pf), consts, kappa_knots,
        )
        ts, tk, x_e, j_lya, j_lw = sharded_kernel_call(
            mesh, _ts_cell_update, _upd_args, _upd_static, shape)
    else:
        accs = _ts_shell_scan(*_ts_args, **_ts_static)
        ts, tk, x_e, j_lya, j_lw = _ts_cell_update(
            perturbed_field.density,
            prev_state.spin_temperature,
            prev_state.kinetic_temp_neutral,
            prev_state.xray_ionised_fraction,
            accs,
            lya_tbl_cont, lya_tbl_inj, jnp.float32(gp_norm),
            jnp.float32(inv_growth_pf), consts, kappa_knots,
            **_upd_static,
        )

    box = TsBox(
        redshift=np.float32(redshift),
        spin_temperature=ts,
        xray_ionised_fraction=x_e,
        kinetic_temp_neutral=tk,
        J_21_LW=j_lw,  # LW prefactors folded on host; None without minihalos
        J_Lya=j_lya,
    )
    return box, box


_sigma_table_cache = {}


def _get_sigma_table(inputs: InputParameters):
    key = inputs.matter_cosmo_hash
    if key not in _sigma_table_cache:
        _sigma_table_cache[key] = inputs.cosmology.build_sigma_table(m_min=1e2, m_max=1e20)
    return _sigma_table_cache[key]
