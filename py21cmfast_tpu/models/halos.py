"""Discrete halo catalogs: DexM excursion-set finder + stochastic CHMF sampler.

TPU-native equivalent of reference HaloCatalog.c:38-625 + Stochasticity.c.
Design differences from the C implementation (SURVEY.md §7 "hard parts"):

 * DexM exclusion is a *mask*, not per-halo sphere checks: at each filter
   radius (descending), cells above the barrier and not yet inside a halo
   become halos; the exclusion mask is then grown by painting spheres in
   k-space (one FFT pair per radius) instead of `check_halo` loops.
 * The conditional-MF sampler uses fixed-capacity padded buffers + masked
   draws: each cell draws K_MAX masses from the inverse-CMF table and keeps
   them while the running sum is below the cell's collapsed-mass target
   (the reference's MASS-LIMITED method, Stochasticity.c:260-720), then a
   prefix-sum compaction packs survivors into the global catalog — replacing
   the thread-partitioned buffers + condense_sparse_halolist.
 * RNG is counter-based (threefry): deterministic and splittable; per-halo
   property RNG is correlated across snapshots via CORR_* AR(1) mixing
   (Stochasticity.c set_prop_rng:210-232).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..cosmology.constants import physconst
from ..inputs import InputParameters
from ..ops import fft, filters, grids
from ..outputs import HaloCatalog, InitialConditions, PerturbedHaloCatalog
from . import hmf

__all__ = ["determine_halo_catalog", "perturb_halo_catalog", "sample_halo_grid"]

MAX_HALO_CELL = 100000  # reference Stochasticity.c:25


# ---------------------------------------------------------------------------
# DexM: excursion-set halo finder on the hires grid


# Same-level dedup strata: candidates at one radius level are processed in
# this many hash-assigned sub-batches so that overlapping same-mass
# neighbours don't all become halos (the reference's raster-order first-come
# dedup, HaloCatalog.c:227-260, is inherently sequential; random-stratum
# sequencing reduces residual same-level over-merging by ~1/N_STRATA at the
# cost of 2(N_STRATA-1) extra FFTs per level).
DEXM_SAME_LEVEL_STRATA = 4


@partial(jax.jit, static_argnames=("hi_shape", "box_lens", "n_r", "optimize", "strata"))
def _dexm_scan(d_k, barriers, radii, masses, loose_level, stratum_grid, *, hi_shape,
               box_lens, n_r, optimize=False, strata=DEXM_SAME_LEVEL_STRATA):
    """Descending-R excursion set with FFT sphere-painted exclusion.

    Candidate centres must clear the reference's strict no-overlap test
    (check_halo(.., 1), HaloCatalog.c:263-289): no already-flagged pixel may
    lie within R of the centre — evaluated here as a tophat convolution of
    the in_halo mask.  With `optimize` (DEXM_OPTIMIZE), levels with
    M > DEXM_OPTIMIZE_MINMASS (`loose_level` True) use the looser
    centre-pixel-only test, mirroring the reference's forbidden-region
    shortcut for large halos.

    Same-level overlaps are suppressed by sequencing the level's candidates
    through `strata` hash-assigned sub-batches: each batch is tested against
    the centres accepted in earlier batches at the strict conflict radius 2R
    (a pixel of an equal-size halo lies within R of my centre iff the centres
    are closer than 2R); the reference resolves these conflicts first-come in
    raster order, here the winner within a conflict pair is the one hashed
    into the earlier stratum — statistically equivalent for the halo field.

    Returns (halo_mass_grid, in_halo mask): halo_mass_grid holds the halo mass
    at each halo-centre cell (0 elsewhere)."""
    kmag = grids.kmag_grid(hi_shape, box_lens)
    cell_vol = (box_lens[0] / hi_shape[0]) ** 3

    def step(carry, xs):
        halo_grid, in_halo = carry
        r, barrier, mass, loose = xs
        delta_r = fft.irfft3(filters.filter_kbox(d_k, kmag, filters.TOPHAT, r), hi_shape)
        sphere_vol_r = 4.0 / 3.0 * np.pi * r**3
        # overlap fraction of already-flagged pixels within R of each centre
        occ_k = fft.rfft3(in_halo.astype(jnp.float32))
        occupied = fft.irfft3(
            filters.filter_kbox(occ_k, kmag, filters.TOPHAT, r), hi_shape
        )
        clear = occupied * sphere_vol_r < 0.5 * cell_vol
        if optimize:
            clear = jnp.where(loose, ~in_halo, clear)
        cand = (delta_r > barrier) & (~in_halo) & clear
        if strata <= 1:
            new_centres = cand
        else:
            # same-level conflict radius: 2R for the strict test, R when the
            # loose (DEXM_OPTIMIZE) centre-pixel test applies
            r_conf = jnp.where(loose, r, 2.0 * r) if optimize else 2.0 * r
            vol_conf = 4.0 / 3.0 * np.pi * r_conf**3
            new_centres = cand & (stratum_grid == 0)
            for s in range(1, strata):
                acc_k = fft.rfft3(new_centres.astype(jnp.float32))
                n_near = fft.irfft3(
                    filters.filter_kbox(acc_k, kmag, filters.TOPHAT, r_conf), hi_shape
                )
                ok = n_near * vol_conf < 0.5 * cell_vol
                new_centres = new_centres | (cand & (stratum_grid == s) & ok)
        halo_grid = jnp.where(new_centres, mass, halo_grid)
        # paint exclusion spheres: convolve centres with a normalized tophat of
        # radius r; anything with weight above threshold lies inside some halo
        flags_k = fft.rfft3(new_centres.astype(jnp.float32))
        sphere_vol = 4.0 / 3.0 * np.pi * r**3
        painted = fft.irfft3(
            filters.filter_kbox(flags_k, kmag, filters.TOPHAT, r), hi_shape
        )
        # `painted` ~ (count inside sphere) * cell/sphere volume ratio
        in_halo = in_halo | (painted * sphere_vol > 0.5 * cell_vol)
        return (halo_grid, in_halo), None

    halo_grid0 = jnp.zeros(hi_shape, jnp.float32)
    in_halo0 = jnp.zeros(hi_shape, bool)
    (halo_grid, in_halo), _ = jax.lax.scan(
        step, (halo_grid0, in_halo0), (radii, barriers, masses, loose_level)
    )
    return halo_grid, in_halo


def dexm_halo_grid(redshift: float, inputs: InputParameters, ics: InitialConditions):
    """Run the DexM finder; returns (halo_mass_grid[hires], in_halo[hires])."""
    so = inputs.simulation_options
    cosmo = inputs.cosmology
    sigma_table = _sigma_table(inputs)
    growth = float(cosmo.dicke(redshift))

    cell_hi = so.box_len / so.dim
    r_min = physconst.l_factor * cell_hi
    r_max = physconst.l_factor * so.box_len / 4  # halos can't exceed ~ box/4
    n_r = int(np.log(r_max / r_min) / np.log(so.DELTA_R_FACTOR)) + 1
    radii = r_min * so.DELTA_R_FACTOR ** np.arange(n_r)
    radii = radii[radii <= r_max][::-1]  # descending
    masses = np.asarray(cosmo.RtoM(radii))
    sigmas = sigma_table.sigma_of_lnm(np.log(masses))
    # DexM barrier (hmf.c:143-146) in z=0-linear units to compare with delta0
    barriers = (
        hmf.sheth_delc_dexm(physconst.delta_c_sph / growth, sigmas)
    )

    d_k = jax.jit(fft.rfft3)(ics.hires_density)
    mo = inputs.matter_options
    loose = np.asarray(masses) > so.DEXM_OPTIMIZE_MINMASS
    # deterministic per-cell stratum assignment for the same-level dedup
    stratum_grid = jax.random.randint(
        jax.random.PRNGKey(inputs.random_seed ^ 0x0DE3), so.hires_shape,
        0, DEXM_SAME_LEVEL_STRATA, dtype=jnp.uint8,
    )
    return _dexm_scan(
        d_k,
        jnp.asarray(barriers, jnp.float32),
        jnp.asarray(radii, jnp.float32),
        jnp.asarray(masses, jnp.float32),
        jnp.asarray(loose),
        stratum_grid,
        hi_shape=so.hires_shape,
        box_lens=so.box_lens,
        n_r=len(radii),
        optimize=bool(mo.DEXM_OPTIMIZE),
    )


# ---------------------------------------------------------------------------
# Stochastic CHMF sampler (grid conditions)


def _sigma_table(inputs):
    from .ionization import _get_sigma_table

    return _get_sigma_table(inputs)


def _fix_mass_keep(m, m_tgt, key):
    """Reference fix_mass_sample (Stochasticity.c:341-411), fully vectorized.

    `m` holds (B, K) iid inverse-CMF draws per condition.  The sampled set is
    the minimal prefix whose cumulative mass crosses the target (the
    reference's draw-until-exceeded loop); the overshoot is then corrected
    two-sidedly: with probability 1/2 the final (crossing) halo is dropped iff
    that lands closer to the target; otherwise sampled halos are removed in
    uniformly-random order until the total drops below the target, re-adding
    the last removal iff that is closer.  The two branches have opposite
    biases (the crossing halo is larger than average), which preserves the
    high-mass tail of the sampled CMF.  Returns the keep mask.
    """
    B, K = m.shape
    csum = jnp.cumsum(m, axis=1)
    csum_excl = csum - m
    inside = csum <= m_tgt[:, None]
    crossing = (csum_excl < m_tgt[:, None]) & ~inside  # at most one True per row
    sampled = inside | crossing
    total = jnp.sum(jnp.where(sampled, m, 0.0), axis=1)

    k1, k2 = jax.random.split(key)
    sel = jax.random.bernoulli(k1, 0.5, (B,))

    # branch A: drop the crossing halo iff dropping is closer to the target
    m_last = jnp.sum(jnp.where(crossing, m, 0.0), axis=1)
    drop_last = jnp.abs(total - m_last - m_tgt) < jnp.abs(total - m_tgt)
    keep_a = sampled & ~(crossing & drop_last[:, None])

    # branch B: remove sampled halos in uniform-random order until <= target
    u = jax.random.uniform(k2, (B, K))
    priority = jnp.where(sampled, u, jnp.inf)
    order = jnp.argsort(priority, axis=1)  # removal order among sampled
    m_ord = jnp.where(
        jnp.take_along_axis(sampled, order, axis=1),
        jnp.take_along_axis(m, order, axis=1),
        0.0,
    )
    after = total[:, None] - jnp.cumsum(m_ord, axis=1)  # total after t removals
    t_idx = jnp.argmax(after <= m_tgt[:, None], axis=1)  # 0-based last removal
    last_removed = jnp.take_along_axis(m_ord, t_idx[:, None], axis=1)[:, 0]
    after_final = jnp.take_along_axis(after, t_idx[:, None], axis=1)[:, 0]
    readd = jnp.abs(after_final + last_removed - m_tgt) < jnp.abs(after_final - m_tgt)
    rank = jnp.argsort(order, axis=1)  # each slot's position in removal order
    removed = rank <= t_idx[:, None]
    keep_b = sampled & (~removed | ((rank == t_idx[:, None]) & readd[:, None]))
    # rows that never crossed the target (k_max exhausted / empty) need no fix
    keep_b = jnp.where((total > m_tgt)[:, None], keep_b, sampled)

    return jnp.where(sel[:, None], keep_a, keep_b)


def _gaussian_tail(key, nu_min):
    """Sample from the standard normal conditioned on X > nu_min (vectorized
    replacement for gsl_ran_ugaussian_tail).  Inverse-CDF for small nu_min,
    Devroye's exact tail method (X = sqrt(a^2 - 2 ln U), accept w.p. a/X) for
    large nu_min where the float32 inverse CDF saturates."""
    k1, k2 = jax.random.split(key)
    shape = nu_min.shape
    # inverse-CDF branch
    u = jax.random.uniform(k1, shape, minval=1e-7, maxval=1.0)
    q = 0.5 * jax.scipy.special.erfc(nu_min / jnp.sqrt(2.0))
    x_inv = jnp.sqrt(2.0) * jax.scipy.special.erfinv(
        jnp.clip(1.0 - 2.0 * q * u, -0.999999, 0.999999)
    )
    # Devroye branch: 4 attempts, keep the first accepted (acceptance >= ~0.8)
    u1 = jax.random.uniform(k2, (4,) + shape, minval=1e-12, maxval=1.0)
    u2 = jax.random.uniform(jax.random.fold_in(k2, 1), (4,) + shape)
    x_try = jnp.sqrt(nu_min**2 - 2.0 * jnp.log(u1))
    acc = u2 < nu_min / jnp.maximum(x_try, 1e-10)
    first = jnp.argmax(acc, axis=0)
    x_dev = jnp.take_along_axis(x_try, first[None], axis=0)[0]
    any_acc = jnp.any(acc, axis=0)
    x_dev = jnp.where(any_acc, x_dev, nu_min + 0.1)  # fallback: near the edge
    return jnp.where(nu_min > 2.0, x_dev, jnp.maximum(x_inv, nu_min))


def _st_taylor_dev(sig, sig_cond, growth):
    """Device port of hmf._st_taylor_factor (moving ST barrier, hmf.c:234-267)."""
    a, alpha, beta = hmf.JENKINS_a, hmf.JENKINS_c, hmf.JENKINS_b
    del_ = physconst.delta_c_sph / growth
    sigsq = sig * sig
    sigsq_inv = 1.0 / sigsq
    sigdiff = jnp.where(jnp.abs(sig - sig_cond) < 1e-9, 1e-6, sigsq - sig_cond**2)
    t = jnp.ones_like(sig)
    result = jnp.ones_like(sig)
    for i in range(1, 6):
        t = t * (-sigdiff) / i * (alpha - i + 1) * sigsq_inv
        result = result + t
    pre1 = jnp.sqrt(a) * del_
    pre2 = beta * (sigsq_inv * (a * del_ * del_)) ** -alpha
    return pre1 * (1 + pre2 * result)


@partial(jax.jit, static_argnames=("t_max", "use_st"))
def _partition_kernel(
    key,
    delta_cond,  # (B,) condition delta at z (linear, z-scaled)
    ln_m_cond,  # (B,)
    active0,  # (B,) bool
    ln_m_axis,  # uniform lnM axis of the sigma table
    sigma_tab,
    sig_axis,  # uniform sigma axis of the inverse table
    lnm_of_sig_tab,
    sigma_min,
    m_min_sample,
    growth,
    corr_fudge,
    *,
    t_max,
    use_st,
):
    """Sheth & Lemson 1999 partition sampling (stoc_partition_sample,
    Stochasticity.c:437-486): repeatedly split the remaining condition mass by
    drawing nu from the truncated Gaussian (with the ST moving-barrier
    rejection when HMF='ST'), until the remainder falls below the sampler
    floor.  One lax.scan step = one progenitor draw across all conditions."""
    from ..ops.grids import uniform_lerp

    lnm0 = ln_m_axis[0]
    inv_dlnm = (ln_m_axis.shape[0] - 1) / (ln_m_axis[-1] - ln_m_axis[0])
    sig0 = sig_axis[0]
    inv_dsig = (sig_axis.shape[0] - 1) / (sig_axis[-1] - sig_axis[0])

    m_cond = jnp.exp(ln_m_cond)

    def step(carry, t):
        m_rem, active = carry
        kt = jax.random.fold_in(key, t)
        lnm_rem = jnp.log(jnp.maximum(m_rem, 1.0))
        sig_r = uniform_lerp(lnm_rem, lnm0, inv_dlnm, sigma_tab)
        if use_st:
            # ST barrier at sig_r: sheth_delc_fixed(delta_c/growth, sig)*growth
            a = hmf.JENKINS_a
            dc = physconst.delta_c_sph / growth
            dcrit_r = (
                jnp.sqrt(a) * dc
                * (1.0 + hmf.JENKINS_b * (sig_r**2 / (a * dc * dc)) ** hmf.JENKINS_c)
            ) * growth
        else:
            dcrit_r = jnp.full_like(sig_r, physconst.delta_c_sph)
        delta_cur = (dcrit_r - delta_cond) / (m_rem / m_cond)
        del_term = (delta_cur / growth) ** 2
        sigdiff_min = jnp.maximum(sigma_min**2 - sig_r**2, 1e-12)
        nu_min = jnp.sqrt(del_term / sigdiff_min)

        nu = _gaussian_tail(jax.random.fold_in(kt, 0), nu_min) * corr_fudge
        sig_samp = jnp.sqrt(del_term / jnp.maximum(nu, 1e-10) ** 2 + sig_r**2)
        if use_st:
            del_c = delta_cur / growth
            t1 = _st_taylor_dev(sig_samp, sig_r, growth) - del_c
            t2 = _st_taylor_dev(jnp.full_like(sig_r, sigma_min), sig_r, growth) - del_c
            accept = jax.random.uniform(jax.random.fold_in(kt, 1), sig_r.shape) <= (
                t2 / jnp.maximum(t1, 1e-30)
            )
        else:
            accept = jnp.ones_like(active)

        sig_c = jnp.clip(sig_samp, sig_axis[0], sig_axis[-1])
        m_samp = jnp.exp(uniform_lerp(sig_c, sig0, inv_dsig, lnm_of_sig_tab))
        m_samp = jnp.minimum(m_samp, m_rem)
        emit = active & accept
        m_rem_new = jnp.where(emit, m_rem - m_samp, m_rem)
        active_new = active & (m_rem_new > m_min_sample)
        return (m_rem_new, active_new), (jnp.where(emit, m_samp, 0.0), emit)

    (m_rem, _), (masses, keep) = jax.lax.scan(
        step, (m_cond, active0), jnp.arange(t_max)
    )
    return masses.T, keep.T  # (B, t_max)


@partial(
    jax.jit,
    static_argnames=("k_max", "capacity", "n_chunks", "lo_shape", "number_limited"),
)
def _sample_cells_kernel(
    key,
    delta_cells,  # (n_cells,) Lagrangian delta at z (already * growth)
    exclude,  # (n_cells,) bool: cells claimed by DexM halos
    inv_table,  # (n_cond, n_prob) ln M
    nhalo_cells,  # (n_cells,) expected counts (for info only)
    mtarget_cells,  # (n_cells,) target collapsed mass [Msun]
    d_lo,
    d_hi,
    lnp_min,
    m_min,
    cell_len,
    *,
    k_max,
    capacity,
    n_chunks,
    lo_shape,
    number_limited=False,
):
    """Mass- or number-limited sampling of all cells, compacted into a fixed
    buffer (reference stoc_mass_sample / stoc_halo_sample,
    Stochasticity.c:259-276, 374-411)."""
    n_cells = delta_cells.shape[0]
    chunk = n_cells // n_chunks
    n_cond, n_prob = inv_table.shape

    def draw_chunk(carry, c):
        key_c = jax.random.fold_in(key, c)
        offset, masses_buf, pos_buf, count_total = carry
        sl = c * chunk
        d = jax.lax.dynamic_slice_in_dim(delta_cells, sl, chunk)
        excl = jax.lax.dynamic_slice_in_dim(exclude, sl, chunk)
        m_tgt = jax.lax.dynamic_slice_in_dim(mtarget_cells, sl, chunk)
        m_tgt = jnp.where(excl, 0.0, m_tgt)

        u = jax.random.uniform(key_c, (chunk, k_max), minval=1e-12, maxval=1.0)
        # bilinear gather from the inverse CMF table
        tc = jnp.clip((d - d_lo) / (d_hi - d_lo) * (n_cond - 1), 0.0, n_cond - 1.001)
        ic0 = tc.astype(jnp.int32)
        fc = (tc - ic0)[:, None]
        lnp = jnp.clip(jnp.log(u), lnp_min, 0.0)
        tp = jnp.clip((lnp - lnp_min) / (0.0 - lnp_min) * (n_prob - 1), 0.0, n_prob - 1.001)
        ip0 = tp.astype(jnp.int32)
        fp = tp - ip0
        t00 = inv_table[ic0[:, None], ip0]
        t01 = inv_table[ic0[:, None], ip0 + 1]
        t10 = inv_table[ic0[:, None] + 1, ip0]
        t11 = inv_table[ic0[:, None] + 1, ip0 + 1]
        ln_m = (t00 * (1 - fp) + t01 * fp) * (1 - fc) + (t10 * (1 - fp) + t11 * fp) * fc
        m = jnp.exp(ln_m)

        # mass-limited with a debiased stop: halos fully inside the budget are
        # kept; the halo that CROSSES the budget is kept with probability
        # (remaining budget)/m, which makes the expected kept mass exactly the
        # target (replaces the reference's fix_mass_sample 50/50 keep-or-drop
        # correction, Stochasticity.c:341-411, with an exactly-unbiased rule)
        if number_limited:
            # NUMBER-LIMITED: Poisson-draw the halo count from the expected
            # CMF integral, ignore the mass budget (stoc_halo_sample:259)
            n_cell = jax.lax.dynamic_slice_in_dim(nhalo_cells, sl, chunk)
            n_cell = jnp.where(excl, 0.0, n_cell)
            n_draw = jax.random.poisson(jax.random.fold_in(key_c, 2), n_cell)
            keep = (jnp.arange(k_max)[None, :] < n_draw[:, None]) & (m >= m_min)
        else:
            keep = _fix_mass_keep(m, m_tgt, jax.random.fold_in(key_c, 3))
            keep = keep & (m >= m_min)

        # compact into the global buffer
        keep_flat = keep.reshape(-1)
        m_flat = jnp.where(keep_flat, m.reshape(-1), 0.0)
        idx = offset + jnp.cumsum(keep_flat) - 1
        idx = jnp.where(keep_flat, jnp.clip(idx, 0, capacity - 1), capacity - 1)
        masses_buf = masses_buf.at[idx].add(jnp.where(keep_flat, m_flat, 0.0))

        # positions: cell centre + uniform jitter inside the cell
        cell_ids = sl + jnp.arange(chunk)
        iz = cell_ids % lo_shape[2]
        iy = (cell_ids // lo_shape[2]) % lo_shape[1]
        ix = cell_ids // (lo_shape[1] * lo_shape[2])
        base = jnp.stack([ix, iy, iz], axis=-1).astype(jnp.float32)  # (chunk, 3)
        jit_key = jax.random.fold_in(key_c, 1)
        jitter = jax.random.uniform(jit_key, (chunk, k_max, 3))
        pos = (base[:, None, :] + jitter) * cell_len  # Mpc
        pos_flat = pos.reshape(-1, 3)
        pos_buf = pos_buf.at[idx].add(
            jnp.where(keep_flat[:, None], pos_flat, 0.0)
        )

        n_kept = jnp.sum(keep_flat)
        return (offset + n_kept, masses_buf, pos_buf, count_total + n_kept), None

    masses_buf = jnp.zeros(capacity, jnp.float32)
    pos_buf = jnp.zeros((capacity, 3), jnp.float32)
    (total, masses_buf, pos_buf, _), _ = jax.lax.scan(
        draw_chunk, (jnp.int32(0), masses_buf, pos_buf, jnp.int32(0)), jnp.arange(n_chunks)
    )
    return masses_buf, pos_buf, total


def sample_halo_grid(
    redshift: float,
    inputs: InputParameters,
    lagrangian_delta,  # lowres IC density (z=0 normalization), jnp (HII,)*3
    exclude_mask=None,
    key=None,
    grid_shape=None,
    origin_cells=(0, 0, 0),
):
    """Sample the conditional MF in every lowres cell between SAMPLER_MIN_MASS
    and the cell mass (reference sample_halo_grids, Stochasticity.c:761-941).

    `grid_shape`/`origin_cells` support slab-decomposed sampling (see
    parallel/sampler.py): the delta array is a slab of the full grid starting
    at `origin_cells`; returned positions are GLOBAL (origin offset applied)."""
    # Grid-based conditions ALWAYS sample number-limited, regardless of
    # SAMPLE_METHOD (reference stoc_sample, Stochasticity.c:696-699:
    # "We always use Number-Limited sampling for grid-based cases"); the
    # method choice only affects progenitor sampling from catalogs.
    so = inputs.simulation_options
    cosmo = inputs.cosmology
    sigma_table = _sigma_table(inputs)
    growth = float(cosmo.dicke(redshift))
    hmf_int = hmf.HMF_NAMES[inputs.matter_options.HMF]

    cell_len = so.box_len / so.HII_DIM
    m_cell = cosmo.rho_mean * cell_len**3
    m_min = so.SAMPLER_MIN_MASS
    ln_mmin, ln_mcell = np.log(m_min), np.log(m_cell)
    sigma_cell = float(sigma_table.sigma_of_lnm(ln_mcell))

    # condition tables over delta (at z): the reference uses N_COND_INTERP points
    dcrit = float(
        hmf.get_delta_crit(
            hmf_int if hmf_int in (0, 1, 4) else 0, sigma_cell, growth
        )
    )
    d_lo, d_hi = -1.0 + 1e-6, dcrit * hmf.MAX_DELTAC_FRAC
    deltas = np.linspace(d_lo, d_hi, so.N_COND_INTERP)
    nhalo_tab = hmf.nhalo_conditional(
        sigma_table, hmf_int, growth, ln_mmin, ln_mcell, sigma_cell, deltas
    ) * m_cell
    mcoll_tab = hmf.mcoll_conditional(
        sigma_table, hmf_int, growth, ln_mmin, ln_mcell, sigma_cell, deltas
    ) * m_cell
    lnp_axis, inv_tab = hmf.build_inverse_cmf_table(
        sigma_table, hmf_int, growth, ln_mmin, ln_mcell, sigma_cell, deltas,
        n_prob=so.N_PROB_INTERP, min_logprob=so.MIN_LOGPROB,
    )

    # per-cell targets (host: lowres grids are small)
    delta_raw = np.asarray(lagrangian_delta, dtype=np.float64).reshape(-1) * growth
    delta_z = np.clip(delta_raw, d_lo, d_hi)
    n_exp = np.interp(delta_z, deltas, nhalo_tab)
    m_tgt = np.interp(delta_z, deltas, mcoll_tab)
    excl = (
        np.asarray(exclude_mask).reshape(-1)
        if exclude_mask is not None
        else np.zeros(delta_z.size, bool)
    )
    # collapsed cells (delta above 0.99 delta_crit) form one expected-mass halo
    # (stoc_sample, Stochasticity.c:686-694)
    collapsed = (delta_raw >= d_hi) & ~excl
    n_exp = np.where(excl | collapsed, 0.0, n_exp)

    n_cells = delta_z.size
    capacity = int(so.SAMPLER_BUFFER_FACTOR * np.sum(n_exp) + 1024)
    k_max = int(np.clip(3 * n_exp.max() + 8, 16, 4096))
    # chunk so the (chunk, k_max) draws stay ~ 2^22
    n_chunks = max(1, int(n_cells * k_max / 2**22))
    while n_cells % n_chunks:
        n_chunks += 1

    if key is None:
        key = jax.random.PRNGKey(inputs.random_seed + 17)

    masses, pos, total = _sample_cells_kernel(
        key,
        jnp.asarray(delta_z, jnp.float32),
        jnp.asarray(excl | collapsed),
        jnp.asarray(inv_tab, jnp.float32),
        jnp.asarray(n_exp, jnp.float32),
        jnp.asarray(m_tgt, jnp.float32),
        jnp.float32(d_lo),
        jnp.float32(d_hi),
        jnp.float32(so.MIN_LOGPROB),
        jnp.float32(m_min),
        jnp.float32(cell_len),
        k_max=k_max,
        capacity=capacity,
        n_chunks=n_chunks,
        lo_shape=grid_shape if grid_shape is not None else so.lowres_shape,
        number_limited=True,
    )
    if any(origin_cells):
        pos = pos + jnp.asarray(origin_cells, jnp.float32) * jnp.float32(cell_len)
    if collapsed.any():
        lo_shape = grid_shape if grid_shape is not None else so.lowres_shape
        ids = np.nonzero(collapsed)[0]
        iz = ids % lo_shape[2]
        iy = (ids // lo_shape[2]) % lo_shape[1]
        ix = ids // (lo_shape[1] * lo_shape[2])
        rng = np.random.default_rng(inputs.random_seed + 29)
        cpos = (
            np.stack([ix, iy, iz], axis=-1).astype(np.float64)
            + np.asarray(origin_cells, np.float64)
            + rng.uniform(size=(len(ids), 3))
        ) * cell_len
        masses = jnp.concatenate(
            [masses, jnp.asarray(m_tgt[ids], jnp.float32)]
        )
        pos = jnp.concatenate([pos, jnp.asarray(cpos, jnp.float32)])
        total = total + len(ids)
    return masses, pos, total


def _partition_tables(sigma_table, m_lo, m_hi, n=512):
    """Uniform lnM sigma table + uniform-sigma inverse table for the device."""
    ln_axis = np.linspace(np.log(m_lo), np.log(m_hi), n)
    sig_vals = sigma_table.sigma_of_lnm(ln_axis)  # decreasing in lnM
    sig_axis = np.linspace(sig_vals[-1], sig_vals[0], n)
    lnm_of_sig = np.interp(sig_axis, sig_vals[::-1], ln_axis[::-1])
    return (
        jnp.asarray(ln_axis, jnp.float32),
        jnp.asarray(sig_vals, jnp.float32),
        jnp.asarray(sig_axis, jnp.float32),
        jnp.asarray(lnm_of_sig, jnp.float32),
    )


@partial(jax.jit, static_argnames=("t_max", "capacity", "cap_out"))
def _binary_split_kernel(
    key,
    m_cond,       # (B,) descendant masses
    d_start0,     # (B,) delta_c / D(z_in)  (Lagrangian barrier at the descendant z)
    d_target,     # (B,) delta_c / D(z_out) (barrier at the progenitor z)
    ln_m_axis,    # uniform lnM sigma-table axis
    sigma_tab,
    dsigsq_tab,   # d sigma^2 / dM on the same axis
    m_res,
    g0, gamma1, gamma2,
    *,
    t_max,
    capacity,
    cap_out,
):
    """Parkinson+08 binary-split merger trees (reference stoc_split_sample,
    Stochasticity.c:488-660, after Darkforest/Qiu+20), breadth-parallel:
    instead of the reference's serial per-condition stack, EVERY active branch
    of every condition advances one barrier step per scan iteration — the tree
    walk becomes a masked (B, capacity) lattice ideally shaped for the VPU.

    Returns (out_m, out_count): progenitor masses per condition (zero-padded,
    (B, cap_out)).  Branches still active after t_max steps are force-saved.
    """
    from ..ops.grids import uniform_lerp

    B = m_cond.shape[0]
    C = capacity
    eps1 = eps2 = 0.1
    lnm0 = ln_m_axis[0]
    inv_dlnm = (ln_m_axis.shape[0] - 1) / (ln_m_axis[-1] - ln_m_axis[0])

    def sigma_of(lnm):
        return uniform_lerp(lnm, lnm0, inv_dlnm, sigma_tab)

    def dsigsq_of(lnm):
        return uniform_lerp(lnm, lnm0, inv_dlnm, dsigsq_tab)

    ln_mres = jnp.log(m_res)
    sigma_res = sigma_of(ln_mres)
    sigsq_res = sigma_res * sigma_res

    # state lattices
    m_pts = jnp.zeros((B, C), jnp.float32).at[:, 0].set(m_cond)
    d_pts = jnp.zeros((B, C), jnp.float32).at[:, 0].set(d_start0)
    out_m = jnp.zeros((B, cap_out), jnp.float32)
    out_ct = jnp.zeros(B, jnp.int32)

    def frac_below_res(sigma_s, sigsq_s, G1, dd):
        # ComputeFraction_split: mass fraction lost below resolution per dd
        u_res = sigma_s / jnp.sqrt(jnp.maximum(sigsq_res - sigsq_s, 1e-12))
        # J(u) for gamma1=0 is u; general gamma1 uses the Parkinson+08 integral
        # evaluated with a 16-pt trapezoid (u_res is O(1))
        if True:
            uu = jnp.linspace(0.0, 1.0, 17)[None, None, :] * u_res[..., None]
            integ = (1.0 + 1.0 / jnp.maximum(uu, 1e-8) ** 2) ** (gamma1 / 2.0)
            integ = jnp.where(uu > 0, integ, 0.0)
            j_val = jnp.trapezoid(integ, uu, axis=-1)
        return jnp.sqrt(2.0 / jnp.pi) * j_val * G1 / sigma_s * dd

    def step(carry, t):
        m_pts, d_pts, out_m, out_ct = carry
        kt = jax.random.fold_in(key, t)
        active = m_pts > 0

        lnm = jnp.log(jnp.maximum(m_pts, 1.0))
        m_half = 0.5 * m_pts
        lnm_half = lnm - jnp.float32(np.log(2.0))
        sigma_s = sigma_of(lnm)
        sigsq_s = sigma_s * sigma_s
        sigma_h = sigma_of(lnm_half)
        sigsq_h = sigma_h * sigma_h
        dd_target = d_target[:, None] - d_pts

        G1 = g0 * (d_pts / jnp.maximum(sigma_s, 1e-10)) ** gamma2
        q_res = m_res / jnp.maximum(m_pts, 1.0)

        # --- no-split branch (q_res >= 0.5): timestep limit only
        dd_nosplit = eps1 * jnp.sqrt(2.0) * jnp.sqrt(
            jnp.maximum(sigsq_h - sigsq_s, 1e-12)
        )

        # --- split branch quantities
        alpha_h = dsigsq_of(lnm_half)
        alpha_h = -m_half / (2.0 * sigsq_h) * alpha_h  # -dln sigma/dln m at m/2
        v_res = sigsq_res * jnp.maximum(sigsq_res - sigsq_s, 1e-12) ** -1.5
        v_half = sigsq_h * jnp.maximum(sigsq_h - sigsq_s, 1e-12) ** -1.5
        beta = jnp.log(v_res / v_half) / jnp.log(jnp.maximum(2.0 * q_res, 1e-10))
        b_coef = 2.0**beta * v_half
        mu = jnp.where(
            gamma1 < 0,
            -jnp.log(sigma_res / sigma_h) / jnp.log(jnp.maximum(2.0 * q_res, 1e-10)),
            alpha_h,
        )
        eta = beta - 1.0 - gamma1 * mu
        pow_diff = 0.5**eta - q_res**eta
        G2 = G1 * (sigma_h / sigma_s) ** gamma1 * 0.5 ** (mu * gamma1)
        dn_dd = jnp.sqrt(2.0 / jnp.pi) * b_coef * pow_diff / jnp.where(
            jnp.abs(eta) > 1e-10, eta, 1e-10
        ) * alpha_h * G2
        dd_split = jnp.minimum(dd_nosplit, eps2 / jnp.maximum(dn_dd, 1e-10))

        can_split = q_res < 0.5
        dd = jnp.where(can_split, dd_split, dd_nosplit)
        save = dd >= dd_target
        dd = jnp.minimum(dd, dd_target)

        # split draw (only meaningful where can_split & ~save handled below;
        # the reference draws the split before checking `save` too)
        n_upper = dn_dd * dd
        u1 = jax.random.uniform(jax.random.fold_in(kt, 0), (B, C))
        u2 = jax.random.uniform(jax.random.fold_in(kt, 1), (B, C))
        u3 = jax.random.uniform(jax.random.fold_in(kt, 2), (B, C))
        q = (q_res**eta + pow_diff * u2) ** (1.0 / jnp.where(jnp.abs(eta) > 1e-10, eta, 1e-10))
        m_q = q * m_pts
        lnm_q = jnp.log(jnp.maximum(m_q, 1.0))
        sigma_q = sigma_of(lnm_q)
        alpha_q = dsigsq_of(lnm_q)
        alpha_q = -m_q / (2.0 * sigma_q * sigma_q) * alpha_q
        sigsq_q = sigma_q * sigma_q
        r_q = (alpha_q / jnp.maximum(alpha_h, 1e-10)) * (
            sigsq_q * jnp.maximum(sigsq_q - sigsq_s, 1e-12) ** -1.5
            / (b_coef * jnp.maximum(q, 1e-10) ** beta)
        )
        do_split = can_split & (u1 < n_upper) & (u3 <= r_q)
        q = jnp.where(do_split, q, 0.0)

        F = frac_below_res(sigma_s, sigsq_s, G1, dd)
        m1 = (1.0 - F - q) * m_pts
        m2 = q * m_pts
        m1 = jnp.where(active & (m1 > m_res), m1, 0.0)
        m2 = jnp.where(active & (m2 > m_res), m2, 0.0)

        # --- emit finished branches (both progenitors) into the output buffer
        emit1 = active & save & (m1 > 0)
        emit2 = active & save & (m2 > 0)
        for emit, m_emit in ((emit1, m1), (emit2, m2)):
            rank = jnp.cumsum(emit, axis=1) - 1
            idx = jnp.where(emit, out_ct[:, None] + rank, cap_out)
            idx = jnp.clip(idx, 0, cap_out)  # slot cap_out = spill bucket
            out_m = jnp.pad(out_m, ((0, 0), (0, 1)))
            rows = jnp.arange(B)[:, None] * jnp.ones((1, C), jnp.int32)
            out_m = out_m.at[rows, idx].add(jnp.where(emit, m_emit, 0.0))
            out_m = out_m[:, :cap_out]
            out_ct = out_ct + jnp.sum(emit, axis=1, dtype=jnp.int32)

        # --- continue unfinished branches: slot keeps the larger progenitor
        cont = active & ~save
        m_pts = jnp.where(cont & (m1 > 0), m1, 0.0)
        d_pts = jnp.where(cont & (m1 > 0), d_pts + dd, 0.0)

        # the smaller progenitor of continuing splits claims a free slot
        spawn = cont & (m2 > 0)
        free_order = jnp.argsort(m_pts > 0, axis=1)  # free slots first
        spawn_rank = jnp.cumsum(spawn, axis=1) - 1
        n_free = jnp.sum(m_pts == 0, axis=1)
        ok = spawn & (spawn_rank < n_free[:, None])
        # target slot for each spawner: the spawn_rank-th free slot
        tgt = jnp.take_along_axis(
            free_order, jnp.clip(spawn_rank, 0, C - 1), axis=1
        )
        rows = jnp.arange(B)[:, None] * jnp.ones((1, C), jnp.int32)
        m_pts = m_pts.at[rows, tgt].add(jnp.where(ok, m2, 0.0))
        d_pts = d_pts.at[rows, tgt].add(jnp.where(ok, d_pts + dd, 0.0))
        return (m_pts, d_pts, out_m, out_ct), None

    (m_pts, d_pts, out_m, out_ct), _ = jax.lax.scan(
        step, (m_pts, d_pts, out_m, out_ct), jnp.arange(t_max)
    )

    # force-save any branch still active (t_max exhausted): emit its mass
    emit = m_pts > m_res
    rank = jnp.cumsum(emit, axis=1) - 1
    idx = jnp.where(emit, out_ct[:, None] + rank, cap_out)
    idx = jnp.clip(idx, 0, cap_out)
    out_m = jnp.pad(out_m, ((0, 0), (0, 1)))
    rows = jnp.arange(B)[:, None] * jnp.ones((1, C), jnp.int32)
    out_m = out_m.at[rows, idx].add(jnp.where(emit, m_pts, 0.0))
    out_m = out_m[:, :cap_out]
    out_ct = out_ct + jnp.sum(emit, axis=1, dtype=jnp.int32)
    return out_m, out_ct


# ---------------------------------------------------------------------------
# Catalog assembly


def _property_rng(key, n):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (n,), jnp.float32) for k in ks)


def determine_halo_catalog(
    redshift: float,
    inputs: InputParameters,
    ics: InitialConditions,
    previous_catalog: HaloCatalog | None = None,
    key=None,
) -> HaloCatalog:
    """Build the halo catalog at `redshift` (reference determine_halo_catalog,
    single_field.py:161): first snapshot = DexM + grid CHMF sampling; later
    snapshots = progenitor sampling from the previous catalog."""
    so = inputs.simulation_options
    cosmo = inputs.cosmology
    if key is None:
        key = jax.random.fold_in(jax.random.PRNGKey(inputs.random_seed), int(redshift * 100))

    if previous_catalog is not None:
        return _sample_progenitors(redshift, inputs, previous_catalog, key)

    # --- DexM for halos above the lowres cell mass ---
    halo_grid, in_halo = dexm_halo_grid(redshift, inputs, ics)
    hi_shape = so.hires_shape
    cell_hi = so.box_len / so.dim

    # extract DexM halos on host (hires grids can be large but extraction is rare)
    hg = np.asarray(halo_grid)
    idx = np.nonzero(hg)
    dexm_masses = hg[idx]
    rng = np.random.default_rng(inputs.random_seed + 3)
    dexm_pos = (
        np.stack(idx, axis=-1).astype(np.float64) + rng.uniform(size=(len(dexm_masses), 3))
    ) * cell_hi

    # --- stochastic sampling below the cell mass ---
    # exclusion: lowres cells inside DexM halos sample no additional mass
    ratio = so.dim // so.HII_DIM if so.dim % so.HII_DIM == 0 else None
    if ratio:
        excl = np.asarray(in_halo).reshape(
            so.HII_DIM, ratio, so.HII_DIM, ratio, so.hii_d_para, ratio
        ).mean(axis=(1, 3, 5)) > 0.5
    else:
        excl = np.zeros(so.lowres_shape, bool)

    masses, pos, total = sample_halo_grid(
        redshift, inputs, ics.lowres_density, exclude_mask=excl, key=key
    )
    masses = np.asarray(masses)
    pos = np.asarray(pos)
    valid = masses > 0
    all_masses = np.concatenate([dexm_masses, masses[valid]]).astype(np.float32)
    all_pos = np.concatenate([dexm_pos, pos[valid]]).astype(np.float32)
    n = len(all_masses)

    star_rng, sfr_rng, xray_rng = _property_rng(jax.random.fold_in(key, 99), n)
    return HaloCatalog(
        redshift=np.float32(redshift),
        halo_masses=jnp.asarray(all_masses),
        halo_coords=jnp.asarray(all_pos),
        star_rng=star_rng,
        sfr_rng=sfr_rng,
        xray_rng=xray_rng,
        n_halos=np.int32(n),
    )


def _sample_progenitors(redshift, inputs, prev_cat: HaloCatalog, key) -> HaloCatalog:
    """Sample progenitors of each halo from z_prev down to z
    (reference sample_halo_progenitors, Stochasticity.c:943-1114)."""
    so = inputs.simulation_options
    cosmo = inputs.cosmology
    sigma_table = _sigma_table(inputs)
    hmf_int = hmf.HMF_NAMES[inputs.matter_options.HMF]
    z_prev = float(prev_cat.redshift)
    growth = float(cosmo.dicke(redshift))
    growth_prev = float(cosmo.dicke(z_prev))

    masses_d = np.asarray(prev_cat.halo_masses)
    n_desc = int(prev_cat.n_halos)
    masses_d = masses_d[:n_desc]
    m_min = so.SAMPLER_MIN_MASS

    # condition axis: descendant mass bins
    m_max = max(masses_d.max(initial=m_min * 2), m_min * 2)
    n_cond = so.N_COND_INTERP
    ln_mbins = np.linspace(np.log(m_min), np.log(m_max) + 1e-3, n_cond)
    sig_bins = sigma_table.sigma_of_lnm(ln_mbins)
    # descendant formed at its collapse barrier at z_prev, rescaled to z
    delta_bins = (
        hmf.get_delta_crit(hmf_int if hmf_int in (0, 1, 4) else 0, sig_bins, growth_prev)
        * growth
        / growth_prev
    )
    lnp_axis, inv_tab = hmf.build_inverse_cmf_table(
        sigma_table, hmf_int, growth, np.log(m_min), ln_mbins, sig_bins, delta_bins,
        n_prob=so.N_PROB_INTERP, min_logprob=so.MIN_LOGPROB,
    )
    mcoll_bins = hmf.mcoll_conditional(
        sigma_table, hmf_int, growth, np.log(m_min), ln_mbins, sig_bins, delta_bins
    ) * np.exp(ln_mbins)
    nhalo_bins = hmf.nhalo_conditional(
        sigma_table, hmf_int, growth, np.log(m_min), ln_mbins, sig_bins, delta_bins
    ) * np.exp(ln_mbins)

    # per-descendant targets
    ln_md = np.log(np.maximum(masses_d, m_min))
    m_tgt = np.interp(ln_md, ln_mbins, mcoll_bins) * so.HALOMASS_CORRECTION
    n_exp_d = np.interp(ln_md, ln_mbins, nhalo_bins)
    cond_t = np.interp(ln_md, ln_mbins, np.arange(n_cond).astype(float))

    k_max = 64  # progenitor multiplicity per step is small (dz ~ 2%)
    n = len(masses_d)
    pad = (-n) % 256
    cond_t = np.pad(cond_t, (0, pad))
    m_tgt = np.pad(m_tgt, (0, pad))
    n_exp_d = np.pad(n_exp_d, (0, pad))

    method = inputs.matter_options.SAMPLE_METHOD
    # rare-halo truncation (Stochasticity.c:385-392, MASS-LIMITED only):
    # descendants whose condition is a many-sigma peak refuse to split
    # stochastically — hand them a single progenitor with the expected mass
    sig_d = np.interp(ln_md, ln_mbins, sig_bins)
    dcrit_d = hmf.get_delta_crit(
        hmf_int if hmf_int in (0, 1, 4) else 0, sig_d, growth
    )
    if method == "MASS-LIMITED" and n:
        rare = (sig_d * 7.0 * growth < dcrit_d)[:n]
    else:
        rare = np.zeros(n, bool)
    m_tgt_full = m_tgt.copy()
    m_tgt[: n][rare] = 0.0  # excluded from the stochastic path
    n_exp_d[: n][rare] = 0.0

    if method == "BINARY-SPLIT":
        ln_axis = np.linspace(np.log(m_min * 0.25), float(ln_mbins[-1]) + 0.1, 512)
        growth_prev_ = growth_prev
        masses_p, out_ct = _binary_split_kernel(
            jax.random.fold_in(key, 13),
            jnp.asarray(np.pad(np.maximum(masses_d, m_min), (0, pad)), jnp.float32),
            jnp.full(n + pad, jnp.float32(physconst.delta_c_sph / growth_prev_)),
            jnp.full(n + pad, jnp.float32(physconst.delta_c_sph / growth)),
            jnp.asarray(ln_axis, jnp.float32),
            jnp.asarray(sigma_table.sigma_of_lnm(ln_axis), jnp.float32),
            jnp.asarray(sigma_table.dsigmasq_of_lnm(ln_axis), jnp.float32),
            jnp.float32(m_min),
            jnp.float32(so.PARKINSON_G0),
            jnp.float32(so.PARKINSON_y1),
            jnp.float32(so.PARKINSON_y2),
            t_max=48,
            capacity=64,
            cap_out=256,
        )
        keep = masses_p >= m_min
        # padded rows carried a fake m_min*... condition: drop them
        if pad:
            keep = keep.at[n:].set(False)
    elif method == "PARTITION":
        if hmf_int not in (hmf.HMF_PS, hmf.HMF_ST):
            raise ValueError("PARTITION sampling requires HMF='PS' or 'ST'")
        delta_d = np.interp(ln_md, ln_mbins, delta_bins)
        delta_d = np.pad(delta_d, (0, pad))
        ln_md_p = np.pad(ln_md, (0, pad))
        sigma_min_s = float(sigma_table.sigma_of_lnm(np.log(m_min)))
        ln_axis, sig_tab, sig_axis, lnm_of_sig = _partition_tables(
            sigma_table, m_min * 0.25, float(np.exp(ln_mbins[-1])) * 1.05
        )
        masses_p, keep = _partition_kernel(
            jax.random.fold_in(key, 13),
            jnp.asarray(delta_d, jnp.float32),
            jnp.asarray(ln_md_p, jnp.float32),
            jnp.asarray(np.pad(m_tgt[: n + pad] > 0, (0, 0))),
            ln_axis, sig_tab, sig_axis, lnm_of_sig,
            jnp.float32(sigma_min_s),
            jnp.float32(m_min),
            jnp.float32(growth),
            jnp.float32(so.HALOMASS_CORRECTION),
            t_max=k_max,
            use_st=hmf_int == hmf.HMF_ST,
        )
        keep = keep & (masses_p >= m_min)
    else:
        u = jax.random.uniform(key, (n + pad, k_max), minval=1e-12, maxval=1.0)
        u_keep = jax.random.uniform(jax.random.fold_in(key, 11), (n + pad, k_max))
        masses_p, keep = _progenitor_draws(
            jnp.asarray(cond_t, jnp.float32),
            jnp.asarray(m_tgt, jnp.float32),
            u,
            u_keep,
            jnp.asarray(inv_tab, jnp.float32),
            jnp.float32(so.MIN_LOGPROB),
            jnp.float32(m_min),
            n_exp=jnp.asarray(n_exp_d, jnp.float32),
            key=jax.random.fold_in(key, 13),
            number_limited=method == "NUMBER-LIMITED",
        )
    masses_p = np.asarray(masses_p)[:n]
    keep = np.asarray(keep)[:n]

    # compact on host; inherit position and correlated rng from descendant
    desc_idx, prog_slot = np.nonzero(keep)
    new_masses = masses_p[desc_idx, prog_slot].astype(np.float32)
    if rare.any():
        rare_idx = np.nonzero(rare)[0]
        desc_idx = np.concatenate([desc_idx, rare_idx])
        new_masses = np.concatenate(
            [new_masses, m_tgt_full[rare_idx].astype(np.float32)]
        )
    pos = np.asarray(prev_cat.halo_coords)[:n_desc][desc_idx]
    corr = (so.CORR_STAR, so.CORR_SFR, so.CORR_LX)
    old_rng = (
        np.asarray(prev_cat.star_rng)[:n_desc][desc_idx],
        np.asarray(prev_cat.sfr_rng)[:n_desc][desc_idx],
        np.asarray(prev_cat.xray_rng)[:n_desc][desc_idx],
    )
    fresh = _property_rng(jax.random.fold_in(key, 7), len(new_masses))
    new_rng = [
        (c * o + np.sqrt(1 - c * c) * np.asarray(f)).astype(np.float32)
        for c, o, f in zip(corr, old_rng, fresh)
    ]
    return HaloCatalog(
        redshift=np.float32(redshift),
        halo_masses=jnp.asarray(new_masses),
        halo_coords=jnp.asarray(pos.astype(np.float32)),
        star_rng=jnp.asarray(new_rng[0]),
        sfr_rng=jnp.asarray(new_rng[1]),
        xray_rng=jnp.asarray(new_rng[2]),
        n_halos=np.int32(len(new_masses)),
    )


@partial(jax.jit, static_argnames=("number_limited",))
def _progenitor_draws(cond_t, m_tgt, u, u_keep, inv_table, lnp_min, m_min,
                      n_exp=None, key=None, *, number_limited=False):
    n_cond, n_prob = inv_table.shape
    ic0 = jnp.clip(cond_t.astype(jnp.int32), 0, n_cond - 2)
    fc = (cond_t - ic0)[:, None]
    lnp = jnp.clip(jnp.log(u), lnp_min, 0.0)
    tp = jnp.clip((lnp - lnp_min) / (0.0 - lnp_min) * (n_prob - 1), 0.0, n_prob - 1.001)
    ip0 = tp.astype(jnp.int32)
    fp = tp - ip0
    t00 = inv_table[ic0[:, None], ip0]
    t01 = inv_table[ic0[:, None], ip0 + 1]
    t10 = inv_table[ic0[:, None] + 1, ip0]
    t11 = inv_table[ic0[:, None] + 1, ip0 + 1]
    ln_m = (t00 * (1 - fp) + t01 * fp) * (1 - fc) + (t10 * (1 - fp) + t11 * fp) * fc
    m = jnp.exp(ln_m)
    if number_limited:
        k_max = m.shape[1]
        n_draw = jax.random.poisson(key, n_exp)
        keep = (jnp.arange(k_max)[None, :] < n_draw[:, None]) & (m >= m_min)
        return m, keep
    # reference two-sided overshoot correction (fix_mass_sample)
    keep = _fix_mass_keep(m, m_tgt, jax.random.fold_in(key, 5))
    keep = keep & (m >= m_min)
    return m, keep


def perturb_halo_catalog(
    redshift: float,
    inputs: InputParameters,
    ics: InitialConditions,
    catalog: HaloCatalog,
) -> PerturbedHaloCatalog:
    """Move halos from Lagrangian to Eulerian positions using the IC
    displacement fields (reference PerturbedHaloCatalog.c:25-149)."""
    from ..ops import cic
    from .perturb import _displacement_factors

    so = inputs.simulation_options
    mo = inputs.matter_options
    _, _, fac_za, fac_2lpt = _displacement_factors(inputs, redshift)
    pt_shape = so.hires_shape if mo.PERTURB_ON_HIGH_RES else so.lowres_shape
    cell = so.box_len / pt_shape[0]

    pos = catalog.halo_coords  # Mpc
    px = pos[:, 0] / cell
    py = pos[:, 1] / cell
    pz = pos[:, 2] / cell * (pt_shape[2] / pt_shape[0] * pt_shape[0] / pt_shape[2])

    def read(v):
        return cic.cic_read(v, px, py, pz)

    disp = jnp.stack(
        [read(ics.vx), read(ics.vy), read(ics.vz)], axis=-1
    ) * jnp.float32(fac_za)
    if mo.PERTURB_ALGORITHM == "2LPT" and ics.vx_2LPT is not None:
        disp = disp - jnp.stack(
            [read(ics.vx_2LPT), read(ics.vy_2LPT), read(ics.vz_2LPT)], axis=-1
        ) * jnp.float32(fac_2lpt)

    box = jnp.asarray(so.box_lens, jnp.float32)
    new_pos = (pos + disp) % box

    return PerturbedHaloCatalog(
        redshift=np.float32(redshift),
        halo_masses=catalog.halo_masses,
        halo_coords=new_pos,
        star_rng=catalog.star_rng,
        sfr_rng=catalog.sfr_rng,
        xray_rng=catalog.xray_rng,
        n_halos=catalog.n_halos,
    )
