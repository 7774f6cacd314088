"""Mesh-sharded coeval driver: ICs -> perturb -> ionization -> Tb entirely on
a `jax.sharding.Mesh`, with slab-decomposed FFTs and ppermute halo exchange.

This is the multi-chip scale-out path (SURVEY.md §2.3 / §7 step 8): every grid
lives x-slab sharded across the mesh for the whole pipeline; the only host
work is table building (cheap, independent of resolution).

Scope (vs the full single-device driver): Zel'dovich displacements, the
saturated-Ts brightness temperature, and the CONST-ION-EFF / E-INTEGRAL source
models — the pieces whose memory footprint actually forces multi-chip.  The
remaining components (Ts ladder, halo sampler) compose the same way and are
roadmapped.
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..inputs import InputParameters
from .mesh import GRID_AXIS, make_mesh
from .perturb import build_sharded_lowres_ics, build_sharded_perturb
from .snapshot import build_sharded_snapshot

__all__ = ["run_sharded_coeval"]


def run_sharded_coeval(inputs: InputParameters, out_redshifts, mesh=None):
    """Compute (delta, v_z, xH, Tb) snapshots on a device mesh.

    Returns a list of namespaces with x-slab-sharded arrays (leave them on
    device; `np.asarray` gathers)."""
    from ..models import hmf
    from ..models.brightness import brightness_constant
    from ..models.ics import power_amplitude_table
    from ..models.ionization import (
        CHEBY_DEG,
        N_DELTA_TABLE,
        _build_nion_tables,
        _fit_log_cheby,
        _get_sigma_table,
        setup_radii,
    )

    if mesh is None:
        mesh = make_mesh()
    so = inputs.simulation_options
    mo = inputs.matter_options
    ap = inputs.astro_params
    cosmo = inputs.cosmology
    hi_shape = so.hires_shape
    lo_shape = so.lowres_shape
    box_lens = so.box_lens
    n_shards = mesh.devices.size

    # ----- sharded ICs -----
    ln_k, sqrtp = power_amplitude_table(inputs)
    key = jax.random.PRNGKey(inputs.random_seed)
    white = jax.random.normal(key, hi_shape, dtype=jnp.float32)
    white = jax.device_put(white, NamedSharding(mesh, P(GRID_AXIS, None, None)))
    ics_fn = build_sharded_lowres_ics(mesh, hi_shape, lo_shape, box_lens)
    hires_density, lowres_density, psi_x, psi_y, psi_z = ics_fn(white, ln_k, sqrtp)

    # margin for the slab CIC halo exchange: bound the x-displacement once
    # with the largest growth factor among the outputs
    zs = sorted(float(z) for z in np.atleast_1d(out_redshifts))
    d_init = float(cosmo.dicke(so.INITIAL_REDSHIFT))
    max_fac = max(float(cosmo.dicke(z)) - d_init for z in zs)
    max_psi = float(jnp.max(jnp.abs(psi_x)))
    margin = int(np.ceil(max_psi * max_fac * lo_shape[0] / box_lens[0])) + 3
    margin = min(margin, lo_shape[0] // n_shards)
    perturb_fn = build_sharded_perturb(mesh, hi_shape, lo_shape, box_lens, margin)

    sigma_table = _get_sigma_table(inputs)
    hmf_int = hmf.HMF_NAMES[mo.HMF]
    mass_dep = mo.source_model_is_mass_dependent
    snapshot_fns = {}  # keyed by whether the cheby fit passed at that z
    mass_factor = float(np.prod(lo_shape) / np.prod(hi_shape))

    out = []
    for z in sorted(zs, reverse=True):
        D = float(cosmo.dicke(z))
        fac_za = D - d_init
        dDdt_over_D = float(cosmo.ddicke_dt(z) / D)
        delta, v_z = perturb_fn(
            hires_density, psi_x, psi_y, psi_z,
            jnp.float32(d_init), jnp.float32(fac_za),
            jnp.float32(mass_factor), jnp.float32(dDdt_over_D),
        )

        # ----- host tables + global normalization (as in compute_ionization_field)
        sc = hmf.set_scaling_constants(z, inputs)
        m_min = hmf.minimum_source_mass(z, inputs, xray=False)
        sigma_min = float(cosmo.sigma_z0(m_min))
        ln_m_min, ln_m_max = np.log(m_min), np.log(hmf.M_MAX_INTEGRAL)
        ladder = setup_radii(inputs, m_min)
        if mass_dep:
            ion_eff = sc.pop2_ion * sc.fstar_10 * sc.fesc_10
            mean_fcoll = float(hmf.nion_general(
                sigma_table, cosmo, hmf_int, z, ln_m_min, ln_m_max,
                sc.mturn_a_nofb, sc))
            f_limit = float(hmf.nion_general(
                sigma_table, cosmo, hmf_int, so.Z_HEAT_MAX, ln_m_min, ln_m_max,
                sc.mturn_a_nofb, sc))
            d_lo, d_hi, tables, caps = _build_nion_tables(
                inputs, ladder, sigma_table, D, m_min, sc)
            coeffs, log_edge, cheby_ok = _fit_log_cheby(tables, caps)
            if cheby_ok:
                tables = np.concatenate([coeffs, log_edge[:, None]], axis=1)
        else:
            cheby_ok = False
            ion_eff = ap.HII_EFF_FACTOR
            mean_fcoll = float(hmf.fcoll_general(
                sigma_table, cosmo, hmf_int, z, ln_m_min, ln_m_max))
            f_limit = 1e-7
            n_r = ladder.n
            d_lo = np.zeros(n_r)
            d_hi = np.ones(n_r)
            tables = np.zeros((n_r, N_DELTA_TABLE))
            caps = np.zeros(n_r)

        order = np.argsort(ladder.R)[::-1]
        if cheby_ok not in snapshot_fns:
            snapshot_fns[cheby_ok] = build_sharded_snapshot(
                mesh, lo_shape, box_lens, inputs.astro_options.hii_filter_int,
                mass_dep, n_delta_table=N_DELTA_TABLE, use_cheby=cheby_ok,
            )
        snapshot_fn = snapshot_fns[cheby_ok]
        tb_const = brightness_constant(inputs, z)
        xh, tb = snapshot_fn(
            delta,
            jnp.asarray(ladder.R[order], jnp.float32),
            jnp.asarray(ladder.sigma_max[order], jnp.float32),
            jnp.asarray(d_lo[order], jnp.float32),
            jnp.asarray(d_hi[order], jnp.float32),
            jnp.asarray(tables[order], jnp.float32),
            jnp.asarray(caps[order], jnp.float32),
            jnp.float32(mean_fcoll),
            jnp.float32(f_limit),
            jnp.float32(ion_eff),
            jnp.float32(sigma_min),
            jnp.float32(D),
            jnp.float32(tb_const),
        )
        out.append(SimpleNamespace(
            redshift=z, density=delta, velocity_z=v_z,
            neutral_fraction=xh, brightness_temp=tb,
        ))
    return out
