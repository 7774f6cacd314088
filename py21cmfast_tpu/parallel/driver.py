"""Mesh-sharded coeval driver: ICs -> perturb -> [Ts ladder] -> ionization
(incl. inhomogeneous recombinations) -> Tb entirely on a `jax.sharding.Mesh`.

This is the multi-chip scale-out path (SURVEY.md §2.3 / §7 step 8): every grid
lives x-slab sharded across the mesh for the whole pipeline; the only host
work is table building (cheap, independent of resolution).

Since round 2 this driver routes through the SAME model-layer compute
functions as the single-device pipeline (`compute_spin_temperature`,
`compute_ionization_field`), whose kernels are written against the
`ops.gridops.GridOps` seam: passing `mesh=` runs them under shard_map with
distributed FFTs (parallel/pfft.py all_to_all transposes) and psum means
(parallel/shardcall.py).  There is no duplicated physics.

Scope: every source model.  Eulerian (CONST-ION-EFF / E-INTEGRAL / L-INTEGRAL)
with USE_TS_FLUCT, USE_MINI_HALOS (sharded v_cb realization + feedback
turnover grids) and RECOMB_MODEL=INHOMOGENEOUS; the halo-sampler models run
the slab CHMF sampler (host-compacted catalogs), sharded painting with
per-halo Mturn reads (parallel/halopaint.py) and the Lagrangian Ts ladder
(models/xray_source.py annular filtering under the mesh GridOps seam).
Displacements are Zel'dovich or 2LPT (PERTURB_ALGORITHM, second-order field
through the distributed FFT).
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

__all__ = ["run_sharded_coeval", "run_sharded_lightcone"]


def run_sharded_coeval(inputs: InputParameters, out_redshifts, mesh=None):
    """Compute snapshots on a device mesh, evolving down the redshift ladder.

    Returns a list of namespaces with x-slab-sharded arrays (leave them on
    device; `np.asarray` gathers).  With USE_TS_FLUCT / INHOMO_RECO the node
    ladder in `inputs.node_redshifts` is scrolled exactly like the
    single-device coeval driver."""
    from ..models.brightness import brightness_temperature
    from ..models.ics import power_amplitude_table
    from ..models.ionization import compute_ionization_field
    from ..models.spintemp import compute_spin_temperature
    from ..outputs import PerturbedField

    if mesh is None:
        mesh = make_mesh()
    so = inputs.simulation_options
    ao = inputs.astro_options
    mo = inputs.matter_options
    cosmo = inputs.cosmology
    hi_shape = so.hires_shape
    lo_shape = so.lowres_shape
    box_lens = so.box_lens
    n_shards = mesh.devices.size

    use_halos = mo.source_model_uses_halo_sampler

    # ----- sharded ICs -----
    ln_k, sqrtp = power_amplitude_table(inputs)
    key = jax.random.PRNGKey(inputs.random_seed)
    white = jax.random.normal(key, hi_shape, dtype=jnp.float32)
    white = jax.device_put(white, NamedSharding(mesh, P(GRID_AXIS, None, None)))
    use_2lpt = mo.PERTURB_ALGORITHM == "2LPT"
    with_vcb = mo.V_CB_MODEL == "FLUCTS"
    ics_fn = build_sharded_lowres_ics(
        mesh, hi_shape, lo_shape, box_lens, use_2lpt=use_2lpt, with_vcb=with_vcb
    )
    vcb_args = ()
    if with_vcb:
        from ..models.ics import vcb_ratio_table

        vcb_args = vcb_ratio_table(inputs)
    lowres_vcb = None
    fields = ics_fn(white, ln_k, sqrtp, *vcb_args)
    if with_vcb:
        *fields, lowres_vcb = fields
    if use_2lpt:
        (hires_density, lowres_density, psi_x, psi_y, psi_z,
         psi2_x, psi2_y, psi2_z) = fields
    else:
        hires_density, lowres_density, psi_x, psi_y, psi_z = fields
        psi2_x = psi2_y = psi2_z = jnp.zeros_like(psi_x)

    out_redshifts = [float(z) for z in np.atleast_1d(np.asarray(out_redshifts))]
    all_z = sorted(
        set(out_redshifts) | set(float(z) for z in inputs.node_redshifts),
        reverse=True,
    )

    # margin for the slab CIC halo exchange: bound the x-displacement once
    # with the largest growth factor among the outputs
    d_init = float(cosmo.dicke(so.INITIAL_REDSHIFT))
    max_fac = max(float(cosmo.dicke(z)) - d_init for z in all_z)
    max_psi = float(jnp.max(jnp.abs(psi_x)))
    max_disp = max_psi * max_fac
    if use_2lpt:
        max_fac2 = max(
            abs((-3.0 / 7.0) * (float(cosmo.dicke(z)) ** 2 - d_init**2))
            for z in all_z
        )
        max_disp += float(jnp.max(jnp.abs(psi2_x))) * max_fac2
    margin = int(np.ceil(max_disp * lo_shape[0] / box_lens[0])) + 3
    margin = min(margin, lo_shape[0] // n_shards)
    perturb_fn = build_sharded_perturb(
        mesh, hi_shape, lo_shape, box_lens, margin, use_2lpt=use_2lpt
    )
    mass_factor = float(np.prod(lo_shape) / np.prod(hi_shape))

    # ----- discrete-halo chain: slab-parallel sampling (ascending z), then
    # per-node sharded painting (parallel/halopaint.py).  The catalogs are
    # host-compacted (same as single-device); DexM's first-snapshot grid scan
    # runs on the sharded hires density through the global-view jnp ops.
    from ..outputs import InitialConditions

    ics_obj = InitialConditions(
        hires_density=hires_density,
        lowres_density=lowres_density,
        lowres_vcb=lowres_vcb,
        vx=psi_x, vy=psi_y, vz=psi_z,
        vx_2LPT=psi2_x if use_2lpt else None,
        vy_2LPT=psi2_y if use_2lpt else None,
        vz_2LPT=psi2_z if use_2lpt else None,
    )
    halo_cats = None
    if use_halos:
        from .sampler import determine_halo_catalog_slabs

        halo_cats = {}
        cat = None
        for z in sorted(all_z):
            cat = determine_halo_catalog_slabs(
                z, inputs, ics_obj, previous_catalog=cat
            )
            halo_cats[z] = cat

    prev_ion = None
    prev_pf = None
    ts_state = None
    prev_ts = None
    prev_z = None
    halobox_nodes = []  # (z, HaloBox) history for the XraySourceBox shells
    out = []
    for z in all_z:
        D = float(cosmo.dicke(z))
        fac_za = D - d_init
        fac_2lpt = (-3.0 / 7.0) * (D**2 - d_init**2)
        dDdt_over_D = float(cosmo.ddicke_dt(z) / D)
        delta, v_z = perturb_fn(
            hires_density, psi_x, psi_y, psi_z, psi2_x, psi2_y, psi2_z,
            jnp.float32(d_init), jnp.float32(fac_za), jnp.float32(fac_2lpt),
            jnp.float32(mass_factor), jnp.float32(dDdt_over_D),
        )
        pf = PerturbedField(
            redshift=np.float32(z), density=delta, velocity_z=v_z
        )

        halobox = None
        if use_halos:
            from ..models.halobox import _mcrit_grids, compute_fixed_halo_grid
            from ..models.halos import perturb_halo_catalog
            from ..models.hmf import set_scaling_constants
            from .halopaint import sharded_halo_grids

            pt_halos = perturb_halo_catalog(z, inputs, ics_obj, halo_cats[z])
            halobox = sharded_halo_grids(
                z, inputs, pt_halos, mesh,
                previous_spin_temp=prev_ts,
                previous_ionized_box=prev_ion,
                lowres_vcb=lowres_vcb,
            )
            # deterministic sub-SAMPLER_MIN_MASS sources (HaloBox.c:626-640);
            # the table kernel is elementwise in delta, sharding-transparent
            mt_a_grid = mt_m_grid = None
            if ao.USE_MINI_HALOS:
                mt_a_grid, mt_m_grid = _mcrit_grids(
                    z, inputs, set_scaling_constants(z, inputs),
                    prev_ts, prev_ion, lowres_vcb,
                )
            sub = compute_fixed_halo_grid(
                z, inputs, lowres_density, m_max=so.SAMPLER_MIN_MASS,
                mt_a_grid=mt_a_grid, mt_m_grid=mt_m_grid, ics=ics_obj,
            )
            if sub is not None:
                halobox.n_ion = halobox.n_ion + sub.n_ion
                halobox.halo_sfr = halobox.halo_sfr + sub.halo_sfr
                halobox.whalo_sfr = halobox.whalo_sfr + sub.whalo_sfr
                halobox.halo_xray = halobox.halo_xray + sub.halo_xray
                if ao.USE_MINI_HALOS and sub.halo_sfr_mini is not None:
                    halobox.halo_sfr_mini = (
                        halobox.halo_sfr_mini + sub.halo_sfr_mini
                    )
                    halobox.halo_stars_mini = (
                        halobox.halo_stars_mini + sub.halo_stars_mini
                    )

        ts = None
        if ao.USE_TS_FLUCT:
            source_box = None
            if halobox is not None:
                from ..models.xray_source import compute_xray_source_field

                halobox_nodes.append((z, halobox))
                ts_started = ts_state is not None and z < so.Z_HEAT_MAX
                if ts_started:
                    source_box = compute_xray_source_field(
                        z, inputs, halobox_nodes,
                        previous_ionized_box=prev_ion, mesh=mesh,
                    )
            ts, ts_state = compute_spin_temperature(
                z, inputs, pf,
                prev_state=ts_state,
                prev_redshift=prev_z,
                initial_conditions=ics_obj,
                source_box=source_box,
                previous_ionized_box=prev_ion,
                mesh=mesh,
            )

        ion = compute_ionization_field(
            z, inputs, pf,
            previous_ionized_box=prev_ion,
            spin_temp=ts,
            halobox=halobox,
            previous_perturbed_field=prev_pf,
            prev_redshift=prev_z,
            vcb_box=lowres_vcb,
            mesh=mesh,
        )
        tb = brightness_temperature(inputs, ion, pf, spin_temp=ts)

        if (not out_redshifts) or any(abs(z - oz) < 1e-8 for oz in out_redshifts):
            out.append(SimpleNamespace(
                redshift=z,
                density=delta,
                velocity_z=v_z,
                neutral_fraction=ion.neutral_fraction,
                brightness_temp=tb.brightness_temp,
                spin_temperature=ts.spin_temperature if ts is not None else None,
                cumulative_recombinations=ion.cumulative_recombinations,
                # Coeval-shaped views for the Lightconer interface
                perturbed_field=pf,
                ionized_box=ion,
                spin_temp=ts,
                brightness_temperature=tb,
            ))
        prev_ion, prev_pf, prev_ts, prev_z = ion, pf, ts, z
    return out


def run_sharded_lightcone(
    inputs: InputParameters,
    mesh=None,
    lightconer=None,
    min_redshift: float | None = None,
    max_redshift: float | None = None,
    global_quantities=("brightness_temp", "neutral_fraction"),
    include_dvdr_in_tau21: bool = True,
    apply_rsds: bool = True,
):
    """Mesh-sharded lightcone: the node scroll runs entirely on the device
    mesh (run_sharded_coeval), slice interpolation + global means run on the
    sharded arrays (jnp ops propagate the sharding), and only the finished
    (N, N, n_slices) lightcone slices come back to the host, where the same
    dvdr/RSD finalization as the single-device driver applies."""
    from ..drivers.lightcone import LightCone
    from ..lightconers import RectilinearLightconer
    from .. import rsds as rsds_module

    if not inputs.node_redshifts:
        if min_redshift is None:
            raise ValueError("need node_redshifts or min_redshift")
        inputs = inputs.with_logspaced_redshifts(
            min_redshift, max_redshift or inputs.simulation_options.Z_HEAT_MAX
        )
    node_z = np.asarray(inputs.node_redshifts)  # descending
    cosmo = inputs.cosmology

    if lightconer is None:
        lightconer = RectilinearLightconer.with_equal_cdist_slices(
            min_redshift=float(node_z.min()),
            max_redshift=float(node_z.max()),
            inputs=inputs,
            quantities=("brightness_temp",)
            + (("tau_21",) if inputs.astro_options.USE_TS_FLUCT else ()),
        )
    quantities = set(lightconer.quantities)
    if apply_rsds or include_dvdr_in_tau21:
        quantities.add("velocity_z")
    quantities = tuple(quantities)

    n_slices = lightconer.n_slices
    shape2d = inputs.simulation_options.lowres_shape[:2]
    lightcones = {q: np.zeros(shape2d + (n_slices,), np.float32) for q in quantities}
    gq = {q: [] for q in global_quantities}

    nodes = run_sharded_coeval(inputs, list(node_z), mesh=mesh)
    prev = None
    for coeval in nodes:
        for q in global_quantities:
            gq[q].append(float(jnp.mean(lightconer.get_field(coeval, q, device=True))))
        if prev is not None:
            for q in quantities:
                idx, vals = lightconer.make_lightcone_slices(
                    coeval, prev, cosmo, inputs, q
                )
                if idx is not None:
                    lightcones[q][:, :, idx] = vals
        prev = coeval

    lc_z = lightconer.lc_redshifts(cosmo)
    if include_dvdr_in_tau21 and "brightness_temp" in lightcones:
        tau = lightcones.get("tau_21") if inputs.astro_options.USE_TS_FLUCT else None
        lightcones["brightness_temp"] = rsds_module.include_dvdr_in_tau21(
            lightcones["brightness_temp"], lightcones["velocity_z"], lc_z,
            inputs, periodic=False, tau_21=tau,
        )
    if apply_rsds and "brightness_temp" in lightcones:
        lightcones["brightness_temp"] = rsds_module.apply_rsds(
            lightcones["brightness_temp"], lightcones["velocity_z"], lc_z,
            inputs, periodic=False,
        )
    return LightCone(
        inputs=inputs,
        lightconer=lightconer,
        lightcones=lightcones,
        global_quantities={q: np.array(v) for q, v in gq.items()},
        node_redshifts=node_z,
    )
