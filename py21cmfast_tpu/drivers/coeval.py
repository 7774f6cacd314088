"""Coeval-cube driver: the full snapshot pipeline.

Equivalent of reference drivers/coeval.py:521-992 (`generate_coeval`/`run_coeval`).
The redshift scroll is a host loop (inherently sequential); each snapshot runs
as a handful of jitted super-kernels (perturb -> [halos/Ts] -> ionize -> Tb).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..inputs import InputParameters
from ..models.brightness import brightness_temperature
from ..models.ics import compute_initial_conditions
from ..models.ionization import compute_ionization_field
from ..models.perturb import perturb_field
from ..outputs import (
    BrightnessTemp,
    InitialConditions,
    IonizedBox,
    PerturbedField,
    TsBox,
)

__all__ = ["Coeval", "run_coeval", "generate_coeval"]


@dataclasses.dataclass
class Coeval:
    """All output boxes at one redshift (reference coeval.py:61)."""

    redshift: float
    initial_conditions: InitialConditions
    perturbed_field: PerturbedField
    ionized_box: IonizedBox
    brightness_temperature: BrightnessTemp
    spin_temp: TsBox | None = None
    halobox: object | None = None

    @property
    def brightness_temp(self):
        return self.brightness_temperature.brightness_temp

    @property
    def neutral_fraction(self):
        return self.ionized_box.neutral_fraction

    @property
    def density(self):
        return self.perturbed_field.density


def _slim_chain_ion(ion: IonizedBox | None, keep_xh: bool) -> IonizedBox | None:
    """Prune an IonizedBox to the fields the NEXT snapshot actually reads.

    The chain consumes z_reion + ionisation_rate_G12 (spintemp/minihalo
    feedback), cumulative_recombinations, the mean_f_coll scalars and the
    unnormalised_nion stacks; neutral_fraction is only read by the
    XraySourceBox lookback (halo-model sources), and mean_free_path /
    kinetic_temperature are pure outputs.  At 512^3 each dropped grid is
    0.5 GiB of HBM that would otherwise stay live through the next node's
    ionization scan."""
    if ion is None:
        return ion
    return dataclasses.replace(
        ion,
        neutral_fraction=ion.neutral_fraction if keep_xh else None,
        mean_free_path=None,
        kinetic_temperature=None,
    )


def _slim_chain_pf(pf: PerturbedField | None, needed: bool):
    """The previous PerturbedField is only read by the minihalo Nion
    trapezoid (ionization track_nion), and then only its density."""
    if pf is None or not needed:
        return None
    return dataclasses.replace(
        pf, velocity_z=None, velocity_x=None, velocity_y=None,
    )


def _required_redshifts(inputs: InputParameters, out_redshifts):
    """Union of node redshifts and requested outputs, descending
    (reference _get_required_redshifts_coeval, coeval.py:971)."""
    zs = set(float(z) for z in out_redshifts)
    zs |= set(float(z) for z in inputs.node_redshifts)
    return sorted(zs, reverse=True)


def hostify(struct):
    """Move an output struct's arrays to host numpy (the TPU analog of the
    reference's purge-to-disk array state machine, wrapper/arrays.py:374-436):
    jitted kernels re-upload the leaves per call and the upload buffers are
    freed when the call returns, so the struct stops occupying HBM between
    uses."""
    import jax

    return jax.tree_util.tree_map(
        lambda a: np.asarray(jax.device_get(a)) if hasattr(a, "devices") else a,
        struct,
    )


def generate_coeval(
    inputs: InputParameters,
    out_redshifts=(),
    initial_conditions: InitialConditions | None = None,
    cache=None,
    cache_config=None,
    regenerate: bool = False,
    ics_on_host: bool = False,
):
    """Yield Coeval objects at each requested redshift, evolving down the
    node-redshift ladder (reference _redshift_loop_generator, coeval.py:749).

    With an `OutputCache` passed as `cache`, every computed box is written to
    disk and the scroll resumes after the last fully-cached node on re-entry
    (reference coeval.py:700-747 + io/caching.py RunCache.is_complete_at);
    `regenerate=True` recomputes everything while still writing."""
    from ..models import spintemp as spintemp_module

    ao = inputs.astro_options
    mo = inputs.matter_options
    out_redshifts = [float(z) for z in np.atleast_1d(np.asarray(out_redshifts))]
    all_z = _required_redshifts(inputs, out_redshifts)
    if not all_z:
        raise ValueError("no redshifts requested")

    needs_evolution = ao.USE_TS_FLUCT or ao.uses_recombination or inputs.node_redshifts

    if cache is not None and cache_config is None:
        from ..io.caching import CacheConfig

        cache_config = CacheConfig()

    def _cache_write(box, z=None):
        if cache is not None and cache_config.writes(type(box).__name__):
            cache.write(box, inputs, z)

    if initial_conditions is None:
        if cache is not None and not regenerate:
            initial_conditions = cache.read(InitialConditions, inputs)
        if initial_conditions is None:
            initial_conditions = compute_initial_conditions(inputs)
            _cache_write(initial_conditions)
    if ics_on_host:
        # big-box mode: ~DIM^3 x 8 fields of ICs would otherwise stay live in
        # HBM through every node's ionization scan (4 GiB at 512^3)
        initial_conditions = hostify(initial_conditions)

    # resume: index of the last node (in descending-z scroll order) for which
    # every chain-coupling box is already cached
    resume_i = -1
    if cache is not None and not regenerate and needs_evolution:
        from ..io.caching import RunCache

        rc = RunCache(cache, inputs)
        for i, z in enumerate(all_z):
            if rc.is_complete_at(z):
                resume_i = i
            else:
                break

    # photon non-conservation setup (reference _setup_ics_and_pfs_for_scrolling)
    photoncons_state = None
    if ao.PHOTON_CONS_TYPE != "NO-PHOTONCONS":
        from ..models.photoncons import setup_photon_cons

        photoncons_state = setup_photon_cons(inputs)

    # --- halo evolution chain (reference evolve_halos, coeval.py:435):
    # discrete catalogs are sampled ascending in z — DexM + grid CHMF at the
    # lowest node, then progenitors of each catalog at the next-higher node.
    resumed = set(all_z[: resume_i + 1])
    catalogs = {}
    if mo.source_model_uses_halo_sampler:
        from ..models import halos as halos_module

        cat = None
        for z in sorted(all_z):
            if z in resumed:
                break  # resumed nodes are the high-z tail of the ascending chain
            cat = halos_module.determine_halo_catalog(
                z, inputs, initial_conditions, previous_catalog=cat
            )
            catalogs[z] = cat

    # one deposit plan for the whole scroll: stats at the lowest node bound
    # every node, so the deposit kernels keep a single compiled variant and
    # the per-node stats device-sync disappears (see perturb.plan_deposit_for_run)
    deposit_plan = None
    if mo.PERTURB_ALGORITHM != "LINEAR":
        from ..models.perturb import plan_deposit_for_run, uses_swept_deposit

        if uses_swept_deposit(inputs):
            deposit_plan = plan_deposit_for_run(
                inputs, initial_conditions, min(all_z)
            )

    # Under MINIMIZE_MEMORY, the swept-deposit scroll reads the hires density
    # only through the run-constant channel stack (perturb._channel_stack_for,
    # built at the first node); for source models that never touch hires IC
    # fields again (integral models; samplers/DEXM read them per node) the
    # DIM^3 buffer can be released from HBM after that build — at the
    # reference's faithful DIM = 4 x HII_DIM ratio the hires grid is 4 GiB of
    # dead weight on a 16 GiB chip (the difference between a DIM=1024 run
    # fitting or RESOURCE_EXHAUSTING).  The deleted buffer raises loudly if
    # anything does read it later.
    release_hires = (
        mo.MINIMIZE_MEMORY
        and deposit_plan is not None
        and not mo.source_model_uses_halo_sampler
        and cache is None
    )

    prev_ion: IonizedBox | None = None
    prev_ts = None
    prev_z = None
    prev_pf = None
    ts_state = None
    halobox_nodes = []  # (z, HaloBox) history for the XraySourceBox shells
    pending_validation = None

    for i, z in enumerate(all_z):
        if z in resumed:
            # reload the chain-coupling boxes instead of recomputing
            pf = cache.read(PerturbedField, inputs, z)
            ion = cache.read(IonizedBox, inputs, z)
            ts = cache.read(TsBox, inputs, z) if ao.USE_TS_FLUCT else None
            halobox = cache.read("HaloBox", inputs, z)
            if halobox is not None and ao.USE_TS_FLUCT:
                halobox_nodes.append((z, halobox))
            ts_state = ts if ts is not None else ts_state
            if (not out_redshifts) or any(abs(z - oz) < 1e-8 for oz in out_redshifts):
                tb = cache.read(BrightnessTemp, inputs, z)
                yield Coeval(
                    redshift=z,
                    initial_conditions=initial_conditions,
                    perturbed_field=pf,
                    ionized_box=ion,
                    brightness_temperature=tb,
                    spin_temp=ts,
                    halobox=halobox,
                )
            prev_ion, prev_ts, prev_z, prev_pf = ion, ts, z, pf
            continue

        pf = perturb_field(z, inputs, initial_conditions,
                           deposit_plan=deposit_plan)
        if release_hires:
            # channel stack exists now (built by the first perturb); the
            # hires density is dead for the rest of the scroll — free 4 GiB
            # of HBM at DIM=1024 (see the release_hires note above)
            release_hires = False
            buf = initial_conditions.hires_density
            if hasattr(buf, "delete") and not getattr(buf, "is_deleted", lambda: False)():
                buf.delete()

        halobox = None
        if mo.source_model_uses_halo_sampler:
            from ..models import halobox as halobox_module
            from ..models import halos as halos_module

            pt_halos = halos_module.perturb_halo_catalog(
                z, inputs, initial_conditions, catalogs[z]
            )
            halobox = halobox_module.compute_halo_grid(
                z, inputs, pt_halos,
                previous_spin_temp=prev_ts, previous_ionized_box=prev_ion,
                lagrangian_delta=initial_conditions.lowres_density,
                lowres_vcb=initial_conditions.lowres_vcb,
                ics=initial_conditions,
            )
        elif mo.SOURCE_MODEL == "L-INTEGRAL":
            from ..models import halobox as halobox_module
            from ..models.hmf import set_scaling_constants

            mt_a_grid = mt_m_grid = None
            if ao.USE_MINI_HALOS:
                mt_a_grid, mt_m_grid = halobox_module._mcrit_grids(
                    z, inputs, set_scaling_constants(z, inputs),
                    prev_ts, prev_ion, initial_conditions.lowres_vcb,
                )
            halobox = halobox_module.compute_fixed_halo_grid(
                z, inputs, initial_conditions.lowres_density,
                mt_a_grid=mt_a_grid, mt_m_grid=mt_m_grid,
                ics=initial_conditions,
            )

        # prev_ts has no reader past this point in the iteration (the Ts
        # evolution carrier is ts_state); release it before the heavy kernels
        prev_ts = None

        ts = None
        if ao.USE_TS_FLUCT:
            source_box = None
            if halobox is not None:
                from ..models.xray_source import compute_xray_source_field

                halobox_nodes.append((z, halobox))
                ts_started = ts_state is not None and z < inputs.simulation_options.Z_HEAT_MAX
                if ts_started:
                    source_box = compute_xray_source_field(
                        z, inputs, halobox_nodes, previous_ionized_box=prev_ion
                    )
            ts, ts_state = spintemp_module.compute_spin_temperature(
                z,
                inputs,
                pf,
                prev_state=ts_state,
                prev_redshift=prev_z,
                initial_conditions=initial_conditions,
                source_box=source_box,
                previous_ionized_box=prev_ion,
            )
            # overlap the next node's host-side SFRD tables with this node's
            # device kernels (worker thread; see spintemp.prefetch_sfrd_tables)
            if i + 1 < len(all_z):
                spintemp_module.prefetch_sfrd_tables(all_z[i + 1], inputs)

        ion = compute_ionization_field(
            z,
            inputs,
            pf,
            previous_ionized_box=prev_ion,
            spin_temp=ts,
            halobox=halobox,
            previous_perturbed_field=prev_pf,
            prev_redshift=prev_z,
            photoncons_state=photoncons_state,
            vcb_box=initial_conditions.lowres_vcb,
        )
        tb = brightness_temperature(inputs, ion, pf, spin_temp=ts)

        from ..exceptions import begin_validate_snapshot, check_nonfinite

        # lag-1 validation: check the PREVIOUS node's non-finite sweep now
        # (its result is long since ready), launch this node's without a sync
        check_nonfinite(pending_validation)
        pending_validation = begin_validate_snapshot(z, pf, halobox, ts, ion, tb)

        if cache is not None:
            _cache_write(pf, z)
            if halobox is not None:
                _cache_write(halobox, z)
            if ts is not None:
                _cache_write(ts, z)
            _cache_write(ion, z)
            _cache_write(tb, z)

        coeval = Coeval(
            redshift=z,
            initial_conditions=initial_conditions,
            perturbed_field=pf,
            ionized_box=ion,
            brightness_temperature=tb,
            spin_temp=ts,
            halobox=halobox,
        )
        if (not out_redshifts) or any(abs(z - oz) < 1e-8 for oz in out_redshifts):
            yield coeval

        # chain memory discipline: keep only what the next snapshot reads —
        # the consumer owns the full boxes through the yielded Coeval
        uses_source_grids = halobox is not None
        prev_ion = _slim_chain_ion(ion, keep_xh=uses_source_grids)
        prev_ts = ts
        prev_z = z
        prev_pf = _slim_chain_pf(pf, needed=ao.USE_MINI_HALOS)
        del coeval, ion, tb, pf, ts, halobox
        if not needs_evolution:
            prev_ion = None  # no coupling between snapshots

    # the last node's sweep has no successor to check it
    from ..exceptions import check_nonfinite

    check_nonfinite(pending_validation)


def run_coeval(
    inputs: InputParameters,
    out_redshifts,
    initial_conditions: InitialConditions | None = None,
    cache=None,
):
    """Compute coeval boxes at the given redshifts (reference run_coeval:690)."""
    single = np.isscalar(out_redshifts)
    coevals = list(
        generate_coeval(inputs, np.atleast_1d(out_redshifts), initial_conditions, cache)
    )
    return coevals[0] if single and len(coevals) == 1 else coevals
