"""Global (0-D) evolution driver: the sky-averaged 21-cm signal.

Equivalent of reference drivers/global_evolution.py:26-411: runs the spin
temperature + ionization chain on a single mean-density "cell" (delta = 0),
replacing the excursion set with the analytic global filling factor
Q_HII = zeta * <Nion>(z), and dQ/dz-based Gamma12.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..cosmology.constants import physconst
from ..inputs import InputParameters
from ..models import hmf
from ..models.brightness import brightness_temperature
from ..models.ionization import _get_sigma_table
from ..models.spintemp import compute_spin_temperature
from ..outputs import IonizedBox, PerturbedField

__all__ = ["GlobalEvolution", "run_global_evolution"]


@dataclasses.dataclass
class GlobalEvolution:
    """Global histories over node redshifts (reference GlobalEvolution:131)."""

    inputs: InputParameters
    redshifts: np.ndarray
    neutral_fraction: np.ndarray
    brightness_temp: np.ndarray
    spin_temperature: np.ndarray | None
    kinetic_temperature: np.ndarray | None
    xray_ionised_fraction: np.ndarray | None
    ionisation_rate_G12: np.ndarray


def run_global_evolution(
    inputs: InputParameters,
    min_redshift: float | None = None,
    max_redshift: float | None = None,
) -> GlobalEvolution:
    if not inputs.node_redshifts:
        inputs = inputs.with_logspaced_redshifts(
            min_redshift if min_redshift is not None else 5.5,
            max_redshift or inputs.simulation_options.Z_HEAT_MAX,
        )
    # single-cell 0-D mode (reference uses HII_DIM=1; here we keep the user's
    # HII_DIM irrelevant by building 1-cell fields directly)
    inputs1 = inputs.evolve_input_structs(HII_DIM=1, DIM=2, BOX_LEN=1.5)
    so = inputs1.simulation_options
    shape = so.lowres_shape
    cosmo = inputs.cosmology
    ao = inputs.astro_options
    sigma_table = _get_sigma_table(inputs)
    hmf_int = hmf.HMF_NAMES[inputs.matter_options.HMF]
    ln_mmax = np.log(hmf.M_MAX_INTEGRAL)

    node_z = np.asarray(inputs.node_redshifts)
    xh_list, tb_list, g12_list = [], [], []
    ts_list, tk_list, xe_list = [], [], []

    ts_state, prev_z, prev_q = None, None, None
    for z in node_z:
        pf = PerturbedField(
            redshift=np.float32(z),
            density=jnp.zeros(shape, jnp.float32),
            velocity_z=jnp.zeros(shape, jnp.float32),
        )
        ts = None
        if ao.USE_TS_FLUCT:
            ts, ts_state = compute_spin_temperature(
                float(z), inputs1, pf, prev_state=ts_state, prev_redshift=prev_z
            )

        # analytic global filling factor (compute_global_reionization_at_z)
        sc = hmf.set_scaling_constants(float(z), inputs)
        m_min = hmf.minimum_source_mass(float(z), inputs)
        if inputs.matter_options.source_model_is_mass_dependent:
            nion = float(
                hmf.nion_general(
                    sigma_table, cosmo, hmf_int, float(z), np.log(m_min), ln_mmax,
                    sc.mturn_a_nofb, sc,
                )
            )
            zeta = sc.pop2_ion * sc.fstar_10 * sc.fesc_10
        else:
            nion = float(
                hmf.fcoll_general(sigma_table, cosmo, hmf_int, float(z), np.log(m_min), ln_mmax)
            )
            zeta = inputs.astro_params.HII_EFF_FACTOR
        q_hi = max(1.0 - zeta * nion, 0.0)

        if prev_q is not None and prev_z is not None and z != prev_z:
            dqdz = (q_hi - prev_q) / (z - prev_z)
            dzdt = -(1.0 + z) * float(cosmo.hubble(float(z)))
            g12 = abs(dqdz * dzdt)
        else:
            g12 = 0.0

        ion = IonizedBox(
            redshift=np.float32(z),
            neutral_fraction=jnp.full(shape, q_hi, jnp.float32),
            z_reion=jnp.full(shape, -1.0 if q_hi > 0 else z, jnp.float32),
            ionisation_rate_G12=jnp.full(shape, g12, jnp.float32),
            mean_f_coll=np.float32(nion),
            mean_f_coll_MINI=np.float32(0.0),
            log10_Mturnover_ave=np.float32(np.log10(sc.mturn_a_nofb)),
            log10_Mturnover_MINI_ave=np.float32(0.0),
        )
        if ao.USE_TS_FLUCT:
            # fold the x-ray pre-ionization into the neutral fraction
            xh_eff = np.clip(
                q_hi - float(np.mean(np.asarray(ts.xray_ionised_fraction))), 0.0, 1.0
            )
            ion = dataclasses.replace(
                ion, neutral_fraction=jnp.full(shape, xh_eff, jnp.float32)
            )

        tb = brightness_temperature(inputs1, ion, pf, spin_temp=ts)

        xh_list.append(float(np.mean(np.asarray(ion.neutral_fraction))))
        tb_list.append(float(np.mean(np.asarray(tb.brightness_temp))))
        g12_list.append(g12)
        if ts is not None:
            ts_list.append(float(np.mean(np.asarray(ts.spin_temperature))))
            tk_list.append(float(np.mean(np.asarray(ts.kinetic_temp_neutral))))
            xe_list.append(float(np.mean(np.asarray(ts.xray_ionised_fraction))))
        prev_z, prev_q = float(z), q_hi

    return GlobalEvolution(
        inputs=inputs,
        redshifts=node_z,
        neutral_fraction=np.array(xh_list),
        brightness_temp=np.array(tb_list),
        spin_temperature=np.array(ts_list) if ts_list else None,
        kinetic_temperature=np.array(tk_list) if tk_list else None,
        xray_ionised_fraction=np.array(xe_list) if xe_list else None,
        ionisation_rate_G12=np.array(g12_list),
    )
