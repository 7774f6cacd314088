"""Lightcone driver.

Equivalent of reference drivers/lightcone.py:49-734: scroll the coeval pipeline
down the node redshifts, interpolate each adjacent pair onto lightcone slices,
record global quantities, and at the end apply the velocity-gradient correction
and RSDs along the line of sight.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .. import rsds as rsds_module
from ..inputs import InputParameters
from ..lightconers import Lightconer, RectilinearLightconer
from ..outputs import InitialConditions
from .coeval import generate_coeval

__all__ = ["LightCone", "run_lightcone", "generate_lightcone"]


@dataclasses.dataclass
class LightCone:
    """Assembled lightcone(s) + global history (reference lightcone.py:49-372)."""

    inputs: InputParameters
    lightconer: Lightconer
    lightcones: dict  # quantity -> (N, N, n_slices)
    global_quantities: dict  # quantity -> array over node redshifts
    node_redshifts: np.ndarray
    log10_mturnovers: np.ndarray | None = None

    @property
    def brightness_temp(self):
        return self.lightcones.get("brightness_temp")

    @property
    def lc_distances(self):
        return self.lightconer.lc_distances

    @property
    def lc_redshifts(self):
        return self.lightconer.lc_redshifts(self.inputs.cosmology)

    @property
    def global_xH(self):
        return self.global_quantities.get("neutral_fraction")

    @property
    def shape(self):
        q = next(iter(self.lightcones.values()))
        return q.shape


def generate_lightcone(
    inputs: InputParameters,
    lightconer: Lightconer | None = None,
    max_redshift: float | None = None,
    min_redshift: float | None = None,
    initial_conditions: InitialConditions | None = None,
    global_quantities=("brightness_temp", "neutral_fraction"),
    include_dvdr_in_tau21: bool = True,
    apply_rsds: bool = True,
    cache=None,
):
    """Yield (z, coeval, partial LightCone); final yield carries the finished cone."""
    if not inputs.node_redshifts:
        if min_redshift is None:
            raise ValueError("need node_redshifts or min_redshift")
        inputs = inputs.with_logspaced_redshifts(
            min_redshift, max_redshift or inputs.simulation_options.Z_HEAT_MAX
        )
    node_z = np.asarray(inputs.node_redshifts)  # descending

    if lightconer is None:
        lightconer = RectilinearLightconer.with_equal_cdist_slices(
            min_redshift=float(node_z.min()),
            max_redshift=float(node_z.max()),
            inputs=inputs,
            quantities=("brightness_temp",)
            + (("tau_21",) if inputs.astro_options.USE_TS_FLUCT else ()),
        )
    cosmo = inputs.cosmology

    quantities = set(lightconer.quantities)
    if apply_rsds or include_dvdr_in_tau21:
        quantities.add("velocity_z")
    quantities = tuple(quantities)

    n_slices = lightconer.n_slices
    shape2d = inputs.simulation_options.lowres_shape[:2]
    lightcones = {
        q: np.zeros(shape2d + (n_slices,), np.float32) for q in quantities
    }
    gq = {q: [] for q in global_quantities}
    prev_coeval = None

    lc = LightCone(
        inputs=inputs,
        lightconer=lightconer,
        lightcones=lightcones,
        global_quantities={},
        node_redshifts=node_z,
    )

    for coeval in generate_coeval(inputs, out_redshifts=node_z, initial_conditions=initial_conditions):
        for q in global_quantities:
            gq[q].append(float(np.mean(lightconer.get_field(coeval, q))))

        if prev_coeval is not None:
            for q in quantities:
                idx, vals = lightconer.make_lightcone_slices(
                    coeval, prev_coeval, cosmo, inputs, q
                )
                if idx is not None:
                    lightcones[q][:, :, idx] = vals
        prev_coeval = coeval
        yield coeval.redshift, coeval, lc

    lc.global_quantities = {q: np.array(v) for q, v in gq.items()}

    # ----- finalization: dvdr correction + RSDs (lightcone.py:249-372) -----
    lc_z = lightconer.lc_redshifts(cosmo)
    if include_dvdr_in_tau21 and "brightness_temp" in lightcones:
        tau = lightcones.get("tau_21") if inputs.astro_options.USE_TS_FLUCT else None
        lightcones["brightness_temp"] = rsds_module.include_dvdr_in_tau21(
            lightcones["brightness_temp"],
            lightcones["velocity_z"],
            lc_z,
            inputs,
            periodic=False,
            tau_21=tau,
        )
    if apply_rsds and "brightness_temp" in lightcones:
        lightcones["brightness_temp"] = rsds_module.apply_rsds(
            lightcones["brightness_temp"],
            lightcones["velocity_z"],
            lc_z,
            inputs,
            periodic=False,
        )
    yield None, None, lc


def run_lightcone(inputs: InputParameters, **kwargs) -> LightCone:
    """Run the full lightcone pipeline (reference run_lightcone:727-734)."""
    lc = None
    for _z, _coeval, lc in generate_lightcone(inputs, **kwargs):
        pass
    return lc
