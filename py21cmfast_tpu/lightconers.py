"""Lightconers: interpolate coeval snapshots onto lightcone slices.

Equivalent of reference lightconers.py:35-700.  A `Lightconer` owns the grid of
comoving distances of the lightcone slices; for each pair of adjacent coevals it
emits the slices whose distances fall between them, linearly interpolated in
comoving distance.  The rectilinear variant maps distance -> periodic LoS pixel.
"""

from __future__ import annotations

import numpy as np

from .inputs import InputParameters

__all__ = ["Lightconer", "RectilinearLightconer"]


class Lightconer:
    """Base: holds lc distances + redshifts, provides coeval interpolation."""

    def __init__(self, lc_distances, quantities=("brightness_temp",)):
        self.lc_distances = np.asarray(lc_distances, dtype=np.float64)
        self.quantities = tuple(quantities)
        self._lc_redshifts = None

    @classmethod
    def with_equal_cdist_slices(
        cls,
        min_redshift: float,
        max_redshift: float,
        inputs: InputParameters,
        quantities=("brightness_temp",),
        resolution=None,
    ):
        cosmo = inputs.cosmology
        res = resolution if resolution is not None else (
            inputs.simulation_options.box_len / inputs.simulation_options.HII_DIM
        )
        d_min = cosmo.comoving_distance(min_redshift)
        d_max = cosmo.comoving_distance(max_redshift)
        n = int(np.floor((d_max - d_min) / res)) + 1
        dists = d_min + np.arange(n) * res
        obj = cls(dists, quantities)
        obj._inputs = inputs
        return obj

    def lc_redshifts(self, cosmo):
        if self._lc_redshifts is None:
            z_grid = np.linspace(0.0, 60.0, 4096)
            d_grid = cosmo.comoving_distance(z_grid)
            self._lc_redshifts = np.interp(self.lc_distances, d_grid, z_grid)
        return self._lc_redshifts

    @property
    def n_slices(self):
        return len(self.lc_distances)

    def make_lightcone_slices(self, coeval_low, coeval_high, cosmo, quantity):
        """Return (slice_indices, values) for lc slices between the two coevals.

        coeval_low is at the lower redshift (smaller distance)."""
        raise NotImplementedError


class RectilinearLightconer(Lightconer):
    """Slices taken along the box z-axis, periodic tiling in distance
    (reference RectilinearLightconer:483-540)."""

    def get_field(self, coeval, quantity):
        if quantity == "brightness_temp":
            return np.asarray(coeval.brightness_temperature.brightness_temp)
        if quantity == "tau_21":
            return np.asarray(coeval.brightness_temperature.tau_21)
        if quantity in ("density", "velocity_z", "velocity_x", "velocity_y"):
            return np.asarray(getattr(coeval.perturbed_field, quantity))
        if quantity in ("neutral_fraction", "z_reion", "ionisation_rate_G12"):
            return np.asarray(getattr(coeval.ionized_box, quantity))
        if quantity in ("spin_temperature", "kinetic_temp_neutral", "xray_ionised_fraction"):
            if coeval.spin_temp is None:
                raise ValueError(f"{quantity} requires USE_TS_FLUCT")
            return np.asarray(getattr(coeval.spin_temp, quantity))
        raise ValueError(f"unknown lightcone quantity {quantity}")

    def make_lightcone_slices(self, coeval_low, coeval_high, cosmo, inputs, quantity):
        d_low = cosmo.comoving_distance(coeval_low.redshift)
        d_high = cosmo.comoving_distance(coeval_high.redshift)
        sel = (self.lc_distances >= d_low) & (self.lc_distances < d_high)
        if not np.any(sel):
            return None, None
        idx = np.where(sel)[0]
        dists = self.lc_distances[idx]

        cell = inputs.simulation_options.box_len / inputs.simulation_options.HII_DIM
        n_los = inputs.simulation_options.lowres_shape[2]
        pix = np.round(dists / cell).astype(int) % n_los

        box_lo = self.get_field(coeval_low, quantity)
        box_hi = self.get_field(coeval_high, quantity)
        w = (dists - d_low) / max(d_high - d_low, 1e-30)
        vals = box_lo[:, :, pix] * (1 - w)[None, None, :] + box_hi[:, :, pix] * w[None, None, :]
        return idx, vals.astype(np.float32)
