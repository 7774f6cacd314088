"""Output field containers.

TPU-native re-design of the reference output-struct layer
(`src/py21cmfast/wrapper/outputs.py`): instead of C-backed buffers with an
allocation state machine, each output is an immutable JAX pytree dataclass whose
leaves are device arrays.  Purging/caching is handled by the io layer, which
simply moves leaves to/from HDF5; there is no separate "C memory" state.

Field names follow the reference v4 naming (outputs.py:508-1707) so the HDF5
files and the user API are recognizable.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import numpy as np


def _register(cls):
    """Register a dataclass as a JAX pytree; fields named in _static are aux data."""
    static = tuple(getattr(cls, "_static", ()))
    data = tuple(f.name for f in dataclasses.fields(cls) if f.name not in static)
    jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=static)
    return cls


@_register
@dataclass(frozen=True)
class InitialConditions:
    """Gaussian ICs + (2)LPT displacement fields.

    `vx/vy/vz` are the first-order (Zel'dovich) displacement fields psi in
    comoving Mpc per unit growth factor, sampled on the perturb grid (lowres
    unless PERTURB_ON_HIGH_RES).  `*_2LPT` are the second-order fields
    (Scoccimarro 1998 App. D), to be scaled by -3/7 D(z)^2.
    Reference: InitialConditions.c:547-772.
    """

    hires_density: jax.Array  # (DIM, DIM, D_PARA), delta at z=0 normalization
    lowres_density: jax.Array  # (HII_DIM,)*3
    vx: jax.Array
    vy: jax.Array
    vz: jax.Array
    vx_2LPT: jax.Array | None = None
    vy_2LPT: jax.Array | None = None
    vz_2LPT: jax.Array | None = None
    lowres_vcb: jax.Array | None = None


@_register
@dataclass(frozen=True)
class PerturbedField:
    """Eulerian density and LOS velocity at one redshift (PerturbedField.c:389)."""

    redshift: jax.Array
    density: jax.Array
    velocity_z: jax.Array
    velocity_x: jax.Array | None = None
    velocity_y: jax.Array | None = None


@_register
@dataclass(frozen=True)
class IonizedBox:
    """Excursion-set ionization output (IonisationBox.c:1344)."""

    redshift: jax.Array
    neutral_fraction: jax.Array
    z_reion: jax.Array
    ionisation_rate_G12: jax.Array
    mean_f_coll: jax.Array
    mean_f_coll_MINI: jax.Array
    log10_Mturnover_ave: jax.Array
    log10_Mturnover_MINI_ave: jax.Array
    kinetic_temperature: jax.Array | None = None
    mean_free_path: jax.Array | None = None
    cumulative_recombinations: jax.Array | None = None
    unnormalised_nion: jax.Array | None = None
    unnormalised_nion_mini: jax.Array | None = None

    @property
    def global_xH(self):
        return float(np.mean(np.asarray(self.neutral_fraction)))


@_register
@dataclass(frozen=True)
class TsBox:
    """Spin temperature output (SpinTemperatureBox.c:87)."""

    redshift: jax.Array
    spin_temperature: jax.Array
    xray_ionised_fraction: jax.Array
    kinetic_temp_neutral: jax.Array
    J_21_LW: jax.Array | None = None
    J_Lya: jax.Array | None = None


@_register
@dataclass(frozen=True)
class BrightnessTemp:
    """21-cm brightness temperature (BrightnessTemperatureBox.c:22)."""

    redshift: jax.Array
    brightness_temp: jax.Array
    tau_21: jax.Array | None = None

    @property
    def global_Tb(self):
        return float(np.mean(np.asarray(self.brightness_temp)))


@_register
@dataclass(frozen=True)
class HaloBox:
    """Gridded halo/source properties (HaloBox.c:563)."""

    redshift: jax.Array
    n_ion: jax.Array
    halo_sfr: jax.Array
    whalo_sfr: jax.Array | None = None
    halo_xray: jax.Array | None = None
    halo_stars: jax.Array | None = None
    halo_sfr_mini: jax.Array | None = None
    halo_stars_mini: jax.Array | None = None
    count: jax.Array | None = None
    log10_Mcrit_ACG_ave: jax.Array | None = None
    log10_Mcrit_MCG_ave: jax.Array | None = None


@_register
@dataclass(frozen=True)
class XraySourceBox:
    """Pre-filtered SFR/X-ray shells for Ts (SpinTemperatureBox.c:748)."""

    redshift: jax.Array
    filtered_sfr: jax.Array  # (N_R, HII_DIM, HII_DIM, HII_D_PARA)
    filtered_sfr_mini: jax.Array | None = None
    filtered_xray: jax.Array | None = None
    mean_log10_Mcrit_LW: jax.Array | None = None
    # LYA_MULTIPLE_SCATTERING + minihalos: the LW photons travel in straight
    # lines, so the SFR grids are filtered a second time with the plain
    # annulus (SpinTemperatureBox.c:775-783)
    filtered_sfr_lw: jax.Array | None = None
    filtered_sfr_mini_lw: jax.Array | None = None


@_register
@dataclass(frozen=True)
class HaloCatalog:
    """Discrete halo catalog with fixed-capacity padded buffers (HaloCatalog.c:38).

    `n_halos` gives the number of valid entries; entries beyond that are padding
    (mass == 0).  This replaces the reference's dynamically-sized buffers with a
    TPU-friendly static layout.
    """

    redshift: jax.Array
    halo_masses: jax.Array  # (capacity,)
    halo_coords: jax.Array  # (capacity, 3) in Mpc
    star_rng: jax.Array
    sfr_rng: jax.Array
    xray_rng: jax.Array
    n_halos: jax.Array  # scalar int32


@_register
@dataclass(frozen=True)
class PerturbedHaloCatalog:
    """Halos moved to Eulerian positions (PerturbedHaloCatalog.c:25)."""

    redshift: jax.Array
    halo_masses: jax.Array
    halo_coords: jax.Array
    star_rng: jax.Array
    sfr_rng: jax.Array
    xray_rng: jax.Array
    n_halos: jax.Array
