"""py21cmfast_tpu — a TPU-native (JAX/XLA/Pallas) re-implementation of 21cmFAST.

Public API honors the reference `py21cmfast/__init__.py:14-120` compatibility
contract: every name in the reference `__all__` with a TPU-native equivalent is
exported here (the only exceptions are classy-backed helpers, which import but
raise with guidance unless the optional `classy` package is present).
"""

__version__ = "0.2.0"

from pathlib import Path as _Path

_DATA_PATH = _Path(__file__).parent / "_data"

from . import lightconers, plotting, wrapper
from ._cfg import config
from ._logging import configure_logging
from ._templates import create_params_from_template, list_templates, write_template
from .cfuncs import compute_luminosity_function, compute_tau
from .cosmology.classy_interface import compute_rms, run_classy
from .drivers.coeval import Coeval, generate_coeval, run_coeval
from .drivers.global_evolution import GlobalEvolution, run_global_evolution
from .drivers.lightcone import LightCone, generate_lightcone, run_lightcone
from .drivers.single_field import (
    brightness_temperature,
    compute_halo_grid,
    compute_initial_conditions,
    compute_ionization_field,
    compute_spin_temperature,
    compute_xray_source_field,
    determine_halo_catalog,
    interp_halo_boxes,
    perturb_field,
    perturb_halo_catalog,
)
from .io.caching import CacheConfig, OutputCache, RunCache
from .io.h5 import read_inputs, read_output_struct, write_output_to_hdf5
from .lightconers import AngularLightconer, Lightconer, RectilinearLightconer
from .inputs import (
    AstroOptions,
    AstroParams,
    CosmoParams,
    InputParameters,
    MatterOptions,
    SimulationOptions,
    get_logspaced_redshifts,
    register_class_transfer,
)
from .models.photoncons import setup_photon_cons
from .outputs import (
    BrightnessTemp,
    HaloBox,
    HaloCatalog,
    InitialConditions,
    IonizedBox,
    PerturbedField,
    PerturbedHaloCatalog,
    TsBox,
    XraySourceBox,
)

__all__ = [
    "_DATA_PATH",
    "AngularLightconer",
    "AstroOptions",
    "AstroParams",
    "BrightnessTemp",
    "CacheConfig",
    "Coeval",
    "CosmoParams",
    "GlobalEvolution",
    "HaloBox",
    "HaloCatalog",
    "InitialConditions",
    "InputParameters",
    "IonizedBox",
    "LightCone",
    "Lightconer",
    "MatterOptions",
    "OutputCache",
    "PerturbedField",
    "PerturbedHaloCatalog",
    "RectilinearLightconer",
    "RunCache",
    "SimulationOptions",
    "TsBox",
    "XraySourceBox",
    "__version__",
    "brightness_temperature",
    "compute_halo_grid",
    "compute_initial_conditions",
    "compute_ionization_field",
    "compute_luminosity_function",
    "compute_rms",
    "compute_spin_temperature",
    "compute_tau",
    "compute_xray_source_field",
    "config",
    "configure_logging",
    "create_params_from_template",
    "determine_halo_catalog",
    "generate_coeval",
    "generate_lightcone",
    "get_logspaced_redshifts",
    "interp_halo_boxes",
    "lightconers",
    "list_templates",
    "perturb_field",
    "perturb_halo_catalog",
    "plotting",
    "read_inputs",
    "read_output_struct",
    "register_class_transfer",
    "run_classy",
    "run_coeval",
    "run_global_evolution",
    "run_lightcone",
    "setup_photon_cons",
    "wrapper",
    "write_output_to_hdf5",
    "write_template",
]
