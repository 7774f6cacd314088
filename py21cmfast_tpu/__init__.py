"""py21cmfast_tpu — a TPU-native (JAX/XLA/Pallas) re-implementation of 21cmFAST.

Public API mirrors the reference `py21cmfast/__init__.py` compatibility surface:
input structs, output boxes, single-field functions and the run_* drivers.
"""

__version__ = "0.1.0"

from ._cfg import config
from ._templates import create_params_from_template, list_templates
from .drivers.coeval import Coeval, generate_coeval, run_coeval
from .drivers.global_evolution import GlobalEvolution, run_global_evolution
from .drivers.lightcone import LightCone, generate_lightcone, run_lightcone
from .drivers.single_field import (
    brightness_temperature,
    compute_initial_conditions,
    compute_ionization_field,
    perturb_field,
)
from .io.caching import CacheConfig, OutputCache, RunCache
from .lightconers import Lightconer, RectilinearLightconer
from .inputs import (
    AstroOptions,
    AstroParams,
    CosmoParams,
    InputParameters,
    MatterOptions,
    SimulationOptions,
    register_class_transfer,
)
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
    "__version__",
    # inputs
    "InputParameters",
    "CosmoParams",
    "MatterOptions",
    "SimulationOptions",
    "AstroOptions",
    "AstroParams",
    # outputs
    "InitialConditions",
    "PerturbedField",
    "IonizedBox",
    "TsBox",
    "BrightnessTemp",
    "HaloBox",
    "HaloCatalog",
    "PerturbedHaloCatalog",
    "XraySourceBox",
    # single fields
    "compute_initial_conditions",
    "perturb_field",
    "compute_ionization_field",
    "brightness_temperature",
    # drivers
    "run_coeval",
    "generate_coeval",
    "Coeval",
    "run_lightcone",
    "generate_lightcone",
    "LightCone",
    "run_global_evolution",
    "GlobalEvolution",
    # lightconers / io / config
    "Lightconer",
    "RectilinearLightconer",
    "OutputCache",
    "RunCache",
    "CacheConfig",
    "config",
    "create_params_from_template",
    "list_templates",
]
