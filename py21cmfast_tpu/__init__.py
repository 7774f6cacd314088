"""py21cmfast_tpu — a TPU-native (JAX/XLA/Pallas) re-implementation of 21cmFAST.

Public API mirrors the reference `py21cmfast/__init__.py` compatibility surface:
input structs, output boxes, single-field functions and the run_* drivers.
"""

__version__ = "0.1.0"

from .drivers.coeval import Coeval, generate_coeval, run_coeval
from .drivers.single_field import (
    brightness_temperature,
    compute_initial_conditions,
    compute_ionization_field,
    perturb_field,
)
from .inputs import (
    AstroOptions,
    AstroParams,
    CosmoParams,
    InputParameters,
    MatterOptions,
    SimulationOptions,
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
]
