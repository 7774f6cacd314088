"""Single-field compute functions — the user-facing per-field API.

Mirrors the reference drivers/single_field.py surface (compute_initial_conditions,
perturb_field, compute_ionization_field, brightness_temperature, ...), dispatching
to the jitted model kernels.  No C-state broadcasting is needed: all state is
explicit in `InputParameters` + the output pytrees.
"""

from __future__ import annotations

from ..models.brightness import brightness_temperature
from ..models.ics import compute_initial_conditions
from ..models.ionization import compute_ionization_field
from ..models.perturb import perturb_field

__all__ = [
    "compute_initial_conditions",
    "perturb_field",
    "compute_ionization_field",
    "brightness_temperature",
]
