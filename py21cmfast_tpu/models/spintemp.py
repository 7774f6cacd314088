"""Spin-temperature evolution (X-ray heating + Ly-a coupling).

TPU-native equivalent of reference SpinTemperatureBox.c (ts_main:1387-1720).
Implemented incrementally; see compute_spin_temperature below.
"""

from __future__ import annotations


def compute_spin_temperature(
    redshift,
    inputs,
    perturbed_field,
    prev_state=None,
    prev_redshift=None,
    initial_conditions=None,
):
    raise NotImplementedError(
        "USE_TS_FLUCT: spin-temperature box lands in the next milestone"
    )
