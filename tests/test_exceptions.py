"""NaN/Inf guard wiring (reference: in-kernel isfinite sweeps throw
InfinityorNaNError, SpinTemperatureBox.c:1915-1935; here validate_box runs per
snapshot from the drivers, exceptions.py)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from py21cmfast_tpu._cfg import config
from py21cmfast_tpu.exceptions import InfinityOrNaNError, validate_box, validate_snapshot
from py21cmfast_tpu.outputs import PerturbedField


def _pf_with(value):
    density = jnp.full((4, 4, 4), value, jnp.float32)
    vel = jnp.zeros((4, 4, 4), jnp.float32)
    return PerturbedField(
        redshift=9.0, density=density, velocity_x=vel, velocity_y=vel, velocity_z=vel
    )


def test_validate_box_passes_finite():
    validate_box(_pf_with(0.5))


def test_validate_box_raises_on_nan():
    with pytest.raises(InfinityOrNaNError, match="density"):
        validate_box(_pf_with(np.nan))


def test_validate_box_raises_on_inf():
    with pytest.raises(InfinityOrNaNError):
        validate_box(_pf_with(np.inf))


def test_validate_snapshot_respects_config_flag():
    bad = _pf_with(np.nan)
    with pytest.raises(InfinityOrNaNError):
        validate_snapshot(9.0, bad, None)
    config["validate_outputs"] = False
    try:
        validate_snapshot(9.0, bad, None)  # must not raise when disabled
    finally:
        config["validate_outputs"] = True


def test_driver_guards_nan_density():
    """End-to-end: a NaN injected into the ICs surfaces as InfinityOrNaNError
    from the coeval driver, naming the offending box."""
    import py21cmfast_tpu as p21
    from py21cmfast_tpu.drivers.coeval import run_coeval
    from py21cmfast_tpu.models.ics import compute_initial_conditions

    inputs = p21.InputParameters(random_seed=3).evolve_input_structs(
        HII_DIM=12, DIM=24, BOX_LEN=24.0, SOURCE_MODEL="CONST-ION-EFF"
    )
    ics = compute_initial_conditions(inputs)
    bad_density = np.asarray(ics.hires_density).copy()
    bad_density[0, 0, 0] = np.nan
    ics = dataclasses.replace(ics, hires_density=jnp.asarray(bad_density))
    with pytest.raises(InfinityOrNaNError):
        run_coeval(inputs, [8.0], initial_conditions=ics)
