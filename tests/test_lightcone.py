"""Lightcone + RSD tests (small boxes): geometry, slice coverage, RSD conservation."""

import numpy as np
import pytest

import py21cmfast_tpu as p21
from py21cmfast_tpu import rsds
from py21cmfast_tpu.drivers.lightcone import run_lightcone
from py21cmfast_tpu.lightconers import RectilinearLightconer


@pytest.fixture(scope="module")
def inputs():
    return p21.InputParameters(random_seed=77).evolve_input_structs(
        HII_DIM=16, DIM=32, BOX_LEN=32.0, SOURCE_MODEL="E-INTEGRAL",
        ZPRIME_STEP_FACTOR=1.3, Z_HEAT_MAX=16.0,
    ).with_logspaced_redshifts(8.0, 16.0)


@pytest.fixture(scope="module")
def lightcone(inputs):
    return run_lightcone(inputs)


def test_lightcone_filled(lightcone):
    bt = lightcone.brightness_temp
    assert bt is not None
    assert bt.shape[:2] == (16, 16)
    assert bt.shape[2] > 20
    # all slices assigned (no column of exact zeros except plausibly z edges)
    filled = np.any(bt != 0, axis=(0, 1))
    assert filled.mean() > 0.9


def test_lc_distances_monotonic(lightcone):
    d = lightcone.lc_distances
    assert np.all(np.diff(d) > 0)
    z = lightcone.lc_redshifts
    assert np.all(np.diff(z) > 0)
    assert abs(z[0] - 8.0) < 0.1


def test_global_quantities(lightcone, inputs):
    xh = lightcone.global_quantities["neutral_fraction"]
    assert len(xh) == len(inputs.node_redshifts)
    # xH decreases with decreasing z (node order is descending in z)
    assert xh[-1] <= xh[0]


def test_rsds_shift_conserves_mass():
    rng = np.random.default_rng(0)
    field = rng.uniform(1, 2, size=(32, 10)).astype(np.float32)
    disp = rng.normal(0, 0.5, size=(32, 10)).astype(np.float32)
    out = np.asarray(rsds.rsds_shift(field, disp, periodic=True))
    np.testing.assert_allclose(out.sum(axis=0), field.sum(axis=0), rtol=1e-5)


def test_rsds_zero_displacement_identity():
    rng = np.random.default_rng(1)
    field = rng.uniform(1, 2, size=(16, 4)).astype(np.float32)
    out = np.asarray(rsds.rsds_shift(field, np.zeros_like(field), periodic=True))
    np.testing.assert_allclose(out, field, rtol=1e-5, atol=1e-6)


def test_rsds_uniform_shift_periodic():
    """A uniform +1 pixel displacement rolls the field by one slice."""
    field = np.zeros((16, 1), np.float32)
    field[5, 0] = 1.0
    out = np.asarray(rsds.rsds_shift(field, np.ones_like(field), periodic=True))
    assert np.argmax(out[:, 0]) == 6
    np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-5)


def test_dvdr_correction_no_ts(inputs):
    bt = np.ones((4, 4, 16), np.float32) * 10.0
    vel = np.zeros_like(bt)
    out = rsds.include_dvdr_in_tau21(bt, vel, 9.0, inputs, periodic=True)
    np.testing.assert_allclose(out, bt, rtol=1e-6)
