"""End-to-end coeval tests (small boxes, CPU), mirroring the golden-test role
of reference test_integration_features.py at reduced scope."""

import numpy as np
import pytest

import py21cmfast_tpu as p21


@pytest.fixture(scope="module")
def inputs():
    return p21.InputParameters(random_seed=99).evolve_input_structs(
        HII_DIM=24, DIM=72, BOX_LEN=48.0, SOURCE_MODEL="E-INTEGRAL"
    )


@pytest.fixture(scope="module")
def coeval(inputs):
    return p21.run_coeval(inputs, 8.0)


def test_neutral_fraction_physical(coeval):
    xh = np.asarray(coeval.neutral_fraction)
    assert np.all(xh >= 0) and np.all(xh <= 1)
    # z=8 with default astro params: mid-reionization
    assert 0.05 < xh.mean() < 0.98


def test_brightness_temp_saturated_formula(coeval):
    """Without Ts, Tb = const * xH * (1+delta): verify the relation cell-wise."""
    xh = np.asarray(coeval.neutral_fraction)
    d = np.asarray(coeval.density)
    tb = np.asarray(coeval.brightness_temp)
    z = coeval.redshift
    cp = p21.CosmoParams()
    const = 27 * (cp.OMb * cp.hlittle**2 / 0.023) * np.sqrt(
        (0.15 / cp.OMm / cp.hlittle**2) * (1 + z) / 10
    )
    np.testing.assert_allclose(tb, const * xh * (1 + d), rtol=2e-5, atol=1e-5)


def test_ionization_monotonic_with_redshift(inputs):
    """xH should decrease towards lower z."""
    ics = p21.compute_initial_conditions(inputs)
    means = []
    for z in (12.0, 8.0):
        pf = p21.perturb_field(z, inputs, ics)
        ion = p21.compute_ionization_field(z, inputs, pf)
        means.append(float(np.asarray(ion.neutral_fraction).mean()))
    assert means[1] < means[0]


def test_ionization_fully_neutral_at_high_z(inputs):
    """At very high z the early-exit path should return ~fully neutral."""
    ics = p21.compute_initial_conditions(inputs)
    pf = p21.perturb_field(30.0, inputs, ics)
    ion = p21.compute_ionization_field(30.0, inputs, pf)
    xh = np.asarray(ion.neutral_fraction)
    assert xh.mean() > 0.995


def test_const_ion_eff_model(inputs):
    """The CONST-ION-EFF (erfc fcoll) path runs and ionizes more with higher zeta."""
    inp = inputs.evolve_input_structs(SOURCE_MODEL="CONST-ION-EFF", M_MIN_in_Mass=False)
    ics = p21.compute_initial_conditions(inp)
    pf = p21.perturb_field(8.0, inp, ics)
    ion_lo = p21.compute_ionization_field(8.0, inp, pf)
    inp_hi = inp.evolve_input_structs(HII_EFF_FACTOR=60.0)
    ion_hi = p21.compute_ionization_field(8.0, inp_hi, pf)
    assert (
        np.asarray(ion_hi.neutral_fraction).mean()
        < np.asarray(ion_lo.neutral_fraction).mean()
    )


def test_ionized_cells_track_density(coeval):
    """Ionized regions should be biased to overdense large-scale environments."""
    xh = np.asarray(coeval.neutral_fraction)
    d = np.asarray(coeval.density)
    if 0.02 < xh.mean() < 0.98:
        # mean density of ionized cells > mean density of neutral cells is NOT
        # guaranteed cell-by-cell (bubbles extend into voids), but the
        # anticorrelation of xh and delta should be present
        assert np.corrcoef(xh.ravel(), d.ravel())[0, 1] < 0


def test_z_reion_consistency(coeval):
    xh = np.asarray(coeval.neutral_fraction)
    zre = np.asarray(coeval.ionized_box.z_reion)
    ionized = xh < 1e-20
    assert np.all(zre[ionized] > 0)
    assert np.all(zre[~ionized] < 0)


def test_ionise_entire_sphere(inputs):
    """IONISE_ENTIRE_SPHERE paints full R-spheres around flagged centers
    (reference bubble_helper_progs.c update_in_sphere): the ionized fraction
    must be >= the center-pixel method's at identical inputs."""
    base = inputs.evolve_input_structs(
        HII_DIM=16, DIM=32, BOX_LEN=24.0, SOURCE_MODEL="E-INTEGRAL"
    )
    ics = p21.compute_initial_conditions(base)
    pf = p21.perturb_field(7.0, base, ics)
    xh_c = p21.compute_ionization_field(7.0, base, pf).neutral_fraction
    sph = base.evolve_input_structs(IONISE_ENTIRE_SPHERE=True)
    xh_s = p21.compute_ionization_field(7.0, sph, pf).neutral_fraction
    f_c = 1.0 - float(np.mean(np.asarray(xh_c)))
    f_s = 1.0 - float(np.mean(np.asarray(xh_s)))
    assert f_s >= f_c - 1e-6
    assert f_s > 0
