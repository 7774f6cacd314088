"""XraySourceBox + angular lightconer locks."""

import jax.numpy as jnp
import numpy as np
import pytest

import py21cmfast_tpu as p21
from py21cmfast_tpu.lightconers import AngularLightconer
from py21cmfast_tpu.models.xray_source import compute_xray_source_field
from py21cmfast_tpu.outputs import HaloBox


@pytest.fixture(scope="module")
def inputs():
    return p21.InputParameters(random_seed=31).evolve_input_structs(
        HII_DIM=12, DIM=24, BOX_LEN=18.0, N_STEP_TS=12, R_MAX_TS=100.0
    )


def _fake_halobox(z, shape, level):
    g = jnp.full(shape, level, jnp.float32)
    return HaloBox(
        redshift=jnp.float32(z), n_ion=g, halo_sfr=g, whalo_sfr=g, halo_xray=g,
    )


def test_xray_source_shapes_and_interp(inputs):
    shape = inputs.simulation_options.lowres_shape
    nodes = [(10.0, _fake_halobox(10.0, shape, 1.0)), (14.0, _fake_halobox(14.0, shape, 3.0))]
    sb = compute_xray_source_field(10.0, inputs, nodes)
    assert sb.filtered_sfr.shape == (12, *shape)
    arr = np.asarray(sb.filtered_sfr)
    assert np.all(arr >= 0)
    # uniform fields filter to themselves: shell values lie between node levels
    assert arr.min() >= 1.0 - 1e-3
    assert arr.max() <= 3.0 + 1e-3
    # farther shells (higher z'') must have larger interpolated values
    means = arr.mean(axis=(1, 2, 3))
    assert means[-1] >= means[0]


def test_xray_source_annulus_conserves_uniform(inputs):
    """Annulus filters have W(k=0)=1: a uniform field stays uniform.

    The node list must extend above the shell z'' range: shells beyond the
    oldest node (or Z_HEAT_MAX) are zeroed, matching the reference
    (single_field.py:585-597)."""
    shape = inputs.simulation_options.lowres_shape
    nodes = [(10.0, _fake_halobox(10.0, shape, 2.0)),
             (34.0, _fake_halobox(34.0, shape, 2.0))]
    sb = compute_xray_source_field(10.0, inputs, nodes)
    arr = np.asarray(sb.filtered_sfr)
    np.testing.assert_allclose(arr, 2.0, rtol=1e-4)


def test_xray_source_shells_beyond_nodes_are_zeroed(inputs):
    """Shells whose z'' lies above the oldest HaloBox carry no sources
    (reference single_field.py:585-597): with a single node at the current
    redshift every shell is beyond it, so the whole stack must be zero."""
    shape = inputs.simulation_options.lowres_shape
    nodes = [(10.0, _fake_halobox(10.0, shape, 2.0))]
    sb = compute_xray_source_field(10.0, inputs, nodes)
    assert float(np.abs(np.asarray(sb.filtered_sfr)).max()) == 0.0


def test_angular_lightconer_against_rectilinear(inputs):
    """For parallel z-axis sightlines from the box origin, the angular sampler
    must reproduce the box values along the axis."""
    inputs_n = inputs.evolve_input_structs(SOURCE_MODEL="E-INTEGRAL").with_logspaced_redshifts(
        9.0, 12.0
    )
    cvs = list(p21.generate_coeval(inputs_n, out_redshifts=inputs_n.node_redshifts))
    cosmo = inputs_n.cosmology
    d0 = cosmo.comoving_distance(cvs[-1].redshift)
    d1 = cosmo.comoving_distance(cvs[0].redshift)
    dists = np.linspace(d0 + 1, d1 - 1, 5)
    # one sightline straight down the z axis through cell centre (0.75, 0.75)
    ang = AngularLightconer(dists, [[0.0, 0.0, 1.0]], origin=(0.75, 0.75, 0.0))
    idx, vals = ang.make_lightcone_slices(cvs[-1], cvs[0], cosmo, inputs_n, "brightness_temp")
    assert idx is not None
    assert vals.shape == (1, len(idx))
    assert np.all(np.isfinite(vals))
