"""HDF5 round-trips + cache path scheme (mirrors reference tests/io/)."""

import numpy as np
import pytest

import py21cmfast_tpu as p21
from py21cmfast_tpu.input_serialization import (
    deserialize_inputs,
    read_inputs_from_toml,
    serialize_inputs,
    write_inputs_to_toml,
)
from py21cmfast_tpu.io.caching import CacheConfig, OutputCache, RunCache
from py21cmfast_tpu.io.h5 import read_output_from_hdf5, write_output_to_hdf5


@pytest.fixture(scope="module")
def inputs():
    return p21.InputParameters(random_seed=5).evolve_input_structs(
        HII_DIM=8, DIM=16, BOX_LEN=16.0
    )


@pytest.fixture(scope="module")
def ics(inputs):
    return p21.compute_initial_conditions(inputs)


def test_h5_roundtrip(tmp_path, inputs, ics):
    path = write_output_to_hdf5(ics, tmp_path / "ic.h5", inputs=inputs)
    loaded, loaded_inputs = read_output_from_hdf5(path)
    np.testing.assert_array_equal(np.asarray(ics.lowres_density), loaded.lowres_density)
    np.testing.assert_array_equal(np.asarray(ics.vx_2LPT), loaded.vx_2LPT)
    assert loaded_inputs.random_seed == inputs.random_seed
    assert loaded_inputs.simulation_options.HII_DIM == 8


def test_serialization_roundtrip(inputs):
    d = serialize_inputs(inputs)
    back = deserialize_inputs(d)
    assert back.simulation_options.HII_DIM == inputs.simulation_options.HII_DIM
    assert back.cosmo_params.OMm == inputs.cosmo_params.OMm
    assert back.matter_options.HMF == inputs.matter_options.HMF


def test_toml_roundtrip(tmp_path, inputs):
    path = tmp_path / "inputs.toml"
    write_inputs_to_toml(inputs, path)
    back = read_inputs_from_toml(path)
    assert back.astro_params.F_STAR10 == inputs.astro_params.F_STAR10
    assert back.matter_options.SOURCE_MODEL == inputs.matter_options.SOURCE_MODEL


def test_cache_write_read(tmp_path, inputs, ics):
    cache = OutputCache(tmp_path)
    cache.write(ics, inputs)
    assert cache.exists(p21.InitialConditions, inputs)
    loaded = cache.read(p21.InitialConditions, inputs)
    np.testing.assert_array_equal(np.asarray(ics.lowres_density), loaded.lowres_density)


def test_cache_z_dependent(tmp_path, inputs, ics):
    cache = OutputCache(tmp_path)
    pf = p21.perturb_field(9.0, inputs, ics)
    cache.write(pf, inputs)
    assert cache.exists(p21.PerturbedField, inputs, 9.0)
    assert not cache.exists(p21.PerturbedField, inputs, 8.0)
    # different astro params change the hash for astro-dependent boxes only
    inputs2 = inputs.evolve_input_structs(F_STAR10=-2.0)
    ion = p21.compute_ionization_field(9.0, inputs, pf)
    cache.write(ion, inputs)
    assert cache.exists(p21.IonizedBox, inputs, 9.0)
    assert not cache.exists(p21.IonizedBox, inputs2, 9.0)
    # but the perturbed field is matter-only: same path for both ... wait, pf
    # carries the astro hash in its path only if z-dependent; current scheme
    # includes astro hash for all z-dependent boxes (conservative).


def test_run_cache_completeness(tmp_path, inputs, ics):
    inputs_n = inputs.evolve_input_structs(node_redshifts=(10.0, 9.0))
    cache = OutputCache(tmp_path)
    rc = RunCache(cache, inputs_n)
    assert rc.last_complete_node() == -1
    for z in (10.0, 9.0):
        pf = p21.perturb_field(z, inputs_n, ics)
        ion = p21.compute_ionization_field(z, inputs_n, pf)
        tb = p21.brightness_temperature(inputs_n, ion, pf)
        cache.write(pf, inputs_n)
        cache.write(ion, inputs_n)
        cache.write(tb, inputs_n)
    assert rc.last_complete_node() == 1
    assert rc.is_complete_at(9.0)


def test_cache_config():
    c = CacheConfig()
    assert c.writes("IonizedBox")
    off = CacheConfig.off()
    assert not off.writes("IonizedBox")
