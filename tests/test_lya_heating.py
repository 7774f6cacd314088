"""Lya heating: Fokker-Planck energy-transfer solver + Ts integration."""

import numpy as np
import pytest

import py21cmfast_tpu as p21
from py21cmfast_tpu.models import lya_heating as lh


def test_continuum_always_heats_and_decreases_with_tk():
    tks = np.array([0.5, 2.0, 10.0, 100.0, 1000.0])
    dc, _ = lh.solve_delta_e(tks, tks, 1e5)
    assert np.all(dc > 0)
    assert np.all(np.diff(dc) < 0)


def test_continuum_increases_with_taugp():
    taus = np.array([1e2, 1e3, 1e4, 1e5, 1e6])
    dc, _ = lh.solve_delta_e(10.0, 10.0, taus)
    assert np.all(np.diff(dc) > 0)


def test_injected_cools_at_high_tk_heats_at_low():
    _, di_low = lh.solve_delta_e(0.5, 0.5, 1e5)
    _, di_high = lh.solve_delta_e(100.0, 100.0, 1e5)
    assert di_low > 0  # recoil-dominated
    assert di_high < 0  # Doppler-diffusion cooling of the injection feature


def test_gp_coefficient_matches_reference_constant():
    # reference taugp hard-codes 1.342881e-7 (heating_helper_progs.c:650)
    assert np.isclose(lh.gunn_peterson_coef(), 1.342881e-7, rtol=5e-3)


def test_tables_finite_and_cached():
    t1 = lh.get_lya_heat_tables()
    t2 = lh.get_lya_heat_tables()
    assert t1 is t2
    assert np.all(np.isfinite(t1.de_cont))
    assert np.all(np.isfinite(t1.de_inj))
    assert t1.de_cont.shape == (lh.N_T, lh.N_TS, lh.N_GP)
    assert np.all(t1.de_cont > 0)


def test_global_evolution_lya_heats():
    base = p21.InputParameters(random_seed=12).evolve_input_structs(
        SOURCE_MODEL="E-INTEGRAL", ZPRIME_STEP_FACTOR=1.35, Z_HEAT_MAX=22.0,
        USE_TS_FLUCT=True,
    ).with_logspaced_redshifts(10.0, 22.0)
    tk = {}
    for lya in (False, True):
        ge = p21.run_global_evolution(base.evolve_input_structs(USE_LYA_HEATING=lya))
        i = np.argmin(np.abs(np.array(ge.redshifts) - 12.0))
        tk[lya] = float(ge.kinetic_temperature[i])
    assert tk[True] > tk[False]
    assert tk[True] < tk[False] * 1.5  # small correction, not a blow-up
