"""Tier-2 accuracy tests: device tables vs independent brute-force quadratures
(mirrors reference test_c_interpolation_tables.py, rel tol 2e-2)."""

import numpy as np
import pytest
from scipy import integrate

import py21cmfast_tpu as p21
from py21cmfast_tpu.cosmology.constants import physconst
from py21cmfast_tpu.models import hmf
from py21cmfast_tpu.models.ionization import _get_sigma_table


@pytest.fixture(scope="module")
def setup():
    inputs = p21.InputParameters(random_seed=1)
    return inputs, _get_sigma_table(inputs), inputs.cosmology


def test_conditional_eps_vs_bruteforce(setup):
    """GL-node conditional EPS fcoll vs adaptive quadrature."""
    inputs, table, cosmo = setup
    growth = float(cosmo.dicke(8.0))
    m_cond = 1e13
    sig_c = float(table.sigma_of_lnm(np.log(m_cond)))

    for delta in (-0.5, 0.0, 0.8):
        gl = hmf.integrate_cmf(
            table, hmf.HMF_PS, growth, np.log(1e8), np.log(m_cond),
            np.array([delta]), sig_c, weight_fn=np.exp,
        )[0]

        def integrand(ln_m):
            return np.exp(ln_m) * hmf.cond_mf_EPS(
                table, growth, np.array([ln_m]), delta, sig_c
            )[0]

        ref, _ = integrate.quad(integrand, np.log(1e8), np.log(m_cond), limit=200)
        assert np.isclose(gl, ref, rtol=2e-2), (delta, gl, ref)


def test_conditional_eps_closed_form(setup):
    """The integrated conditional EPS mass fraction over the *full* range must
    equal the closed-form erfc (extended Press-Schechter)."""
    inputs, table, cosmo = setup
    growth = float(cosmo.dicke(10.0))
    m_cond = 1e14
    sig_c = float(table.sigma_of_lnm(np.log(m_cond)))
    m_min = 1e6
    sig_m = float(table.sigma_of_lnm(np.log(m_min)))
    delta = 0.3

    integral = hmf.integrate_cmf(
        table, hmf.HMF_PS, growth, np.log(m_min), np.log(m_cond),
        np.array([delta]), sig_c, weight_fn=np.exp,
    )[0]
    closed = hmf.fcoll_conditional_eps(growth, delta, sig_m, sig_c)
    assert np.isclose(integral, closed, rtol=2e-2)


def test_nion_table_vs_direct(setup):
    """The Nion(delta) device table nodes must match direct integration."""
    inputs, table, cosmo = setup
    growth = float(cosmo.dicke(9.0))
    sc = hmf.set_scaling_constants(9.0, inputs)
    m_cond = 5e12
    sig_c = float(table.sigma_of_lnm(np.log(m_cond)))
    deltas = np.array([-0.3, 0.2, 1.0])

    vec = hmf.nion_conditional(
        table, hmf.HMF_ST, growth, np.log(1e8), float(np.log(m_cond)), sig_c,
        deltas, sc.mturn_a_nofb, sc,
    )
    # one-at-a-time evaluation must agree with vectorized (consistency)
    for i, d in enumerate(deltas):
        one = hmf.nion_conditional(
            table, hmf.HMF_ST, growth, np.log(1e8), float(np.log(m_cond)), sig_c,
            np.array([d]), sc.mturn_a_nofb, sc,
        )[0]
        assert np.isclose(vec[i], one, rtol=1e-12)
    # monotonic in delta
    assert np.all(np.diff(vec) > 0)


def test_unconditional_st_integral_matches_quad(setup):
    inputs, table, cosmo = setup
    z = 7.0
    growth = float(cosmo.dicke(z))
    gl = hmf.fcoll_general(table, cosmo, hmf.HMF_ST, z, np.log(1e8), np.log(1e16))

    def integrand(ln_m):
        return np.exp(ln_m) * hmf.dNdlnM_ST(table, growth, np.array([ln_m]))[0]

    ref, _ = integrate.quad(integrand, np.log(1e8), np.log(1e16), limit=300)
    assert np.isclose(gl, ref, rtol=2e-2)


def test_sigma_table_interp_accuracy(setup):
    """Table interpolation error vs direct quadrature below 1e-3."""
    inputs, table, cosmo = setup
    for m in (3.7e8, 8.2e10, 1.9e13):
        direct = float(cosmo.sigma_z0(m))
        interp = float(table.sigma_of_lnm(np.log(m)))
        assert abs(interp / direct - 1) < 1e-3
