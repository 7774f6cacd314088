"""Cosmology parity tests: sigma(M), growth, power spectrum sanity.

These mirror the role of the reference's low-level C tests (SURVEY.md tier 2):
sigma_z0 / dicke / power_in_k are checked against independent quadratures
(scipy) and known analytic limits.
"""

import numpy as np
import pytest
from scipy import integrate

from py21cmfast_tpu.cosmology import Cosmology, physconst


@pytest.fixture(scope="module")
def cosmo():
    return Cosmology()


def test_sigma8_normalization(cosmo):
    """sigma(R=8/h Mpc) must equal SIGMA_8 exactly by construction."""
    m8 = cosmo.RtoM(8.0 / cosmo.hlittle)
    assert np.isclose(cosmo.sigma_z0(m8), 0.8102, rtol=1e-6)


def test_sigma_against_scipy_quad(cosmo):
    """Fixed-order GL sigma integral vs adaptive quadrature, multiple masses."""
    for M in [1e8, 1e10, 1e13, 1e15]:
        R = cosmo.MtoR(M)

        def integrand(k):
            u = k * R
            w = np.where(u < 1e-4, 1 - u * u / 10, 3.0 * (np.sin(u) - u * np.cos(u)) / u**3)
            return k * k * cosmo.power_in_k(k) * w * w / (2 * np.pi**2)

        ref, _ = integrate.quad(integrand, 1e-8 / R, 350.0 / R, limit=400, epsrel=1e-9)
        assert np.isclose(cosmo.sigma_z0(M), np.sqrt(ref), rtol=1e-5)


def test_dsigmasq_dm_against_finite_difference(cosmo):
    for M in [1e9, 1e12, 1e15]:
        dm = M * 1e-4
        fd = (cosmo.sigma_z0(M + dm) ** 2 - cosmo.sigma_z0(M - dm) ** 2) / (2 * dm)
        assert np.isclose(cosmo.dsigmasqdm_z0(M), fd, rtol=1e-3)


def test_growth_normalization_and_eds_limit(cosmo):
    # the Liddle-fit dicke includes OMr at z but not in the z=0 norm, so D(0)
    # deviates from 1 by ~OMr/4 (the reference shares this behavior)
    assert np.isclose(cosmo.dicke(0.0), 1.0, rtol=1e-4)
    # High-z: D(z) ~ (1+z)^-1 * const; ratio across z should follow EdS scaling
    d20 = cosmo.dicke(20.0)
    d40 = cosmo.dicke(40.0)
    assert np.isclose(d20 / d40, 41.0 / 21.0, rtol=5e-3)


def test_dtdz_consistency_with_hubble(cosmo):
    # |dt/dz| should equal 1/((1+z) H(z)) in matter+lambda cosmology
    for z in [0.5, 6.0, 20.0]:
        expected = 1.0 / ((1 + z) * cosmo.Ho * np.sqrt(cosmo.OMm * (1 + z) ** 3 + cosmo.OMl))
        assert np.isclose(abs(cosmo.dtdz(z)), expected, rtol=1e-6)


def test_power_spectrum_shape(cosmo):
    k = np.logspace(-4, 2, 50)
    p = cosmo.power_in_k(k)
    assert np.all(p > 0)
    # low-k limit: P ~ k^ns
    slope = np.log(p[1] / p[0]) / np.log(k[1] / k[0])
    assert np.isclose(slope, cosmo.POWER_INDEX, atol=0.01)
    # high-k: decreasing
    assert p[-1] < p[-10]
    assert cosmo.power_in_k(0.0) == 0.0


def test_mtor_roundtrip(cosmo):
    M = 1e12
    assert np.isclose(cosmo.RtoM(cosmo.MtoR(M)), M, rtol=1e-12)


def test_rho_crit_value(cosmo):
    # rho_crit ~ 2.775e11 h^2 Msun/Mpc^3
    assert np.isclose(cosmo.rho_crit, 2.775e11 * cosmo.hlittle**2, rtol=1e-3)


def test_comoving_distance_monotonic(cosmo):
    z = np.array([0.0, 1.0, 6.0, 10.0, 30.0])
    d = cosmo.comoving_distance(z)
    assert np.all(np.diff(d) > 0)
    # z=1 comoving distance for Planck18 is ~3395 Mpc
    assert np.isclose(cosmo.comoving_distance(1.0), 3395.0, rtol=0.01)


def test_ddicke_dt_negative(cosmo):
    # D grows with time; dt/dz < 0 so ddicke_dt must be > 0
    assert cosmo.ddicke_dt(10.0) > 0
    assert cosmo.dtdz(10.0) < 0


def test_class_transfer_registration():
    """POWER_SPECTRUM='CLASS' with a registered table: a table generated from
    the EH transfer must reproduce the EH power spectrum, and an unregistered
    CLASS request must raise with guidance."""
    import pytest

    import py21cmfast_tpu as p21
    from py21cmfast_tpu import inputs as inp_mod

    saved = dict(inp_mod._class_transfer)
    try:
        inp_mod._class_transfer.update({"density": None, "vcb": None})
        inp_mod._cached_cosmology.cache_clear()
        bad = p21.InputParameters(random_seed=1).evolve_input_structs(
            POWER_SPECTRUM="CLASS"
        )
        # non-default cosmology: no bundled table applies, must raise
        with pytest.raises(ValueError, match="register_class_transfer"):
            _ = bad.evolve_input_structs(hlittle=0.70).cosmology

        ref = p21.InputParameters(random_seed=1)
        cosmo_eh = ref.cosmology
        k = np.logspace(-4, 2.3, 800)
        t_eh = cosmo_eh.transfer_function(k) * k**2  # CLASS convention ~ k^2
        p21.register_class_transfer(k, t_eh)
        cl = bad.cosmology
        kt = np.logspace(-3, 1, 50)
        np.testing.assert_allclose(
            cl.power_in_k(kt), cosmo_eh.power_in_k(kt), rtol=2e-3
        )
    finally:
        inp_mod._class_transfer.update(saved)
        # drop cosmologies built against the temporary EH-derived table so
        # later tests do not see them through the lru cache
        inp_mod._cached_cosmology.cache_clear()


def test_bundled_class_transfer_autoloads_for_default_cosmology():
    """POWER_SPECTRUM='CLASS' with the default Planck18 cosmology uses the
    packaged CLASS density transfer (_data/class_transfer_density_planck18.dat)
    without a register_class_transfer call; non-default cosmologies still
    require registration (reference runs classy live, inputs.py:1861-1966)."""
    import numpy as np
    import pytest
    import py21cmfast_tpu as p21
    from py21cmfast_tpu import inputs as inp_mod

    # isolate from any table another test registered
    saved = dict(inp_mod._class_transfer)
    inp_mod._class_transfer.update({"density": None, "vcb": None})
    inp_mod._cached_cosmology.cache_clear()

    inputs = p21.InputParameters(random_seed=1).evolve_input_structs(
        POWER_SPECTRUM="CLASS"
    )
    cos = inputs.cosmology
    k = np.array([0.01, 0.1, 1.0])
    p_class = cos.power_in_k(k)
    p_eh = p21.InputParameters(random_seed=1).cosmology.power_in_k(k)
    assert np.all(p_class > 0)
    # CLASS vs the EH fit: same sigma8 normalization, few-% shape differences
    # at k << 1; near k~1 the reference's cubic spline rings through the
    # table's sign flip at k~1.1 (deliberately emulated — see power.py)
    assert np.all(np.abs(p_class[:2] / p_eh[:2] - 1.0) < 0.10)
    assert abs(p_class[2] / p_eh[2] - 1.0) < 0.50

    try:
        with pytest.raises(ValueError, match="register_class_transfer"):
            p21.InputParameters(random_seed=1).evolve_input_structs(
                POWER_SPECTRUM="CLASS", hlittle=0.70
            ).cosmology.power_in_k(0.1)
    finally:
        inp_mod._class_transfer.update(saved)
        inp_mod._cached_cosmology.cache_clear()
