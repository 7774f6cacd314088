"""Spin-temperature tests: thermal history shape, coupling regimes, ODE sanity.

Mirrors the physics checks the reference gets from its golden 'ts' config at
much smaller scale (tier-1 of SURVEY.md §4), plus direct unit checks of the
heating helpers (tier-2)."""

import numpy as np
import pytest

import py21cmfast_tpu as p21
from py21cmfast_tpu.models import heating, spintemp


@pytest.fixture(scope="module")
def inputs():
    return p21.InputParameters(random_seed=21).evolve_input_structs(
        HII_DIM=16, DIM=32, BOX_LEN=32.0, SOURCE_MODEL="E-INTEGRAL",
        ZPRIME_STEP_FACTOR=1.25,
    )


@pytest.fixture(scope="module")
def history(inputs):
    ics = p21.compute_initial_conditions(inputs)
    zs = [35.0]
    z = 35.0
    while z > 11.0:
        z = (1 + z) / 1.25 - 1
        zs.append(z)
    out = []
    state, prev_z = None, None
    for z in zs:
        pf = p21.perturb_field(z, inputs, ics)
        ts, state = spintemp.compute_spin_temperature(
            z, inputs, pf, prev_state=state, prev_redshift=prev_z
        )
        prev_z = z
        out.append((z, ts))
    return out


def test_initial_conditions_adiabatic(history):
    z, ts = history[0]
    tk = float(np.mean(np.asarray(ts.kinetic_temp_neutral)))
    # Tk should be close to the RECFAST adiabatic value at z=35 (~26 K)
    assert 20 < tk < 33
    # Ts between Tk and Tcmb
    tcmb = 2.7255 * (1 + z)
    ts_mean = float(np.mean(np.asarray(ts.spin_temperature)))
    assert tk < ts_mean < tcmb


def test_adiabatic_cooling_phase(history):
    """Before X-ray heating, Tk follows (1+z)^2 cooling."""
    z1, ts1 = history[0]
    z2, ts2 = history[1]
    tk1 = float(np.mean(np.asarray(ts1.kinetic_temp_neutral)))
    tk2 = float(np.mean(np.asarray(ts2.kinetic_temp_neutral)))
    # pure-adiabatic scaling, loosened for residual Compton coupling at z~30
    # and the first finite step of the Euler update
    expected = ((1 + z2) / (1 + z1)) ** 2
    assert np.isclose(tk2 / tk1, expected, rtol=0.3)
    assert tk2 < tk1


def test_heating_turnaround(history):
    """Tk must eventually rise above the adiabatic track (X-ray heating)."""
    tks = [float(np.mean(np.asarray(ts.kinetic_temp_neutral))) for _, ts in history]
    assert min(tks) < tks[0]  # cooled first
    assert tks[-1] > min(tks) * 1.2  # then heated


def test_xe_grows_from_xrays(history):
    xes = [float(np.mean(np.asarray(ts.xray_ionised_fraction))) for _, ts in history]
    assert xes[-1] > xes[0]
    assert all(0 < x < 0.1 for x in xes)


def test_ts_approaches_tk_when_coupled(history):
    """Late times: strong Lya coupling drives Ts -> Tk."""
    z, ts = history[-1]
    ts_m = float(np.mean(np.asarray(ts.spin_temperature)))
    tk_m = float(np.mean(np.asarray(ts.kinetic_temp_neutral)))
    tcmb = 2.7255 * (1 + z)
    assert abs(ts_m - tk_m) < abs(ts_m - tcmb) * 3  # closer to Tk than CMB, roughly


def test_brightness_with_ts(inputs, history):
    """tau21 path: Tb sign must track (Ts - Tcmb)."""
    ics = p21.compute_initial_conditions(inputs)
    z, ts = history[3]
    pf = p21.perturb_field(z, inputs, ics)
    ion = p21.compute_ionization_field(z, inputs, pf, spin_temp=ts)
    tb = p21.brightness_temperature(inputs, ion, pf, spin_temp=ts)
    tcmb = 2.7255 * (1 + z)
    ts_m = float(np.mean(np.asarray(ts.spin_temperature)))
    tb_m = float(np.mean(np.asarray(tb.brightness_temp)))
    assert (tb_m < 0) == (ts_m < tcmb)
    assert tb.tau_21 is not None
    assert np.all(np.asarray(tb.tau_21) >= 0)


# ---------------- heating helper units (tier-2 style) ----------------


def test_cross_sections():
    nu_hi = 3.288465e15
    assert heating.sigma_HI(nu_hi * 0.99) == 0.0
    s0 = heating.sigma_HI(nu_hi * 1.001)
    assert np.isclose(s0, 6.3e-18, rtol=0.05)
    # steep decline ~ nu^-3
    ratio = heating.sigma_HI(nu_hi * 8) / heating.sigma_HI(nu_hi * 2)
    assert 3.5**-3 > ratio > 5.0**-3.5


def test_xint_tables_monotonic():
    """More ionized medium -> more heating, fewer secondary ionizations."""
    x = heating.get_xint_tables()
    E = np.array([1000.0])
    f_lo = x.fheat(E, 1e-4)[0]
    f_hi = x.fheat(E, 0.5)[0]
    assert f_hi > f_lo
    n_lo = x.n_ion_total(E, 1e-4)[0]
    n_hi = x.n_ion_total(E, 0.5)[0]
    assert n_lo > n_hi


def test_frecycle_values():
    assert heating.frecycle(4) == 0.2609
    assert heating.frecycle(3) == 0
    assert heating.frecycle(2) == 1


def test_nu_n_lyman_series():
    assert np.isclose(heating.nu_n(2), 1.0)  # Lya itself
    assert np.isclose(heating.nu_n(100), 4.0 / 3.0, rtol=1e-3)  # Lyman limit


def test_zmax():
    # Lyb photons emitted above zmax(z, 2) redshift past Lya before reaching z
    z = 10.0
    zm = heating.zmax_lyn(z, 2)
    assert 12 < zm < 14  # (1+z)*32/27 - 1


def test_alpha_A_magnitude():
    # case-A recombination at 1e4 K ~ 4.2e-13
    assert np.isclose(heating.alpha_A(1e4), 4.18e-13, rtol=0.1)


def test_stellar_spectra_normalization():
    """Total ionizing photons between Lya and the Lyman limit ~ POP2_ION order."""
    s = heating.StellarSpectra(5000.0, 44021.0)
    # emissivity should be positive across the Lyman series band
    for nu in [1.01, 1.1, 1.2, 1.3]:
        assert s.emissivity(nu, 2) > 0
        assert s.emissivity(nu, 3) > 0


def test_tau_x_positive_and_monotonic():
    """Regression for the round-4 tau_X sign bug: a descending trapezoid grid
    returned tau < 0, so nu_tau_one bailed to its 24.6 eV floor and the
    freq-integral lower limit collapsed to NU_X_THRESH — zero X-ray
    attenuation in every USE_TS_FLUCT config (reference
    heating_helper_progs.c:1019-1226)."""
    import numpy as np
    import py21cmfast_tpu as p21
    from py21cmfast_tpu.models import heating

    cosmo = p21.InputParameters(random_seed=1).cosmology
    zp, xe = 19.0, 2e-4
    ion_eff = 5000 * 10**-1.25 * 10**-1.35
    nion = lambda z: 1e-4 * np.exp(-(np.asarray(z) - 19.0) / 2.0)  # noqa: E731

    taus, nu1s = [], []
    for zpp in (19.3, 20.5, 22.0, 25.0):
        taus.append(heating.tau_x(
            500 * heating.physconst.eV_to_Hz, zp, zpp, xe, nion, ion_eff,
            cosmo.N_b0, cosmo.dtdz, cosmo.Y_He,
        ))
        nu1s.append(heating.nu_tau_one(
            zp, zpp, xe, nion, ion_eff, cosmo.N_b0, cosmo.dtdz, cosmo.Y_He,
        ))
    taus, nu1s = np.array(taus), np.array(nu1s)
    assert np.all(taus > 0), taus
    assert np.all(np.diff(taus) > 0), taus  # more path -> more optical depth
    assert np.all(np.diff(nu1s) > 0), nu1s  # horizon hardens with distance
    # physical scale: photons from dz ~ 3 away are opaque below ~1 keV at z~19
    assert 800 < nu1s[2] / heating.physconst.eV_to_Hz < 2000, nu1s

