"""Initial-conditions tests: GRF power-spectrum recovery, displacement fields.

Parity philosophy follows the reference golden tests: statistical/PS-level
agreement, not bitwise (seeds differ between GSL and threefry by construction).
"""

import numpy as np
import pytest

from py21cmfast_tpu.inputs import InputParameters
from py21cmfast_tpu.models.ics import compute_initial_conditions
from py21cmfast_tpu.ops import ps


@pytest.fixture(scope="module")
def inputs():
    return InputParameters(random_seed=42).evolve_input_structs(
        HII_DIM=32, DIM=96, BOX_LEN=96.0
    )


@pytest.fixture(scope="module")
def ics(inputs):
    return compute_initial_conditions(inputs)


def test_shapes(inputs, ics):
    so = inputs.simulation_options
    assert ics.hires_density.shape == so.hires_shape
    assert ics.lowres_density.shape == so.lowres_shape
    assert ics.vx.shape == so.lowres_shape  # default: perturb on lowres
    assert ics.vx_2LPT is not None  # default PERTURB_ALGORITHM=2LPT


def test_density_mean_zero(ics):
    # hires DC mode is zeroed exactly; lowres is *subsampled* (not averaged) so
    # its mean carries sample variance ~ sigma/sqrt(N_indep)
    assert abs(float(np.mean(np.asarray(ics.hires_density)))) < 1e-6
    lowres = np.asarray(ics.lowres_density)
    assert abs(lowres.mean()) < 5 * lowres.std() / np.sqrt(lowres.size) * 10


def test_hires_power_spectrum_recovery(inputs, ics):
    """Measured P(k) of the sampled field must match the input P(k) within
    cosmic variance over well-populated bins."""
    so = inputs.simulation_options
    cosmo = inputs.cosmology
    k, pk, counts = ps.power_spectrum_1d(
        np.asarray(ics.hires_density), so.box_lens, n_bins=12
    )
    good = counts > 200
    expected = cosmo.power_in_k(k[good])
    ratio = pk[good] / expected
    # relative sample error per bin ~ sqrt(2/counts); allow 5 sigma
    tol = 5 * np.sqrt(2.0 / counts[good])
    assert np.all(np.abs(ratio - 1) < np.maximum(tol, 0.05)), ratio


def test_lowres_density_suppressed_at_high_k(inputs, ics):
    """The lowres field is tophat-filtered: its small-scale power must be below
    the raw P(k)."""
    so = inputs.simulation_options
    cosmo = inputs.cosmology
    k, pk, counts = ps.power_spectrum_1d(
        np.asarray(ics.lowres_density), so.box_lens, n_bins=10
    )
    good = counts > 50
    k, pk = k[good], pk[good]
    expected = cosmo.power_in_k(k)
    # near the lowres Nyquist the filter suppresses power strongly
    assert pk[-1] < 0.8 * expected[-1]
    # at the largest scales it should be unaffected (within variance)
    assert np.isclose(pk[0], expected[0], rtol=0.6)


def test_za_displacement_divergence_matches_density(inputs, ics):
    """div(psi) = -delta for the Zel'dovich field: check in k-space on lowres.

    psi is filtered+subsampled, so compare only large-scale modes.
    """
    import jax.numpy as jnp

    from py21cmfast_tpu.ops import fft, grids

    so = inputs.simulation_options
    box_lens = so.box_lens
    shape = so.lowres_shape
    kx, ky, kz = grids.k_axes(shape, box_lens)
    div_k = (
        fft.rfft3(ics.vx) * 1j * kx[:, None, None]
        + fft.rfft3(ics.vy) * 1j * ky[None, :, None]
        + fft.rfft3(ics.vz) * 1j * kz[None, None, :]
    )
    d_k = fft.rfft3(ics.lowres_density)
    kmag = np.asarray(grids.kmag_grid(shape, box_lens))
    # compare on large scales only (subsampling aliases small scales)
    sel = (kmag > 0) & (kmag < 0.3)
    ratio = np.asarray(-div_k)[sel] / np.asarray(d_k)[sel]
    assert np.abs(np.median(ratio.real) - 1) < 0.05
    assert np.median(np.abs(ratio - 1)) < 0.2


def test_2lpt_displacement_is_second_order(inputs, ics):
    """The *effective* 2LPT displacement (with its -3/7 D^2 growth scaling)
    must be subdominant to the ZA displacement at any simulated redshift.
    The raw stored fields carry no growth factors, so compare at z=8."""
    cosmo = inputs.cosmology
    D = float(cosmo.dicke(8.0))
    za = float(np.std(np.asarray(ics.vx))) * D
    lpt2 = float(np.std(np.asarray(ics.vx_2LPT))) * (3.0 / 7.0) * D**2
    assert 0.0 < lpt2 < 0.2 * za


def test_seed_reproducibility(inputs):
    a = compute_initial_conditions(inputs)
    b = compute_initial_conditions(inputs)
    np.testing.assert_array_equal(np.asarray(a.hires_density), np.asarray(b.hires_density))


def test_injected_density(inputs):
    """User-provided density field path (reference single_field.py:94-113)."""
    rng = np.random.default_rng(7)
    field = rng.normal(size=inputs.simulation_options.hires_shape).astype(np.float32)
    ics2 = compute_initial_conditions(inputs, initial_density=field)
    np.testing.assert_array_equal(np.asarray(ics2.hires_density), field)
    assert ics2.vx.shape == inputs.simulation_options.lowres_shape


def test_staged_fft_matches_monolithic():
    """The low-memory per-axis FFT path (ops.fft._rfft3_staged/_irfft3_staged,
    used above 600^3 where the monolithic XLA TPU rfftn OOMs) is exact."""
    import jax.numpy as jnp

    from py21cmfast_tpu.ops import fft

    rng = np.random.default_rng(3)
    x = rng.normal(size=(24, 36, 40)).astype(np.float32)
    k_st = np.asarray(fft._rfft3_staged(jnp.asarray(x)))
    k_np = np.fft.rfftn(x)
    assert np.abs(k_st - k_np).max() < 1e-5 * np.abs(k_np).max()
    r_st = np.asarray(
        fft._irfft3_staged(jnp.asarray(k_np.astype(np.complex64)), (24, 36, 40))
    )
    r_np = np.fft.irfftn(k_np, s=(24, 36, 40), axes=(0, 1, 2))
    assert np.abs(r_st - r_np).max() < 1e-5 * max(np.abs(r_np).max(), 1e-9)


def test_truncated_dk_matches_lowres_sampling():
    """Spectral truncation of the rfft cube (ics._truncate_dk, used for the
    oversized-2LPT source) reproduces band-limited irfftn exactly."""
    import jax.numpy as jnp

    from py21cmfast_tpu.models.ics import _truncate_dk
    from py21cmfast_tpu.ops import fft

    rng = np.random.default_rng(5)
    x = rng.normal(size=(32, 32, 32)).astype(np.float32)
    d_k = np.fft.rfftn(x)
    d_k_t = np.asarray(
        _truncate_dk(
            jnp.asarray(d_k.astype(np.complex64)),
            hi_shape=(32, 32, 32),
            trunc_shape=(16, 16, 16),
        )
    )
    small = np.fft.irfftn(d_k_t, s=(16, 16, 16), axes=(0, 1, 2))
    # reference: zero out modes above the truncated Nyquist, transform, sample
    ref = np.zeros((16, 16, 9), np.complex128)
    ref[:8, :8] = d_k[:8, :8, :9]
    ref[:8, 8:] = d_k[:8, 24:, :9]
    ref[8:, :8] = d_k[24:, :8, :9]
    ref[8:, 8:] = d_k[24:, 24:, :9]
    ref_field = np.fft.irfftn(ref * (16**3 / 32**3), s=(16, 16, 16), axes=(0, 1, 2))
    assert np.abs(small - ref_field).max() < 1e-5 * np.abs(ref_field).std()


def test_big_ics_path_matches_small(inputs, monkeypatch):
    """The top-level staged big-grid ICs pipeline (donated per-axis FFTs,
    used above ~600^3 where one-jit-per-field OOMs) is numerically identical
    to the fused small-grid path."""
    from py21cmfast_tpu.ops import fft as fftmod

    a = compute_initial_conditions(inputs)
    monkeypatch.setattr(fftmod, "_STAGED_FFT_CELLS", 1)
    b = compute_initial_conditions(inputs)
    for name in ("hires_density", "lowres_density", "vx", "vy", "vz"):
        x = np.asarray(getattr(a, name))
        y = np.asarray(getattr(b, name))
        assert np.abs(x - y).max() < 2e-4 * max(np.abs(x).max(), 1e-12), name
