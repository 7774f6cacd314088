"""Filter-bank tests, mirroring the reference's analytic filter checks
(tests/test_filtering.py: filtered volumes vs analytic windows)."""

import jax.numpy as jnp
import numpy as np
import pytest

from py21cmfast_tpu.ops import fft, filters, grids


@pytest.mark.parametrize("ftype", [filters.TOPHAT, filters.SHARPK, filters.GAUSSIAN])
def test_filter_preserves_mean(ftype):
    """W(k=0)=1: filtering must preserve the box mean."""
    rng = np.random.default_rng(1)
    box = jnp.asarray(rng.normal(size=(16, 16, 16)).astype(np.float32)) + 5.0
    kbox = fft.rfft3(box)
    kmag = grids.kmag_grid(box.shape, (50.0, 50.0, 50.0))
    filt = fft.irfft3(filters.filter_kbox(kbox, kmag, ftype, R=5.0), box.shape)
    assert np.isclose(float(filt.mean()), float(box.mean()), rtol=1e-5)


def test_tophat_filter_flattens_small_scales():
    """Filtering at R ~ box size should strongly suppress variance."""
    rng = np.random.default_rng(2)
    box = jnp.asarray(rng.normal(size=(32, 32, 32)).astype(np.float32))
    kbox = fft.rfft3(box)
    kmag = grids.kmag_grid(box.shape, (100.0, 100.0, 100.0))
    filt = fft.irfft3(filters.filter_kbox(kbox, kmag, filters.TOPHAT, R=30.0), box.shape)
    assert float(jnp.var(filt)) < 0.01 * float(jnp.var(box))


def test_tophat_analytic_point_source():
    """A delta function filtered with a tophat of radius R becomes ~uniform inside
    a sphere of radius R: check the profile crosses half-max near r=R."""
    n, L = 64, 100.0
    box = np.zeros((n, n, n), np.float32)
    box[0, 0, 0] = 1.0
    kbox = fft.rfft3(jnp.asarray(box))
    kmag = grids.kmag_grid(box.shape, (L, L, L))
    R = 15.0
    filt = np.asarray(fft.irfft3(filters.filter_kbox(kbox, kmag, filters.TOPHAT, R), box.shape))
    # radial profile along an axis
    r = np.arange(n // 2) * L / n
    prof = filt[: n // 2, 0, 0]
    inside = prof[r < R * 0.8]
    outside = prof[(r > R * 1.3) & (r < 2.5 * R)]
    assert inside.std() / inside.mean() < 0.15  # flat inside
    assert np.abs(outside).max() < 0.25 * inside.mean()  # small outside


def test_exp_mfp_less_than_tophat():
    """The exponentially-damped tophat must lie below the plain tophat for kR->0
    (it weighs distant shells by exp(-r/mfp))."""
    kmag = jnp.asarray(np.linspace(0, 3, 100, dtype=np.float32))
    R, mfp = 10.0, 5.0
    w_exp = filters.w_exp_mfp(kmag, R, mfp)
    assert float(w_exp[0]) < 1.0
    assert float(w_exp[0]) > 0.0
    # analytic kR->0 limit: 3 * integral_0^R r^2 exp(-r/mfp) dr / R^3
    ratio = mfp / R
    expected = 6 * ratio**3 - np.exp(-1 / ratio) * (6 * ratio**3 + 6 * ratio**2 + 3 * ratio)
    assert np.isclose(float(w_exp[0]), expected, rtol=1e-5)


def test_shell_filter_limits():
    """Annulus filter: R_inner -> 0 reduces to a tophat of R_outer."""
    kmag = jnp.asarray(np.linspace(0.01, 2, 50, dtype=np.float32))
    w_shell = filters.w_shell(kmag, 1e-6, 8.0)
    w_th = filters.w_tophat(kmag * 8.0)
    np.testing.assert_allclose(np.asarray(w_shell), np.asarray(w_th), atol=2e-5)


def test_sharpk_cut():
    kmag = jnp.asarray([0.1, 10.0], dtype=jnp.float32)
    w = filters.filter_weights(kmag, filters.SHARPK, R=1.0)
    assert float(w[0]) == 1.0 and float(w[1]) == 0.0


class TestMultipleScattering:
    """Filter 5: Lya multiple-scattering annulus window (filtering.c:119-307)."""

    def test_series_matches_mpmath(self):
        import mpmath

        from py21cmfast_tpu.ops.filters import hyper_2f3_window

        for alpha, beta in [(0.5, 0.8), (2.0, 1.5), (5.0, 0.3)]:
            krs = np.array([0.01, 0.5, 3.0, 10.0, 25.0])
            ours = hyper_2f3_window(krs, alpha, beta)
            a1, a2 = (2 + alpha) / 2, (3 + alpha) / 2
            b2, b3 = (2 + alpha + beta) / 2, (3 + alpha + beta) / 2
            exact = np.array(
                [float(mpmath.hyp2f3(a1, a2, 2.5, b2, b3, -(k**2) / 4)) for k in krs]
            )
            np.testing.assert_allclose(ours, exact, rtol=5e-4)

    def test_beta_zero_is_tophat(self):
        from py21cmfast_tpu.ops.filters import hyper_2f3_window

        krs = np.linspace(0.01, 50, 40)
        w = hyper_2f3_window(krs, 1.0, 0.0)
        w_th = 3 * (np.sin(krs) - krs * np.cos(krs)) / krs**3
        np.testing.assert_allclose(w, w_th, atol=1e-12)

    def test_window_normalised_at_k0(self):
        from py21cmfast_tpu.ops.filters import ms_filter_table

        kt, wt = ms_filter_table(5.0, 2.0, 6.0, 3.0)
        assert wt[0] == 1.0
        assert np.isfinite(wt).all()
        # low-k limit -> 1 (mean-preserving), high-k suppressed
        assert abs(wt[1] - 1.0) < 1e-3
        assert abs(wt[-1]) < 0.05

    def test_ms_broader_than_straightline(self):
        """Multiple scattering diffuses photons: the MS window is *narrower* in k
        (more extended in r) than the straight-line annulus at moderate k."""
        from py21cmfast_tpu.ops.filters import ms_window

        k = np.linspace(0.3, 1.0, 20)
        Ri, Ro, Rstar = 3.0, 8.0, 50.0  # x_em < 1: strong scattering regime
        w_ms = ms_window(k, Ri, Ro, Rstar)
        w_sl = np.asarray(filters.w_shell(jnp.asarray(k, jnp.float64), Ri, Ro))
        # windows differ measurably once scattering matters
        assert np.max(np.abs(w_ms - w_sl)) > 0.01

    def test_device_interp_matches_host(self):
        from py21cmfast_tpu.ops.filters import ms_filter_table, ms_window, w_multiple_scattering

        kt, wt = ms_filter_table(5.0, 2.0, 6.0, 3.0, n_k=4096)
        kq = np.linspace(0.05, 4.9, 57)
        dev = np.asarray(w_multiple_scattering(jnp.asarray(kq, jnp.float32), kt, wt))
        host = ms_window(kq, 2.0, 6.0, 3.0)
        np.testing.assert_allclose(dev, host, atol=2e-4)
