"""fold_kt_spectrum: alias-fold decimation must EXACTLY reproduce
irfft-then-stride-subsample (the big-grid ICs path relies on this identity
to avoid materializing a second hires real grid at DIM>=1024)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from py21cmfast_tpu.ops import fft, grids  # noqa: E402


@pytest.mark.parametrize("hi,out", [((48, 48, 48), (12, 12, 12)),
                                    ((48, 48, 48), (16, 16, 16)),
                                    ((32, 32, 64), (16, 16, 16))])
def test_fold_matches_subsample(hi, out):
    rng = np.random.default_rng(7)
    x = rng.standard_normal(hi).astype(np.float32)
    y = jnp.fft.rfftn(jnp.asarray(x)).astype(jnp.complex64)
    # kz-major layout
    y_kt = jnp.transpose(y, (2, 0, 1))
    k_small = fft._fold_kt_spectrum_body(y_kt, hi_shape=hi, out_shape=out)
    got = np.asarray(jnp.fft.irfftn(k_small, s=out))

    full = np.asarray(jnp.fft.irfftn(y, s=hi))
    want = np.asarray(grids.subsample(jnp.asarray(full), out))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fold_matches_subsample_complex_modes():
    """A field with power up to Nyquist (stress the mirrored blocks)."""
    hi, out = (40, 40, 40), (10, 10, 10)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(hi).astype(np.float32)
    x += np.cos(np.pi * np.arange(hi[2]))[None, None, :].astype(np.float32)
    y_kt = jnp.transpose(jnp.fft.rfftn(jnp.asarray(x)).astype(jnp.complex64),
                         (2, 0, 1))
    k_small = fft._fold_kt_spectrum_body(y_kt, hi_shape=hi, out_shape=out)
    got = np.asarray(jnp.fft.irfftn(k_small, s=out))
    full = np.asarray(jnp.fft.irfftn(jnp.fft.rfftn(jnp.asarray(x)), s=hi))
    want = full[::4, ::4, ::4]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_can_fold():
    assert fft.can_fold((1024,) * 3, (256,) * 3)
    assert not fft.can_fold((150,) * 3, (50, 50, 49))
    assert not fft.can_fold((150,) * 3, (49, 49, 49))
