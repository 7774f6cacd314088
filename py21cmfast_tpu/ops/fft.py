"""3D real FFT wrappers (single-device path).

All physics code calls `rfft3`/`irfft3` rather than jnp.fft directly so that the
sharded (mesh) implementation in `parallel.pfft` can be swapped in transparently.
Conventions: forward = unnormalized sum (numpy default), inverse includes 1/N —
i.e. `irfft3(rfft3(x)) == x`.  See models/ics.py for how this maps onto the
reference's FFTW normalization bookkeeping.
"""

from __future__ import annotations

import jax.numpy as jnp


def rfft3(x):
    return jnp.fft.rfftn(x, axes=(0, 1, 2))


def irfft3(kx, shape=None):
    if shape is None:
        n0, n1, nzh = kx.shape
        shape = (n0, n1, 2 * (nzh - 1))
    return jnp.fft.irfftn(kx, s=shape, axes=(0, 1, 2))
