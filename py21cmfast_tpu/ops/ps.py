"""Power-spectrum estimation of 3D boxes (replaces `powerbox` in tests/benchmarks).

Conventions: for a real field f on an (Nx,Ny,Nz) grid of comoving volume V,
  d_k = rfftn(f)  (unnormalized forward)
  P(k) = <|d_k|^2> * V / N^2
which matches the reference's sampling convention E|d_k|^2 = N^2 P / V used in
the GRF (see models/ics.py) and the powerbox estimator used by the golden tests
(test_integration_features.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import grids


def power_spectrum_1d(field, box_lens, n_bins=16, k_min=None, k_max=None, log_bins=True):
    """Spherically-averaged P(k) of a real 3D field.

    Returns (k_centers, P(k), counts) as numpy arrays (host).
    """
    field = jnp.asarray(field)
    shape = field.shape
    n_tot = int(np.prod(shape))
    volume = float(np.prod(box_lens))

    d_k = jnp.fft.rfftn(field)
    pk_grid = (jnp.abs(d_k) ** 2) * (volume / n_tot**2)

    kmag = grids.kmag_grid(shape, box_lens, dtype=jnp.float64)

    # half-space mode multiplicity: kz=0 and (even Nz) kz=Nz/2 planes count once
    nz = shape[2]
    w = jnp.full(nz // 2 + 1, 2.0)
    w = w.at[0].set(1.0)
    if nz % 2 == 0:
        w = w.at[-1].set(1.0)
    weights = jnp.broadcast_to(w[None, None, :], pk_grid.shape)

    kmag = np.asarray(kmag).ravel()
    pk = np.asarray(pk_grid).ravel()
    weights = np.asarray(weights).ravel()

    if k_min is None:
        k_min = 2 * np.pi / max(box_lens)
    if k_max is None:
        k_max = np.pi * min(s / l for s, l in zip(shape, box_lens))  # Nyquist

    if log_bins:
        edges = np.logspace(np.log10(k_min), np.log10(k_max), n_bins + 1)
    else:
        edges = np.linspace(k_min, k_max, n_bins + 1)

    idx = np.digitize(kmag, edges) - 1
    valid = (idx >= 0) & (idx < n_bins) & (kmag > 0)
    psum = np.bincount(idx[valid], weights=(pk * weights)[valid], minlength=n_bins)
    ksum = np.bincount(idx[valid], weights=(kmag * weights)[valid], minlength=n_bins)
    counts = np.bincount(idx[valid], weights=weights[valid], minlength=n_bins)
    with np.errstate(invalid="ignore"):
        return ksum / counts, psum / counts, counts


def reference_binned_power(field, box_lens, bins=None):
    """P(k) binned exactly like the reference golden tests.

    The reference produces its gold spectra with powerbox.get_power(field,
    boxlength=BOX_LEN, bins_upto_boxlen=True) (produce_integration_test_data.py:
    84-280).  That scheme, reverse-engineered against the stored gold k-centers
    (matches to <5e-9):

      bins    = int(N_geom // 2.2), N_geom = prod(shape)**(1/3)
      edges   = linspace(0, min-axis Nyquist, bins+1)   [linear; DC in bin 0;
                 modes with |k| == Nyquist dropped]
      k_c     = unweighted mean |k| of the full-FFT modes in the bin
      P       = mean |fftn(f)|^2 * V / N_tot^2 over the bin

    Implemented on the rfft half-space with hermitian multiplicity weights
    (equivalent to full-fftn mode counting).  Returns (k_centers, P, counts).
    """
    field = np.asarray(field, dtype=np.float64)
    shape = field.shape
    n_tot = int(np.prod(shape))
    if np.isscalar(box_lens):
        box_lens = (float(box_lens),) * 3
    volume = float(np.prod(box_lens))

    if bins is None:
        bins = int(n_tot ** (1.0 / 3.0) // 2.2)

    d_k = np.fft.rfftn(field)
    pk_grid = (np.abs(d_k) ** 2) * (volume / n_tot**2)

    axes = [2 * np.pi * np.fft.fftfreq(s, d=l / s) for s, l in zip(shape, box_lens)]
    axes[2] = axes[2][: shape[2] // 2 + 1]
    kmag = np.sqrt(
        axes[0][:, None, None] ** 2 + axes[1][None, :, None] ** 2 + axes[2][None, None, :] ** 2
    )

    # hermitian multiplicity: kz=0 plane (and kz=Nyquist for even Nz) once
    nz = shape[2]
    w = np.full(nz // 2 + 1, 2.0)
    w[0] = 1.0
    if nz % 2 == 0:
        w[-1] = 1.0
    weights = np.broadcast_to(w[None, None, :], pk_grid.shape)

    kny = min(np.pi * s / l for s, l in zip(shape, box_lens))
    edges = np.linspace(0.0, kny, bins + 1)

    mag = kmag.ravel()
    pk = pk_grid.ravel()
    wts = weights.ravel()
    idx = np.digitize(mag, edges) - 1
    valid = (idx >= 0) & (idx < bins)
    psum = np.bincount(idx[valid], weights=(pk * wts)[valid], minlength=bins)
    ksum = np.bincount(idx[valid], weights=(mag * wts)[valid], minlength=bins)
    counts = np.bincount(idx[valid], weights=wts[valid], minlength=bins)
    with np.errstate(invalid="ignore"):
        return ksum / counts, psum / counts, counts


def dimensionless_power(field, box_lens, **kw):
    """Delta^2(k) = k^3 P(k) / (2 pi^2)."""
    k, p, n = power_spectrum_1d(field, box_lens, **kw)
    return k, k**3 * p / (2 * np.pi**2), n
