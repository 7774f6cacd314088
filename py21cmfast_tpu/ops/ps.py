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


def dimensionless_power(field, box_lens, **kw):
    """Delta^2(k) = k^3 P(k) / (2 pi^2)."""
    k, p, n = power_spectrum_1d(field, box_lens, **kw)
    return k, k**3 * p / (2 * np.pi**2), n
