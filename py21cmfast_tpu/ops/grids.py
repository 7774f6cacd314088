"""k-space grid helpers for rfftn-layout boxes (device-side, jittable).

Conventions: numpy/JAX FFT layout — a real box of shape (Nx, Ny, Nz) transforms
to a complex half-space (Nx, Ny, Nz//2 + 1).  k_i = 2*pi*n_i/L_i with n wrapped
to [-N/2, N/2] (reference indexing.h:116-120 `index_to_k`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def k_axes(shape, box_lens, dtype=jnp.float32):
    """Return (kx, ky, kz) 1D arrays for an rfftn half-space of a real box."""
    nx, ny, nz = shape
    lx, ly, lz = box_lens
    kx = jnp.asarray(np.fft.fftfreq(nx) * nx * 2 * np.pi / lx, dtype=dtype)
    ky = jnp.asarray(np.fft.fftfreq(ny) * ny * 2 * np.pi / ly, dtype=dtype)
    kz = jnp.asarray(np.fft.rfftfreq(nz) * nz * 2 * np.pi / lz, dtype=dtype)
    return kx, ky, kz


def kmag_grid(shape, box_lens, dtype=jnp.float32):
    """|k| on the rfftn half-space, shape (Nx, Ny, Nz//2+1)."""
    kx, ky, kz = k_axes(shape, box_lens, dtype)
    return jnp.sqrt(
        kx[:, None, None] ** 2 + ky[None, :, None] ** 2 + kz[None, None, :] ** 2
    )


def ksq_grid(shape, box_lens, dtype=jnp.float32):
    kx, ky, kz = k_axes(shape, box_lens, dtype)
    return kx[:, None, None] ** 2 + ky[None, :, None] ** 2 + kz[None, None, :] ** 2


def resample_indices(n_out: int, n_in: int):
    """Strided subsampling indices: lowres index i -> hires index int(i*ratio+0.5).

    Mirrors reference indexing.h:110-114 `resample_index` (note the +0.5 is on the
    *output* resolution since the ratio may be non-integer).
    """
    ratio = n_in / n_out
    idx = (np.arange(n_out) * ratio + 0.5).astype(np.int64)
    return np.clip(idx, 0, n_in - 1)


def subsample(field, out_shape):
    """Subsample a 3D real-space field at strided points (no averaging), as the
    reference does when assigning hires -> lowres grids."""
    in_shape = field.shape
    ix = resample_indices(out_shape[0], in_shape[0])
    iy = resample_indices(out_shape[1], in_shape[1])
    iz = resample_indices(out_shape[2], in_shape[2])
    return field[jnp.ix_(jnp.asarray(ix), jnp.asarray(iy), jnp.asarray(iz))]


def uniform_lerp(x, x0, inv_dx, table):
    """Linear interpolation on a UNIFORM 1D grid: table[i] at x0 + i/inv_dx.

    `jnp.interp` lowers to a searchsorted that is pathologically slow on TPU
    at grid scale (~10 s at 512^3); for uniform tables the index is direct
    arithmetic + one gather."""
    t = (x - x0) * inv_dx
    t = jnp.clip(t, 0.0, table.shape[0] - 1.001)
    i0 = t.astype(jnp.int32)
    f = t - i0
    return table[i0] * (1.0 - f) + table[i0 + 1] * f
