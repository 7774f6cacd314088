"""Distributed 3D real FFT: slab decomposition with all_to_all transposes.

Replaces the reference's threaded FFTW (dft.c:18-147) with a mesh-parallel
rfftn: each device owns an x-slab, FFTs its local (y,z) planes, then a single
`all_to_all` over ICI re-slabs the box along y for the final x-axis FFT.  The
k-space result is therefore **ky-sharded** — filters and gradients operate on
that layout directly (no gather), and the inverse reverses the transpose.

These functions are meant to be called *inside* shard_map with mesh axis
`mesh.GRID_AXIS`; shapes are per-shard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .mesh import GRID_AXIS


def rfft3(local_x):
    """(nx/p, ny, nz) real x-slab -> (nx, ny/p, nz//2+1) complex ky-shard."""
    k_yz = jnp.fft.rfftn(local_x, axes=(1, 2))  # local transform on unsharded axes
    # transpose: split ky across devices, gather x
    k_t = jax.lax.all_to_all(k_yz, GRID_AXIS, split_axis=1, concat_axis=0, tiled=True)
    return jnp.fft.fft(k_t, axis=0)


def irfft3(local_k, nz: int):
    """(nx, ny/p, nz//2+1) ky-shard -> (nx/p, ny, nz) real x-slab."""
    k_t = jnp.fft.ifft(local_k, axis=0)
    k_yz = jax.lax.all_to_all(k_t, GRID_AXIS, split_axis=0, concat_axis=1, tiled=True)
    return jnp.fft.irfftn(k_yz, s=(k_yz.shape[1], nz), axes=(1, 2))


def local_k_axes(shape, box_lens, n_shards: int, dtype=jnp.float32):
    """k-axes for the ky-sharded layout: full kx/kz, this shard's ky chunk.

    Call inside shard_map; uses the mesh axis index to slice ky.
    """
    import numpy as np

    nx, ny, nz = shape
    lx, ly, lz = box_lens
    kx = jnp.asarray(np.fft.fftfreq(nx) * nx * 2 * np.pi / lx, dtype=dtype)
    ky_full = jnp.asarray(np.fft.fftfreq(ny) * ny * 2 * np.pi / ly, dtype=dtype)
    kz = jnp.asarray(np.fft.rfftfreq(nz) * nz * 2 * np.pi / lz, dtype=dtype)
    chunk = ny // n_shards
    idx = jax.lax.axis_index(GRID_AXIS)
    ky = jax.lax.dynamic_slice_in_dim(ky_full, idx * chunk, chunk)
    return kx, ky, kz


def local_kmag(shape, box_lens, n_shards: int, dtype=jnp.float32):
    kx, ky, kz = local_k_axes(shape, box_lens, n_shards, dtype)
    return jnp.sqrt(
        kx[:, None, None] ** 2 + ky[None, :, None] ** 2 + kz[None, None, :] ** 2
    )
