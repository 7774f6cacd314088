"""Cloud-in-cell mass assignment (device-side, race-free by construction).

TPU-native equivalent of reference map_mass.c:19-210.  The C code scatters with
OpenMP atomics; here each of the 8 CIC corners becomes one vectorized
scatter-add (`.at[].add`), which XLA lowers to a deterministic sorted
segment-sum on TPU — no atomics, bitwise reproducible.

Large particle sets are processed in slabs via `lax.scan` (see
`models/perturb.py`) so peak memory stays bounded by the slab, not DIM^3.
"""

from __future__ import annotations

import jax.numpy as jnp


def cic_scatter_flat(acc_flat, px, py, pz, weights, out_shape):
    """Scatter-add `weights` at fractional positions into a flattened grid.

    Positions are in *output-grid cell units* (cell centres at integer coords,
    matching reference map_mass.c:28 'cell at idx==0 centred at (0,0,0)'),
    periodic wrapping applied.
    """
    nx, ny, nz = out_shape
    ix0 = jnp.floor(px)
    iy0 = jnp.floor(py)
    iz0 = jnp.floor(pz)
    fx = (px - ix0).astype(acc_flat.dtype)
    fy = (py - iy0).astype(acc_flat.dtype)
    fz = (pz - iz0).astype(acc_flat.dtype)
    ix0 = ix0.astype(jnp.int32) % nx
    iy0 = iy0.astype(jnp.int32) % ny
    iz0 = iz0.astype(jnp.int32) % nz
    ix1 = (ix0 + 1) % nx
    iy1 = (iy0 + 1) % ny
    iz1 = (iz0 + 1) % nz

    w = weights.astype(acc_flat.dtype)
    for xi, wx in ((ix0, 1.0 - fx), (ix1, fx)):
        for yi, wy in ((iy0, 1.0 - fy), (iy1, fy)):
            base = (xi * ny + yi) * nz
            for zi, wz in ((iz0, 1.0 - fz), (iz1, fz)):
                idx = (base + zi).reshape(-1)
                acc_flat = acc_flat.at[idx].add((w * wx * wy * wz).reshape(-1))
    return acc_flat


def cic_scatter_window(acc_flat, px, py, pz, weights, window_shape):
    """Scatter-add into a slab-local window: x CLAMPED into the window (the
    caller guarantees a margin covering the max displacement; the window is
    roll-added into the periodic grid afterwards), y/z periodic."""
    wx, ny, nz = window_shape
    ix0 = jnp.floor(px)
    iy0 = jnp.floor(py)
    iz0 = jnp.floor(pz)
    fx = (px - ix0).astype(acc_flat.dtype)
    fy = (py - iy0).astype(acc_flat.dtype)
    fz = (pz - iz0).astype(acc_flat.dtype)
    ix0 = jnp.clip(ix0.astype(jnp.int32), 0, wx - 2)
    iy0 = iy0.astype(jnp.int32) % ny
    iz0 = iz0.astype(jnp.int32) % nz
    ix1 = ix0 + 1
    iy1 = (iy0 + 1) % ny
    iz1 = (iz0 + 1) % nz

    w = weights.astype(acc_flat.dtype)
    for xi, wxw in ((ix0, 1.0 - fx), (ix1, fx)):
        for yi, wy in ((iy0, 1.0 - fy), (iy1, fy)):
            base = (xi * ny + yi) * nz
            for zi, wz in ((iz0, 1.0 - fz), (iz1, fz)):
                idx = (base + zi).reshape(-1)
                acc_flat = acc_flat.at[idx].add(
                    (w * wxw * wy * wz).reshape(-1), mode="promise_in_bounds"
                )
    return acc_flat


def cic_read(box, px, py, pz):
    """Trilinear (CIC) read of `box` at fractional positions (map_mass.c:102-140)."""
    nx, ny, nz = box.shape
    ix0 = jnp.floor(px)
    iy0 = jnp.floor(py)
    iz0 = jnp.floor(pz)
    fx = (px - ix0).astype(box.dtype)
    fy = (py - iy0).astype(box.dtype)
    fz = (pz - iz0).astype(box.dtype)
    ix0 = ix0.astype(jnp.int32) % nx
    iy0 = iy0.astype(jnp.int32) % ny
    iz0 = iz0.astype(jnp.int32) % nz
    ix1 = (ix0 + 1) % nx
    iy1 = (iy0 + 1) % ny
    iz1 = (iz0 + 1) % nz

    out = 0.0
    for xi, wx in ((ix0, 1.0 - fx), (ix1, fx)):
        for yi, wy in ((iy0, 1.0 - fy), (iy1, fy)):
            for zi, wz in ((iz0, 1.0 - fz), (iz1, fz)):
                out = out + box[xi, yi, zi] * wx * wy * wz
    return out
