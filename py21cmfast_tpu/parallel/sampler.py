"""Slab-decomposed stochastic halo sampling for the device mesh.

The CHMF sampler's per-cell draws are embarrassingly parallel, but its
compaction is a sequential prefix-sum scan (models/halos.py
_sample_cells_kernel) that cannot be shard_map'd.  The multi-chip design is
therefore *slab-parallel orchestration*: each device independently samples
the cells of its own x-slab (and evolves the progenitors of the halos that
live there) through the same single-device kernels, with per-slab threefry
streams; the slab catalogs are concatenated for the (cheap, deposit-bound)
gridding step.  On a multi-host pod each process runs only its local slabs.

This parallelizes the two dominant costs of the discrete-halo source models —
the per-cell inverse-CMF draws and the per-halo progenitor sampling — across
the mesh, with identical statistics to the single-device path (different
random streams; the conditional MF, stopping rules, and property RNG are the
same code).

Reference equivalent: the OpenMP thread partition of sample_halo_grids /
sample_halo_progenitors (Stochasticity.c:761-1114), lifted to devices.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..inputs import InputParameters
from ..outputs import HaloCatalog

__all__ = ["sample_halo_grid_slabs", "sample_progenitors_slabs", "determine_halo_catalog_slabs"]


def _slab_bounds(nx: int, n_slabs: int):
    base = nx // n_slabs
    rem = nx % n_slabs
    bounds = []
    x0 = 0
    for s in range(n_slabs):
        w = base + (1 if s < rem else 0)
        bounds.append((x0, x0 + w))
        x0 += w
    return bounds


def _concat_catalogs(redshift, parts, inputs):
    from ..models.halos import _property_rng

    masses = np.concatenate([np.asarray(p[0])[: int(p[2])] for p in parts])
    pos = np.concatenate([np.asarray(p[1])[: int(p[2])] for p in parts])
    valid = masses > 0
    masses, pos = masses[valid], pos[valid]
    n = len(masses)
    star_rng, sfr_rng, xray_rng = _property_rng(
        jax.random.fold_in(jax.random.PRNGKey(inputs.random_seed), 7991), n
    )
    return HaloCatalog(
        redshift=np.float32(redshift),
        halo_masses=jnp.asarray(masses, jnp.float32),
        halo_coords=jnp.asarray(pos, jnp.float32),
        star_rng=star_rng,
        sfr_rng=sfr_rng,
        xray_rng=xray_rng,
        n_halos=np.int32(n),
    )


def sample_halo_grid_slabs(
    redshift: float,
    inputs: InputParameters,
    lagrangian_delta,
    exclude_mask=None,
    key=None,
    devices=None,
) -> HaloCatalog:
    """Grid-conditioned sampling with one x-slab per device.

    Kernels for different slabs are dispatched back-to-back (jax dispatch is
    asynchronous), so on a real mesh they run concurrently, one per chip."""
    from ..models.halos import sample_halo_grid

    so = inputs.simulation_options
    if devices is None:
        devices = jax.devices()
    n_slabs = min(len(devices), so.HII_DIM)
    if key is None:
        key = jax.random.PRNGKey(inputs.random_seed + 17)

    delta = np.asarray(lagrangian_delta)
    excl = np.asarray(exclude_mask) if exclude_mask is not None else None
    parts = []
    for s, (x0, x1) in enumerate(_slab_bounds(so.HII_DIM, n_slabs)):
        dev = devices[s % len(devices)]
        slab = jax.device_put(jnp.asarray(delta[x0:x1]), dev)
        slab_excl = excl[x0:x1] if excl is not None else None
        m, p, tot = sample_halo_grid(
            redshift, inputs, slab,
            exclude_mask=slab_excl,
            key=jax.random.fold_in(key, s),
            grid_shape=(x1 - x0,) + tuple(so.lowres_shape[1:]),
            origin_cells=(x0, 0, 0),
        )
        parts.append((m, p, tot))
    return _concat_catalogs(redshift, parts, inputs)


def sample_progenitors_slabs(
    redshift: float,
    inputs: InputParameters,
    prev_cat: HaloCatalog,
    key=None,
    devices=None,
) -> HaloCatalog:
    """Progenitor sampling with the previous catalog partitioned by halo
    x-position into one slab per device (halos keep Lagrangian positions, so
    the partition is stable across the scroll)."""
    from ..models.halos import _sample_progenitors

    so = inputs.simulation_options
    if devices is None:
        devices = jax.devices()
    n_slabs = min(len(devices), so.HII_DIM)
    if key is None:
        key = jax.random.fold_in(
            jax.random.PRNGKey(inputs.random_seed), int(redshift * 100)
        )
    cell_len = so.box_len / so.HII_DIM

    n = int(prev_cat.n_halos)
    masses = np.asarray(prev_cat.halo_masses)[:n]
    pos = np.asarray(prev_cat.halo_coords)[:n]
    star = np.asarray(prev_cat.star_rng)[:n]
    sfr = np.asarray(prev_cat.sfr_rng)[:n]
    xray = np.asarray(prev_cat.xray_rng)[:n]

    bounds = _slab_bounds(so.HII_DIM, n_slabs)
    x_cells = pos[:, 0] / cell_len
    parts = []
    for s, (x0, x1) in enumerate(bounds):
        sel = (x_cells >= x0) & (x_cells < x1) if s < n_slabs - 1 else (x_cells >= x0)
        if s == 0:
            sel = sel | (x_cells < 0)
        if not sel.any():
            continue
        sub = HaloCatalog(
            redshift=prev_cat.redshift,
            halo_masses=jnp.asarray(masses[sel]),
            halo_coords=jnp.asarray(pos[sel]),
            star_rng=jnp.asarray(star[sel]),
            sfr_rng=jnp.asarray(sfr[sel]),
            xray_rng=jnp.asarray(xray[sel]),
            n_halos=np.int32(int(sel.sum())),
        )
        cat_s = _sample_progenitors(redshift, inputs, sub, jax.random.fold_in(key, s))
        parts.append(cat_s)

    if not parts:
        return prev_cat

    masses = np.concatenate(
        [np.asarray(c.halo_masses)[: int(c.n_halos)] for c in parts]
    )
    pos = np.concatenate([np.asarray(c.halo_coords)[: int(c.n_halos)] for c in parts])
    star = np.concatenate([np.asarray(c.star_rng)[: int(c.n_halos)] for c in parts])
    sfr = np.concatenate([np.asarray(c.sfr_rng)[: int(c.n_halos)] for c in parts])
    xray = np.concatenate([np.asarray(c.xray_rng)[: int(c.n_halos)] for c in parts])
    return HaloCatalog(
        redshift=np.float32(redshift),
        halo_masses=jnp.asarray(masses),
        halo_coords=jnp.asarray(pos),
        star_rng=jnp.asarray(star),
        sfr_rng=jnp.asarray(sfr),
        xray_rng=jnp.asarray(xray),
        n_halos=np.int32(len(masses)),
    )


def determine_halo_catalog_slabs(
    redshift: float,
    inputs: InputParameters,
    ics,
    previous_catalog: HaloCatalog | None = None,
    devices=None,
) -> HaloCatalog:
    """Slab-parallel equivalent of models.halos.determine_halo_catalog.

    The first snapshot's DexM pass stays global (its FFT scans are a different,
    already-batched kernel); the grid sampling below the cell mass and all
    subsequent progenitor scrolls run slab-parallel."""
    from ..models.halos import dexm_halo_grid, _property_rng

    so = inputs.simulation_options
    if previous_catalog is not None:
        return sample_progenitors_slabs(
            redshift, inputs, previous_catalog, devices=devices
        )

    key = jax.random.fold_in(
        jax.random.PRNGKey(inputs.random_seed), int(redshift * 100)
    )
    halo_grid, in_halo = dexm_halo_grid(redshift, inputs, ics)
    cell_hi = so.box_len / so.dim
    hg = np.asarray(halo_grid)
    idx = np.nonzero(hg)
    dexm_masses = hg[idx]
    rng = np.random.default_rng(inputs.random_seed + 3)
    dexm_pos = (
        np.stack(idx, axis=-1).astype(np.float64)
        + rng.uniform(size=(len(dexm_masses), 3))
    ) * cell_hi

    ratio = so.dim // so.HII_DIM if so.dim % so.HII_DIM == 0 else None
    if ratio:
        excl = np.asarray(in_halo).reshape(
            so.HII_DIM, ratio, so.HII_DIM, ratio, so.hii_d_para, ratio
        ).mean(axis=(1, 3, 5)) > 0.5
    else:
        excl = np.zeros(so.lowres_shape, bool)

    cat = sample_halo_grid_slabs(
        redshift, inputs, ics.lowres_density, exclude_mask=excl, key=key,
        devices=devices,
    )
    n_samp = int(cat.n_halos)
    masses = np.concatenate(
        [dexm_masses.astype(np.float32), np.asarray(cat.halo_masses)[:n_samp]]
    )
    pos = np.concatenate(
        [dexm_pos.astype(np.float32), np.asarray(cat.halo_coords)[:n_samp]]
    )
    n = len(masses)
    star_rng, sfr_rng, xray_rng = _property_rng(jax.random.fold_in(key, 99), n)
    return HaloCatalog(
        redshift=np.float32(redshift),
        halo_masses=jnp.asarray(masses),
        halo_coords=jnp.asarray(pos),
        star_rng=star_rng,
        sfr_rng=sfr_rng,
        xray_rng=xray_rng,
        n_halos=np.int32(n),
    )
