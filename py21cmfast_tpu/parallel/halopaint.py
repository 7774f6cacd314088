"""Mesh-sharded halo painting: slab-local CIC of halo source properties with
ppermute ghost exchange (the multi-chip analog of HaloBox.c:518-561
`sum_halos_onto_grid`).

The catalog (host-side after the slab sampler's compaction,
parallel/sampler.py) is partitioned by owner x-slab; each shard converts its
halos' masses + property RNG to source quantities with the SAME per-halo
kernel as the single-device path (models/halobox._halo_props_kernel) INSIDE
the shard_map body, and CIC-scatters them into a margin-extended slab buffer;
the margins ride `ppermute` to the periodic neighbors exactly like the
perturb deposit (parallel/perturb.py).  A margin of 2 bounds the CIC stencil
(halos never move here — they are already at Eulerian positions).

With USE_MINI_HALOS the per-cell feedback turnover grids (LW + streaming +
reionization; models/halobox._mcrit_grids) are computed on the sharded
previous-snapshot fields, their x-margins are ppermute-exchanged, and each
halo CIC-reads its local Mturn pair before the property kernel — the sharded
equivalent of move_halo_galprops's grid reads (reference map_mass.c:412-414,
HaloBox.c:563-660).
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..inputs import InputParameters
from ..models import hmf
from ..models.halobox import _halo_props_kernel, _mcrit_grids, _scaling_consts_dict
from .mesh import GRID_AXIS
from .perturb import _cic_scatter_buffer

__all__ = ["sharded_halo_grids"]

_MARGIN = 2  # CIC stencil reach in cells; halos sit at Eulerian positions


def _cic_read_buffer(buf, px_b, py, pz, ny, nz):
    """8-corner CIC read from a margin-extended (n_buf_x, ny, nz) buffer:
    x is clamped into the buffer (margins cover the overflow), y/z periodic.
    Mirrors _cic_scatter_buffer's stencil."""
    n_buf_x = buf.shape[0]
    x0 = jnp.floor(px_b)
    y0 = jnp.floor(py)
    z0 = jnp.floor(pz)
    fx = px_b - x0
    fy = py - y0
    fz = pz - z0
    ix0 = jnp.clip(x0.astype(jnp.int32), 0, n_buf_x - 2)
    iy0 = y0.astype(jnp.int32) % ny
    iz0 = z0.astype(jnp.int32) % nz
    out = jnp.zeros_like(px_b)
    for dx in (0, 1):
        wx = (1.0 - fx) if dx == 0 else fx
        ix = ix0 + dx
        for dy in (0, 1):
            wy = (1.0 - fy) if dy == 0 else fy
            iy = (iy0 + dy) % ny
            for dz in (0, 1):
                wz = (1.0 - fz) if dz == 0 else fz
                iz = (iz0 + dz) % nz
                out = out + buf[ix, iy, iz] * (wx * wy * wz)
    return out


def sharded_halo_grids(
    redshift: float,
    inputs: InputParameters,
    pt_halos,
    mesh,
    previous_spin_temp=None,
    previous_ionized_box=None,
    lowres_vcb=None,
) -> SimpleNamespace:
    """Paint n_ion / sfr / wsfr / xray (+ sfr_mini / stars_mini with
    USE_MINI_HALOS) onto x-slab-sharded lowres grids.

    Returns a namespace quacking like HaloBox for the ionization and
    Ts/XraySourceBox drivers, all sharded on the mesh.
    """
    so = inputs.simulation_options
    ao = inputs.astro_options
    cosmo = inputs.cosmology
    use_mini = bool(ao.USE_MINI_HALOS)
    shape = so.lowres_shape
    nx, ny, nz = shape
    n_shards = mesh.devices.size
    nxl_loc = nx // n_shards
    cell = so.box_len / so.HII_DIM
    cell_vol = cell**3

    sc = hmf.set_scaling_constants(redshift, inputs)
    c = _scaling_consts_dict(sc, cosmo, redshift, ao)

    mt_a_grid = mt_m_grid = None
    l10_mt_a_ave = float(np.log10(sc.mturn_a_nofb))
    l10_mt_m_ave = float(np.log10(max(sc.mturn_m_nofb, 1.0)))
    if use_mini:
        # elementwise device kernel — sharding propagates from the inputs
        mt_a_grid, mt_m_grid = _mcrit_grids(
            redshift, inputs, sc, previous_spin_temp, previous_ionized_box,
            lowres_vcb,
        )
        l10_mt_a_ave = float(jnp.mean(mt_a_grid))
        l10_mt_m_ave = float(jnp.mean(mt_m_grid))

    # ---- host: owner-slab partition of the catalog ----
    masses = np.asarray(pt_halos.halo_masses)
    pos_cells = np.asarray(pt_halos.halo_coords) / cell
    rngs = [
        np.asarray(pt_halos.star_rng),
        np.asarray(pt_halos.sfr_rng),
        np.asarray(pt_halos.xray_rng),
    ]

    owner = (pos_cells[:, 0].astype(np.int64) % nx) // nxl_loc
    owner = np.clip(owner, 0, n_shards - 1)
    counts = np.bincount(owner, minlength=n_shards)
    n_max = max(int(counts.max()), 1)
    pos_p = np.zeros((n_shards, n_max, 3), np.float32)
    mass_p = np.ones((n_shards, n_max), np.float32)  # 1: keep the kernel finite
    rng_p = np.zeros((n_shards, 3, n_max), np.float32)
    mask_p = np.zeros((n_shards, n_max), np.float32)
    for s in range(n_shards):
        sel = owner == s
        k = int(counts[s])
        pos_p[s, :k] = pos_cells[sel]
        mass_p[s, :k] = masses[sel]
        mask_p[s, :k] = 1.0
        for i in range(3):
            rng_p[s, i, :k] = rngs[i][sel]

    sharding = NamedSharding(mesh, P(GRID_AXIS))
    pos_d = jax.device_put(jnp.asarray(pos_p), sharding)
    mass_d = jax.device_put(jnp.asarray(mass_p), sharding)
    rng_d = jax.device_put(jnp.asarray(rng_p), sharding)
    mask_d = jax.device_put(jnp.asarray(mask_p), sharding)

    m = _MARGIN
    n_buf_x = nxl_loc + 2 * m
    perm_to_left = [(s, (s - 1) % n_shards) for s in range(n_shards)]
    perm_to_right = [(s, (s + 1) % n_shards) for s in range(n_shards)]
    n_fields = 6 if use_mini else 4
    use_upper = ao.USE_UPPER_STELLAR_TURNOVER and sc.alpha_star > sc.alpha_upper

    def _with_margins(slab):
        """(nxl_loc, ny, nz) slab -> (n_buf_x, ny, nz) with neighbor ghosts."""
        left = slab[:m]
        right = slab[nxl_loc - m:]
        from_left = jax.lax.ppermute(right, GRID_AXIS, perm_to_right)
        from_right = jax.lax.ppermute(left, GRID_AXIS, perm_to_left)
        return jnp.concatenate([from_left, slab, from_right], axis=0)

    def per_shard(pos, mass, rng, mask, mt_a, mt_m):
        pos, mass, rng, mask = pos[0], mass[0], rng[0], mask[0]
        sid = jax.lax.axis_index(GRID_AXIS)
        px_b = (pos[:, 0] % nx) - sid * nxl_loc + m

        if use_mini:
            mt_a_buf = _with_margins(mt_a)
            mt_m_buf = _with_margins(mt_m)
            halo_mt_a = 10.0 ** _cic_read_buffer(
                mt_a_buf, px_b, pos[:, 1], pos[:, 2], ny, nz
            )
            halo_mt_m = 10.0 ** _cic_read_buffer(
                mt_m_buf, px_b, pos[:, 1], pos[:, 2], ny, nz
            )
        else:
            halo_mt_a = jnp.full_like(mass, jnp.float32(sc.mturn_a_nofb))
            halo_mt_m = jnp.full_like(mass, jnp.float32(max(sc.mturn_m_nofb, 1.0)))

        props = _halo_props_kernel(
            mass, rng[0], rng[1], rng[2], halo_mt_a, halo_mt_m, c,
            use_upper=use_upper, use_mini=use_mini,
            use_metal_lx=bool(ao.USE_UPPER_STELLAR_TURNOVER),
        )
        fields = [props["n_ion"], props["sfr"], props["wsfr"], props["xray38"]]
        if use_mini:
            fields += [props["sfr_mini"], props["stellar_mini"]]

        outs = []
        for f in fields:
            # where, not multiply: the kernel may produce NaN/inf on the
            # padding entries (mass=1 sentinel) and NaN * 0 == NaN
            f = jnp.where(mask > 0, f, 0.0)
            buf = jnp.zeros(n_buf_x * ny * nz, jnp.float32)
            buf = _cic_scatter_buffer(
                buf, px_b, pos[:, 1], pos[:, 2], f, n_buf_x, ny, nz
            )
            buf = buf.reshape(n_buf_x, ny, nz)
            left = buf[:m]
            right = buf[m + nxl_loc:]
            from_right = jax.lax.ppermute(left, GRID_AXIS, perm_to_left)
            from_left = jax.lax.ppermute(right, GRID_AXIS, perm_to_right)
            interior = buf[m: m + nxl_loc]
            interior = interior.at[nxl_loc - m:].add(from_right)
            interior = interior.at[:m].add(from_left)
            outs.append(interior * jnp.float32(1.0 / cell_vol))
        return tuple(outs)

    grid_spec = P(GRID_AXIS, None, None)
    mt_specs = (grid_spec, grid_spec) if use_mini else (P(), P())
    mt_args = (
        (mt_a_grid, mt_m_grid)
        if use_mini
        else (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
    )
    paint = jax.jit(
        shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(GRID_AXIS), P(GRID_AXIS), P(GRID_AXIS), P(GRID_AXIS))
            + mt_specs,
            out_specs=tuple(grid_spec for _ in range(n_fields)),
        )
    )
    painted = paint(pos_d, mass_d, rng_d, mask_d, *mt_args)
    n_ion, sfr, wsfr, xray = painted[:4]
    return SimpleNamespace(
        redshift=np.float32(redshift),
        n_ion=n_ion,
        halo_sfr=sfr,
        whalo_sfr=wsfr,
        halo_xray=xray,
        halo_sfr_mini=painted[4] if use_mini else None,
        halo_stars_mini=painted[5] if use_mini else None,
        log10_Mcrit_ACG_ave=np.float32(l10_mt_a_ave),
        log10_Mcrit_MCG_ave=np.float32(l10_mt_m_ave),
    )
