"""Mesh-sharded halo painting: slab-local CIC of halo source properties with
ppermute ghost exchange (the multi-chip analog of HaloBox.c:518-561
`sum_halos_onto_grid`).

The catalog (host-side after the slab sampler's compaction,
parallel/sampler.py) is partitioned by owner x-slab; each shard converts its
halos' masses + property RNG to source quantities with the SAME per-halo
kernel as the single-device path (models/halobox._halo_props_kernel) and
CIC-scatters them into a margin-extended slab buffer; the margins ride
`ppermute` to the periodic neighbors exactly like the perturb deposit
(parallel/perturb.py).  A margin of 2 bounds the CIC stencil (halos never
move here — they are already at Eulerian positions).

Scope (round 3): atomic-galaxy properties (no per-cell Mturn feedback grids —
USE_MINI_HALOOS raises); sub-sampler deterministic sources
(lagrangian_delta) are not added on the mesh path.
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
from ..models.halobox import _halo_props_kernel, _scaling_consts_dict
from .mesh import GRID_AXIS
from .perturb import _cic_scatter_buffer

__all__ = ["sharded_halo_grids"]

_MARGIN = 2  # CIC stencil reach in cells; halos sit at Eulerian positions


def sharded_halo_grids(
    redshift: float, inputs: InputParameters, pt_halos, mesh
) -> SimpleNamespace:
    """Paint n_ion / sfr / wsfr / xray onto x-slab-sharded lowres grids.

    Returns a namespace quacking like HaloBox for the ionization driver
    (n_ion, whalo_sfr, halo_sfr, halo_xray, count), all sharded on the mesh.
    """
    so = inputs.simulation_options
    ao = inputs.astro_options
    cosmo = inputs.cosmology
    if ao.USE_MINI_HALOS:
        raise NotImplementedError(
            "sharded halo painting currently covers the atomic-galaxy "
            "properties; minihalo feedback grids stay on the single-device "
            "path"
        )
    shape = so.lowres_shape
    nx, ny, nz = shape
    n_shards = mesh.devices.size
    nxl_loc = nx // n_shards
    cell = so.box_len / so.HII_DIM
    cell_vol = cell**3

    sc = hmf.set_scaling_constants(redshift, inputs)
    c = _scaling_consts_dict(sc, cosmo, redshift, ao)

    # ---- host: per-halo properties then owner-slab partition ----
    masses = np.asarray(pt_halos.halo_masses)
    pos_cells = np.asarray(pt_halos.halo_coords) / cell
    mt_a = np.full(len(masses), sc.mturn_a_nofb, np.float32)
    props = _halo_props_kernel(
        jnp.asarray(masses),
        pt_halos.star_rng,
        pt_halos.sfr_rng,
        pt_halos.xray_rng,
        jnp.asarray(mt_a),
        jnp.asarray(mt_a),
        c,
        use_upper=ao.USE_UPPER_STELLAR_TURNOVER and sc.alpha_star > sc.alpha_upper,
        use_mini=False,
    )
    fields = np.stack(
        [
            np.asarray(props["n_ion"]),
            np.asarray(props["sfr"]),
            np.asarray(props["wsfr"]),
            np.asarray(props["xray38"]),
        ]
    )  # (4, n_halos)

    owner = (pos_cells[:, 0].astype(np.int64) % nx) // nxl_loc
    owner = np.clip(owner, 0, n_shards - 1)
    counts = np.bincount(owner, minlength=n_shards)
    n_max = max(int(counts.max()), 1)
    pos_p = np.zeros((n_shards, n_max, 3), np.float32)
    fld_p = np.zeros((n_shards, 4, n_max), np.float32)
    for s in range(n_shards):
        sel = owner == s
        k = int(counts[s])
        pos_p[s, :k] = pos_cells[sel]
        fld_p[s, :, :k] = fields[:, sel]

    sharding = NamedSharding(mesh, P(GRID_AXIS))
    pos_d = jax.device_put(jnp.asarray(pos_p), sharding)
    fld_d = jax.device_put(jnp.asarray(fld_p), sharding)

    m = _MARGIN
    n_buf_x = nxl_loc + 2 * m
    perm_to_left = [(s, (s - 1) % n_shards) for s in range(n_shards)]
    perm_to_right = [(s, (s + 1) % n_shards) for s in range(n_shards)]

    def per_shard(pos, fld):
        pos, fld = pos[0], fld[0]  # drop the sharded leading axis
        sid = jax.lax.axis_index(GRID_AXIS)
        px_b = (pos[:, 0] % nx) - sid * nxl_loc + m
        outs = []
        for i in range(4):
            buf = jnp.zeros(n_buf_x * ny * nz, jnp.float32)
            buf = _cic_scatter_buffer(
                buf, px_b, pos[:, 1], pos[:, 2], fld[i], n_buf_x, ny, nz
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

    paint = jax.jit(
        shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(GRID_AXIS), P(GRID_AXIS)),
            out_specs=tuple(P(GRID_AXIS) for _ in range(4)),
        )
    )
    n_ion, sfr, wsfr, xray = paint(pos_d, fld_d)
    return SimpleNamespace(
        redshift=np.float32(redshift),
        n_ion=n_ion,
        halo_sfr=sfr,
        whalo_sfr=wsfr,
        halo_xray=xray,
        halo_sfr_mini=None,
        halo_stars_mini=None,
        log10_Mcrit_ACG_ave=np.float32(np.log10(sc.mturn_a_nofb)),
        log10_Mcrit_MCG_ave=np.float32(np.log10(max(sc.mturn_m_nofb, 1.0))),
    )
