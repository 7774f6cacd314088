"""Mesh-sharded perturbed-field step: slab-local CIC deposit with ppermute
halo exchange (the multi-chip equivalent of models/perturb.py).

Decomposition: hires "particles" (one per hires cell) live on x-slabs; each
shard deposits its particles into a margin-extended local lowres buffer, then
the margins ride `ppermute` to the neighboring shards (periodic in x via the
modular permutation).  The margin is sized on the host from the actual maximum
x-displacement, so no particle ever scatters beyond one neighbor.

Reference equivalents: PerturbedField.c:389-496 (move + deposit),
compute_perturbed_velocities:284-388 (k-space velocities, here with the
distributed FFT from parallel/pfft.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..cosmology.constants import FRACT_FLOAT_ERR
from . import pfft
from .mesh import GRID_AXIS

__all__ = ["build_sharded_lowres_ics", "build_sharded_perturb"]


def build_sharded_lowres_ics(mesh, hi_shape, lo_shape, box_lens, use_2lpt=False,
                             with_vcb=False):
    """Sharded GRF + lowres density + lowres displacement fields.

    Returns jitted fn(white, ln_k, sqrtp) -> (hires_density, lowres_density,
    psi_x, psi_y, psi_z[, psi2_x, psi2_y, psi2_z]), x-slab sharded
    (hires_density at the hires resolution; the rest at lowres).  Matches the
    single-device `_filtered_sample` + `_gradient_field` pipeline: tophat
    filter at the lowres cell scale (when DIM != HII_DIM), strided subsample.

    With `use_2lpt` the Scoccimarro 1998 App. D second-order displacement is
    computed through the distributed FFT (models/ics.py:_compute_2lpt on-mesh:
    six phi_ij transforms, the real-space source product, one forward FFT and
    three gradients — all slab-local with all_to_all transposes in pfft).

    With `with_vcb` the returned fn takes two extra (replicated) table args
    `(ln_k_v, ratio_v)` from `models.ics.vcb_ratio_table` and appends the
    lowres |v_cb| box [km/s] to the outputs — the same
    d_k * i k_i/k * sqrt(P_vcb/P_m) realization per component as
    `models.ics.compute_vcb_box` (reference InitialConditions.c:141-239),
    through the distributed FFT.
    """
    from ..cosmology.constants import physconst
    from ..ops import filters

    n_shards = mesh.devices.size
    nx, ny, nz = hi_shape
    n_tot = nx * ny * nz
    volume = box_lens[0] * box_lens[1] * box_lens[2]
    amp_fac = np.float32(np.sqrt(n_tot / volume))
    do_filter = hi_shape[0] != lo_shape[0]
    smooth_R = physconst.l_factor * box_lens[0] / lo_shape[0]
    ratio = hi_shape[0] // lo_shape[0]
    if do_filter:
        assert (nx // n_shards) % ratio == 0, (
            "hires slab must contain whole subsampling strides"
        )

    def _subsample_local(x):
        if not do_filter:
            return x
        return x[::ratio, ::ratio, ::ratio]

    def per_shard(white, ln_k, sqrtp, ln_k_v=None, ratio_v=None):
        d_k = pfft.rfft3(white)
        kx, ky, kz = pfft.local_k_axes(hi_shape, box_lens, n_shards)
        kmag = jnp.sqrt(
            kx[:, None, None] ** 2 + ky[None, :, None] ** 2 + kz[None, None, :] ** 2
        )
        lnk = jnp.log(jnp.where(kmag > 0, kmag, 1.0))
        from ..ops.grids import uniform_lerp

        x0 = ln_k[0]
        inv_dx = (ln_k.shape[0] - 1) / (ln_k[-1] - ln_k[0])
        amp = jnp.where(kmag > 0, uniform_lerp(lnk, x0, inv_dx, sqrtp), 0.0) * amp_fac
        d_k = d_k * amp
        hires_density = pfft.irfft3(d_k, nz)
        ksq = kmag * kmag
        ksq_safe = jnp.where(ksq > 0, ksq, 1.0)
        kmag_safe = jnp.sqrt(ksq_safe)

        vcb = None
        if with_vcb:
            # |v_cb| from the same realization (models/ics.compute_vcb_box
            # through the distributed FFT; reference InitialConditions.c:141)
            xv0 = ln_k_v[0]
            inv_dxv = (ln_k_v.shape[0] - 1) / (ln_k_v[-1] - ln_k_v[0])
            ramp = jnp.where(
                kmag > 0, uniform_lerp(lnk, xv0, inv_dxv, ratio_v), 0.0
            )
            v2 = None
            for kvec in (kx[:, None, None], ky[None, :, None], kz[None, None, :]):
                g = d_k * (1j * kvec / kmag_safe) * ramp
                if do_filter:
                    g = filters.filter_kbox(g, kmag, filters.TOPHAT, smooth_R)
                comp = _subsample_local(pfft.irfft3(g, nz))
                v2 = comp * comp if v2 is None else v2 + comp * comp
            vcb = jnp.sqrt(v2)

        d_k_f = (
            filters.filter_kbox(d_k, kmag, filters.TOPHAT, smooth_R)
            if do_filter
            else d_k
        )
        density = _subsample_local(pfft.irfft3(d_k_f, nz))

        def grad(kvec):
            g = jnp.where(ksq > 0, d_k_f * (1j * kvec / ksq_safe), 0.0)
            return _subsample_local(pfft.irfft3(g, nz))

        psi_x = grad(kx[:, None, None])
        psi_y = grad(ky[None, :, None])
        psi_z = grad(kz[None, None, :])
        if not use_2lpt:
            out = (hires_density, density, psi_x, psi_y, psi_z)
            return out + (vcb,) if with_vcb else out

        # --- 2LPT source: lap(phi2) = sum_{i<j} phi_ii phi_jj - phi_ij^2 ---
        # phi_ij from the UNFILTERED field; the lowres-cell smoothing is
        # applied to the final gradient (matching _compute_2lpt +
        # _gradient_field ordering — filtering the input before squaring
        # would drop the small-scale contribution to the 2LPT source)
        kvecs = (kx[:, None, None], ky[None, :, None], kz[None, None, :])

        def phi_ij(i, j):
            return pfft.irfft3(
                jnp.where(ksq > 0, -d_k * kvecs[i] * kvecs[j] / ksq_safe, 0.0), nz
            )

        p_xx = phi_ij(0, 0)
        p_yy = phi_ij(1, 1)
        p_zz = phi_ij(2, 2)
        s2 = p_xx * p_yy + p_xx * p_zz + p_yy * p_zz
        del p_xx, p_yy, p_zz
        for i, j in ((0, 1), (0, 2), (1, 2)):
            od = phi_ij(i, j)
            s2 = s2 - od * od
            del od
        s2_k = pfft.rfft3(s2)

        def grad2(kvec):
            g = jnp.where(ksq > 0, s2_k * (1j * kvec / ksq_safe), 0.0)
            if do_filter:
                g = filters.filter_kbox(g, kmag, filters.TOPHAT, smooth_R)
            return _subsample_local(pfft.irfft3(g, nz))

        psi2_x = grad2(kvecs[0])
        psi2_y = grad2(kvecs[1])
        psi2_z = grad2(kvecs[2])
        out = (hires_density, density, psi_x, psi_y, psi_z, psi2_x, psi2_y, psi2_z)
        return out + (vcb,) if with_vcb else out

    n_out = (8 if use_2lpt else 5) + (1 if with_vcb else 0)
    n_in = 5 if with_vcb else 3
    if not with_vcb:
        fn = lambda white, ln_k, sqrtp: per_shard(white, ln_k, sqrtp)  # noqa: E731
    else:
        fn = per_shard
    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(GRID_AXIS, None, None),) + (P(),) * (n_in - 1),
        out_specs=(P(GRID_AXIS, None, None),) * n_out,
    )
    return jax.jit(sharded)


def _cic_scatter_buffer(buf, px_b, py, pz, mass, n_buf_x, ny, nz):
    """8-corner CIC into a flattened margin-extended buffer: x clamped into
    the buffer (no wrap — margins handle the overflow), y/z periodic."""
    x0 = jnp.floor(px_b)
    y0 = jnp.floor(py)
    z0 = jnp.floor(pz)
    fx = px_b - x0
    fy = py - y0
    fz = pz - z0
    ix0 = jnp.clip(x0.astype(jnp.int32), 0, n_buf_x - 2)
    iy0 = y0.astype(jnp.int32) % ny
    iz0 = z0.astype(jnp.int32) % nz
    for dx in (0, 1):
        wx = (1.0 - fx) if dx == 0 else fx
        ix = ix0 + dx
        for dy in (0, 1):
            wy = (1.0 - fy) if dy == 0 else fy
            iy = (iy0 + dy) % ny
            for dz in (0, 1):
                wz = (1.0 - fz) if dz == 0 else fz
                iz = (iz0 + dz) % nz
                idx = (ix * ny + iy) * nz + iz
                buf = buf.at[idx.reshape(-1)].add(
                    (mass * wx * wy * wz).reshape(-1)
                )
    return buf


def build_sharded_perturb(mesh, hi_shape, lo_shape, box_lens, margin: int,
                          use_2lpt=False):
    """Return jitted fn(hires_density, psi_x, psi_y, psi_z, [psi2_x, psi2_y,
    psi2_z,] d_init, fac_za, [fac_2lpt,] mass_factor, dDdt_over_D) ->
    (delta, v_z), x-slab sharded at lowres.

    `psi_*` are the lowres displacement slabs from build_sharded_lowres_ics;
    `margin` must bound the maximum |x displacement| in lowres cells (host
    computes it from max|psi_x| * fac_za (+ |psi2_x| * fac_2lpt) * HII/BOX
    + padding).
    """
    n_shards = mesh.devices.size
    nx_h, ny_h, nz_h = hi_shape
    nx_l, ny_l, nz_l = lo_shape
    nxh_loc = nx_h // n_shards
    nxl_loc = nx_l // n_shards
    assert margin <= nxl_loc, "displacement margin exceeds the slab width"
    ratio = nx_h / nx_l
    n_buf_x = nxl_loc + 2 * margin
    perm_to_left = [(s, (s - 1) % n_shards) for s in range(n_shards)]
    perm_to_right = [(s, (s + 1) % n_shards) for s in range(n_shards)]

    # hires index -> lowres (pt) grid index for displacement gathers
    map_loc = ((np.arange(nxh_loc) * (nx_l / nx_h) + 0.5).astype(np.int32))
    needs_next = map_loc.max() >= nxl_loc  # gather may touch neighbor's 1st row
    map_y = ((np.arange(ny_h) * (ny_l / ny_h) + 0.5).astype(np.int32)) % ny_l
    map_z = ((np.arange(nz_h) * (nz_l / nz_h) + 0.5).astype(np.int32)) % nz_l

    def per_shard(hires_density, psi_x, psi_y, psi_z, psi2_x, psi2_y, psi2_z,
                  d_init, fac_za, fac_2lpt, mass_factor, dDdt_over_D):
        sid = jax.lax.axis_index(GRID_AXIS)
        x0_glob_l = sid * nxl_loc  # this shard's first lowres row
        # extend the displacement slabs with 1 row from the right neighbor
        def extend(v):
            if not needs_next:
                return v
            first = v[:1]
            recv = jax.lax.ppermute(first, GRID_AXIS, perm_to_left)
            return jnp.concatenate([v, recv], axis=0)

        vx = extend(psi_x)
        vy = extend(psi_y)
        vz = extend(psi_z)

        ix_l = jnp.asarray(map_loc)  # local lowres row per hires row
        iy_l = jnp.asarray(map_y)
        iz_l = jnp.asarray(map_z)
        disp = jnp.float32(fac_za)
        sx = disp * nx_l / box_lens[0]
        sy = disp * ny_l / box_lens[1]
        sz = disp * nz_l / box_lens[2]

        def g(v):
            return v[ix_l][:, iy_l][:, :, iz_l]

        ix_glob_h = sid * nxh_loc + jnp.arange(nxh_loc, dtype=jnp.float32)
        px = ix_glob_h[:, None, None] * jnp.float32(1.0 / ratio) + g(vx) * sx
        py = (
            jnp.arange(ny_h, dtype=jnp.float32)[None, :, None]
            * jnp.float32(ny_l / ny_h)
            + g(vy) * sy
        )
        pz = (
            jnp.arange(nz_h, dtype=jnp.float32)[None, None, :]
            * jnp.float32(nz_l / nz_h)
            + g(vz) * sz
        )
        if use_2lpt:
            # SUBTRACTED, matching _displace_and_deposit (fac_2lpt carries the
            # -3/7 D^2 factor; net displacement is +3/7 D^2 psi2)
            disp2 = jnp.float32(fac_2lpt)
            px = px - g(extend(psi2_x)) * (disp2 * nx_l / box_lens[0])
            py = py - g(extend(psi2_y)) * (disp2 * ny_l / box_lens[1])
            pz = pz - g(extend(psi2_z)) * (disp2 * nz_l / box_lens[2])
        mass = 1.0 + hires_density * d_init
        # into buffer coordinates (buffer row b == global row x0_glob_l - m + b)
        px_b = px - jnp.float32(x0_glob_l) + jnp.float32(margin)

        buf = jnp.zeros(n_buf_x * ny_l * nz_l, jnp.float32)
        buf = _cic_scatter_buffer(buf, px_b, py, pz, mass, n_buf_x, ny_l, nz_l)
        buf = buf.reshape(n_buf_x, ny_l, nz_l)

        # halo exchange: my left margin belongs to the left neighbor's tail,
        # my right margin to the right neighbor's head
        left = buf[:margin]
        right = buf[margin + nxl_loc:]
        from_right = jax.lax.ppermute(left, GRID_AXIS, perm_to_left)
        from_left = jax.lax.ppermute(right, GRID_AXIS, perm_to_right)
        interior = buf[margin: margin + nxl_loc]
        interior = interior.at[nxl_loc - margin:].add(from_right)
        interior = interior.at[:margin].add(from_left)

        delta = interior * mass_factor - 1.0
        # velocities via the distributed FFT (kz is the unsharded axis)
        d_k = pfft.rfft3(delta)
        kx, ky, kz = pfft.local_k_axes(lo_shape, box_lens, n_shards)
        ksq = (
            kx[:, None, None] ** 2 + ky[None, :, None] ** 2 + kz[None, None, :] ** 2
        )
        ksq_safe = jnp.where(ksq > 0, ksq, 1.0)
        v_k = jnp.where(
            ksq > 0, d_k * (1j * kz[None, None, :] * dDdt_over_D / ksq_safe), 0.0
        )
        v_z = pfft.irfft3(v_k, nz_l)
        delta = jnp.maximum(delta, -1.0 + FRACT_FLOAT_ERR)
        return delta, v_z

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            (P(GRID_AXIS, None, None),) * 7 + (P(), P(), P(), P(), P())
        ),
        out_specs=(P(GRID_AXIS, None, None), P(GRID_AXIS, None, None)),
    )
    return jax.jit(sharded)
