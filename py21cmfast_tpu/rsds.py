"""Redshift-space distortions.

Behavioral equivalent of reference rsds.py:16-266: the velocity-gradient
correction to tau_21/brightness temperature, and the sub-cell CIC shift of
cells along the line of sight.  The LoS scatter is a vectorized 1D CIC
(`jnp .at[].add`), not a per-sightline Python loop.

Both entry points accept either host numpy (returns numpy) or jax device
arrays (stays on device): the lightcone driver assembles the full lightcone
in HBM and finalizes it there, so the only device->host transfer is the
finished product — round-tripping ~GB lightcones through the remote-TPU
tunnel for finalization costs minutes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .cosmology.constants import physconst
from .inputs import InputParameters

__all__ = ["include_dvdr_in_tau21", "apply_rsds", "rsds_shift"]


def _hubble_of_z(inputs: InputParameters, redshifts):
    return np.asarray(inputs.cosmology.hubble(np.asarray(redshifts)))  # 1/s


def _gradient_last_axis(arr, dx, periodic: bool):
    """np.gradient(edge_order=2) equivalent along the last axis, in jnp."""
    if periodic:
        n = arr.shape[-1]
        k = jnp.fft.rfftfreq(n, dx) * 2 * jnp.pi
        return jnp.fft.irfft(1j * k * jnp.fft.rfft(arr, axis=-1), n=n, axis=-1)
    interior = (arr[..., 2:] - arr[..., :-2]) / (2 * dx)
    lo = (-3 * arr[..., :1] + 4 * arr[..., 1:2] - arr[..., 2:3]) / (2 * dx)
    hi = (3 * arr[..., -1:] - 4 * arr[..., -2:-1] + arr[..., -3:-2]) / (2 * dx)
    return jnp.concatenate([lo, interior, hi], axis=-1)


@partial(jax.jit, static_argnames=("periodic", "use_tau"))
def _dvdr_kernel(bt, vel, H, tau, max_dvdr, *, periodic, use_tau, dx):
    vel_grad = _gradient_last_axis(vel, dx, periodic)
    if not use_tau:
        lim = max_dvdr * H
        dvdx = jnp.clip(vel_grad, -lim, lim)
        return bt / jnp.abs(1.0 + dvdx / H)
    grad_comp = jnp.abs(1.0 + vel_grad / H)
    # expm1 keeps the small-tau ratio well-conditioned in f32
    factor = jnp.expm1(-tau / grad_comp) / jnp.expm1(-tau)
    factor = jnp.where(tau < 1e-10, 1.0, factor).astype(jnp.float32)
    return bt * factor


def include_dvdr_in_tau21(
    brightness_temp,
    los_velocity,
    redshifts,
    inputs: InputParameters,
    periodic: bool,
    tau_21=None,
):
    """Velocity-gradient correction to the 21-cm optical depth / Tb.

    Without Ts: Tb -> Tb / |1 + dv/dr / H| (clipped at MAX_DVDR).
    With Ts: full (1-exp(-tau/grad))/(1-exp(-tau)) factor (rsds.py:83-104)."""
    dx = inputs.simulation_options.box_len / inputs.simulation_options.HII_DIM
    use_tau = tau_21 is not None
    if not use_tau and inputs.astro_options.USE_TS_FLUCT:
        raise ValueError("tau_21 required when USE_TS_FLUCT is True")

    if isinstance(brightness_temp, jax.Array):
        H = _hubble_of_z(inputs, redshifts).astype(np.float32)
        tau = tau_21 if use_tau else jnp.zeros((), jnp.float32)
        return _dvdr_kernel(
            brightness_temp, los_velocity, jnp.asarray(H), tau,
            jnp.float32(inputs.astro_params.MAX_DVDR),
            periodic=periodic, use_tau=use_tau, dx=float(dx),
        )

    # host path: f64 numpy, bit-identical to the pre-device implementation
    bt = np.asarray(brightness_temp)
    vel = np.asarray(los_velocity)  # comoving Mpc/s
    n_los = bt.shape[-1]
    if periodic:
        k_los = np.fft.rfftfreq(n_los, dx) * 2 * np.pi
        vel_grad = np.fft.irfft(
            1j * k_los * np.fft.rfft(vel, axis=-1), n=n_los, axis=-1
        )
    else:
        vel_grad = np.gradient(vel, dx, axis=-1, edge_order=2)
    H = _hubble_of_z(inputs, redshifts)

    if tau_21 is None:
        max_dvdr = inputs.astro_params.MAX_DVDR * H
        dvdx = np.clip(vel_grad, -max_dvdr, max_dvdr)
        return bt / np.abs(1.0 + dvdx / H)

    tau = np.asarray(tau_21, dtype=np.float64)
    grad_comp = np.abs(1.0 + vel_grad / H)
    with np.errstate(divide="ignore", invalid="ignore"):
        factor = (1.0 - np.exp(-tau / grad_comp)) / (1.0 - np.exp(-tau))
    factor = np.where(tau < 1e-10, 1.0, factor).astype(np.float32)
    return bt * factor


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("n_rsd_subcells", "periodic"))
def rsds_shift_jit(field, los_displacement_pix, n_rsd_subcells: int = 4,
                   periodic: bool = False):
    return rsds_shift(field, los_displacement_pix,
                      n_rsd_subcells=n_rsd_subcells, periodic=periodic)


def rsds_shift(field, los_displacement_pix, n_rsd_subcells: int = 4, periodic: bool = False):
    """Shift cells along the LoS by a (pixel-unit) displacement with sub-cell CIC.

    field, los_displacement_pix: shape (n_slices, n_coords).  Each cell is split
    into `n_rsd_subcells`, moved by the (linearly interpolated) displacement,
    and CIC-deposited back (reference rsds_shift:184-266).
    """
    field = jnp.asarray(field, jnp.float32)
    disp = jnp.asarray(los_displacement_pix, jnp.float32)
    n_slices, n_coords = field.shape
    n_sub = n_rsd_subcells
    n_fine = n_slices * n_sub

    # fine-grid positions (in coarse pixel units, cell centres)
    fine_centers = (jnp.arange(n_fine) + 0.5) / n_sub  # in [0, n_slices)

    # displacement at each fine cell: linear interp of the coarse (cell-centred) field
    coarse_centers = jnp.arange(n_slices) + 0.5
    if periodic:
        # pad one slice on each side with wrapped values
        cc = jnp.concatenate(
            [coarse_centers[:1] - 1.0, coarse_centers, coarse_centers[-1:] + 1.0]
        )
        dd = jnp.concatenate([disp[-1:], disp, disp[:1]], axis=0)
    else:
        cc = coarse_centers
        dd = disp
    disp_fine = jax.vmap(
        lambda col: jnp.interp(fine_centers, cc, col), in_axes=1, out_axes=1
    )(dd)

    fine_field = jnp.repeat(field, n_sub, axis=0) / n_sub
    new_pos = fine_centers[:, None] * n_sub + disp_fine * n_sub  # fine-pixel units
    new_pos = new_pos - 0.5  # CIC about fine-cell centres

    i0 = jnp.floor(new_pos)
    frac = new_pos - i0
    i0 = i0.astype(jnp.int32)
    i1 = i0 + 1
    if periodic:
        i0 = i0 % n_fine
        i1 = i1 % n_fine
    else:
        i0 = jnp.clip(i0, 0, n_fine - 1)
        i1 = jnp.clip(i1, 0, n_fine - 1)

    col = jnp.broadcast_to(jnp.arange(n_coords)[None, :], (n_fine, n_coords))
    out = jnp.zeros((n_fine, n_coords), jnp.float32)
    out = out.at[i0.ravel(), col.ravel()].add((fine_field * (1 - frac)).ravel())
    out = out.at[i1.ravel(), col.ravel()].add((fine_field * frac).ravel())

    # re-bin fine cells to coarse slices
    return out.reshape(n_slices, n_sub, n_coords).sum(axis=1)


@_partial(jax.jit, static_argnames=("n_sub", "periodic", "n_chunks"))
def _rsds_chunked(field2d, disp2d, *, n_sub, periodic, n_chunks):
    """Device RSD shift over (n_coords, n_slices), chunked along sightlines
    with lax.map so the fine-grid intermediates stay ~100 MB."""
    n_coords, n_slices = field2d.shape
    fc = field2d.reshape(n_chunks, n_coords // n_chunks, n_slices)
    dc = disp2d.reshape(n_chunks, n_coords // n_chunks, n_slices)

    def body(args):
        f, d = args
        return rsds_shift(f.T, d.T, n_rsd_subcells=n_sub, periodic=periodic).T

    out = jax.lax.map(body, (fc, dc))
    return out.reshape(n_coords, n_slices)


def apply_rsds(
    field,
    los_velocity,
    redshifts,
    inputs: InputParameters,
    periodic: bool,
    n_rsd_subcells: int = 4,
):
    """Apply RSDs to a (rectilinear or flattened-angular) field
    (reference apply_rsds:106-183)."""
    on_device = isinstance(field, jax.Array)
    H = _hubble_of_z(inputs, redshifts)  # 1/s
    cell = inputs.simulation_options.box_len / inputs.simulation_options.HII_DIM

    if on_device:
        vel = los_velocity
        disp_pix = vel / jnp.asarray((H * cell).astype(np.float32))
        shape3d = field.ndim == 3
        if shape3d:
            nx, ny = field.shape[0], field.shape[1]
            field2d = field.reshape(nx * ny, -1)
            disp2d = disp_pix.reshape(nx * ny, -1)
        else:
            field2d, disp2d = field, disp_pix
        n_coords, n_slices = field2d.shape
        # chunk so fine-grid intermediates stay ~<=128 MB
        target = max(1, int(2**25 // max(n_slices * n_rsd_subcells, 1)))
        n_chunks = 1
        while n_coords // n_chunks > target or n_coords % n_chunks:
            n_chunks += 1
            if n_chunks > n_coords:
                n_chunks = n_coords
                break
        shifted = _rsds_chunked(
            field2d, disp2d, n_sub=n_rsd_subcells, periodic=periodic,
            n_chunks=n_chunks,
        )
        return shifted.reshape(nx, ny, -1) if shape3d else shifted

    field = np.asarray(field)
    vel = np.asarray(los_velocity)
    disp_pix = vel / H / cell  # comoving Mpc / Mpc-per-pixel

    shape3d = field.ndim == 3
    if shape3d:
        nx, ny = field.shape[0], field.shape[1]
        field = field.reshape(nx * ny, -1)
        disp_pix = disp_pix.reshape(nx * ny, -1)

    # chunk over sightlines: each is independent, and the fine-grid
    # intermediates are n_rsd_subcells * n_slices * n_coords floats — a full
    # z=5.5-35 lightcone at 256^2 would need ~6 GB at once
    n_coords = field.shape[0]
    chunk = max(1, min(n_coords, int(2**25 // max(field.shape[1] * n_rsd_subcells, 1))))
    outs = []
    for c0 in range(0, n_coords, chunk):
        sl = slice(c0, c0 + chunk)
        outs.append(np.asarray(
            rsds_shift_jit(
                field[sl].T, disp_pix[sl].T,
                n_rsd_subcells=n_rsd_subcells, periodic=periodic,
            )
        ).T)
    shifted = np.concatenate(outs, axis=0)

    if shape3d:
        shifted = shifted.reshape(nx, ny, -1)
    return shifted
