"""Redshift-space distortions.

Behavioral equivalent of reference rsds.py:16-266: the velocity-gradient
correction to tau_21/brightness temperature, and the sub-cell CIC shift of
cells along the line of sight.  The LoS scatter is a vectorized 1D CIC
(`jnp .at[].add`), not a per-sightline Python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .cosmology.constants import physconst
from .inputs import InputParameters

__all__ = ["include_dvdr_in_tau21", "apply_rsds", "rsds_shift"]


def _hubble_of_z(inputs: InputParameters, redshifts):
    return np.asarray(inputs.cosmology.hubble(np.asarray(redshifts)))  # 1/s


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
    bt = np.asarray(brightness_temp)
    vel = np.asarray(los_velocity)  # comoving Mpc/s
    n_los = bt.shape[-1]
    dx = inputs.simulation_options.box_len / inputs.simulation_options.HII_DIM

    if periodic:
        k_los = np.fft.rfftfreq(n_los, dx) * 2 * np.pi
        vel_grad = np.fft.irfft(1j * k_los * np.fft.rfft(vel, axis=-1), n=n_los, axis=-1)
    else:
        vel_grad = np.gradient(vel, dx, axis=-1, edge_order=2)

    H = _hubble_of_z(inputs, redshifts)
    # H in 1/s; vel_grad in (Mpc/s)/Mpc = 1/s

    if tau_21 is None:
        if inputs.astro_options.USE_TS_FLUCT:
            raise ValueError("tau_21 required when USE_TS_FLUCT is True")
        max_dvdr = inputs.astro_params.MAX_DVDR * H
        dvdx = np.clip(vel_grad, -max_dvdr, max_dvdr)
        return bt / np.abs(1.0 + dvdx / H)

    tau = np.asarray(tau_21, dtype=np.float64)
    grad_comp = np.abs(1.0 + vel_grad / H)
    with np.errstate(divide="ignore", invalid="ignore"):
        factor = (1.0 - np.exp(-tau / grad_comp)) / (1.0 - np.exp(-tau))
    factor = np.where(tau < 1e-10, 1.0, factor).astype(np.float32)
    return bt * factor


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
    field = np.asarray(field)
    vel = np.asarray(los_velocity)
    H = _hubble_of_z(inputs, redshifts)  # 1/s
    cell = inputs.simulation_options.box_len / inputs.simulation_options.HII_DIM
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
            rsds_shift(
                field[sl].T, disp_pix[sl].T,
                n_rsd_subcells=n_rsd_subcells, periodic=periodic,
            )
        ).T)
    shifted = np.concatenate(outs, axis=0)

    if shape3d:
        shifted = shifted.reshape(nx, ny, -1)
    return shifted
