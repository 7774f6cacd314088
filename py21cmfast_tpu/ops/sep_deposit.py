"""Staged factored CIC deposit — bounded-memory execution of ops.deposit.

Same arithmetic as `ops.deposit.factored_cic_deposit` (per-axis hat
factorization over channel grids, offsets u in [-S, S+1]^3, exact scatter for
out-of-support cells; see that module's docstring and map_mass.c:146-210), but
executed as a sequence of small jitted dispatches so the XLA TPU scheduler
cannot keep all (2S+2)^3 = 64 roll/pad temporaries live at once.  The
single-graph form OOMs at HII_DIM=256 on v5e with 20.5 GB of HLO temps
(scripts/r3_perturb_probe.py); this staging caps peak HBM at
hires + R^2 lowres grids + O(10) temps.

Important non-separability note: the CIC weight w = wx(c)wy(c)wz(c) has every
factor depending on the FULL source cell c (the displacement d(c) is a 3-vector
field), so the z-channel contraction cannot be rolled into an output-indexed
field before the y/x weights are applied.  All intermediates here stay
c-indexed; only the final per-(ux,uy,uz) term is rolled:

  stage A (per uz):      T[rx,ry][c] = sum_rz chan[rx,ry,rz][c] * wz(c; rz,uz)
  stage B (per uz):      acc += sum_{uy,ux} roll( sum_rx wx * sum_ry wy * T,
                                                  (ux,uy,uz) )
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import cic
from .deposit import _hat, _rho

__all__ = ["staged_factored_deposit"]


def _chan_slice(m, rx, ry, rz, ratio):
    """chan[r'][c] = m[R*c + r' - R//2] per axis, built from a strided slice
    plus a +1 lowres roll for negative centred shifts (ops.deposit._chan)."""
    starts = []
    roll_axes = []
    for ax, rp in enumerate((rx, ry, rz)):
        s = rp - ratio // 2
        starts.append(s if s >= 0 else ratio + s)
        if s < 0:
            roll_axes.append(ax)
    c = m[starts[0] :: ratio, starts[1] :: ratio, starts[2] :: ratio]
    if roll_axes:
        c = jnp.roll(c, (1,) * len(roll_axes), tuple(roll_axes))
    return c


@partial(jax.jit, static_argnames=("uz", "ratio", "support", "use_ok"))
def _stage_t(hires, d_init, dz, ok, *, uz, ratio, support, use_ok):
    """T[rx,ry][c] = sum_rz chan[rx,ry,rz][c] * hat(dz+rho_rz-uz) [* ok]."""
    R = ratio
    rho = _rho(R)
    m = 1.0 + hires * d_init
    wzs = [_hat(dz + (rho[rz] - uz)) for rz in range(R)]
    if use_ok:
        wzs = [w * ok for w in wzs]
    return jnp.stack(
        [
            sum(_chan_slice(m, rx, ry, rz, R) * wzs[rz] for rz in range(R))
            for rx in range(R)
            for ry in range(R)
        ]
    )


@partial(jax.jit, static_argnames=("uz", "ratio", "support"), donate_argnums=(0,))
def _stage_xy(acc, t, dy, dx, *, uz, ratio, support):
    """acc += sum_{uy,ux} roll(sum_rx wx sum_ry wy T[rx,ry], (ux,uy,uz))."""
    R, S = ratio, support
    rho = _rho(R)
    for uy in range(-S, S + 2):
        wys = [_hat(dy + (rho[ry] - uy)) for ry in range(R)]
        u_ = [
            sum(t[rx * R + ry] * wys[ry] for ry in range(R)) for rx in range(R)
        ]
        for ux in range(-S, S + 2):
            wxs = [_hat(dx + (rho[rx] - ux)) for rx in range(R)]
            v = sum(u_[rx] * wxs[rx] for rx in range(R))
            acc = acc + jnp.roll(v, (ux, uy, uz), (0, 1, 2))
    return acc


@partial(jax.jit, static_argnames=("ratio", "cap", "lo_shape"))
def _outlier_scatter(acc, hires, d_init, d, bad, *, ratio, cap, lo_shape):
    """Exact CIC scatter for the rare out-of-support cells (ops.deposit)."""
    R = ratio
    rho = _rho(R)
    m = 1.0 + hires * d_init
    idx = jnp.argwhere(bad, size=cap, fill_value=-1)  # (cap, 3)
    valid = idx[:, 0] >= 0
    cx, cy, cz = idx[:, 0], idx[:, 1], idx[:, 2]
    dxg = d[0][cx, cy, cz]
    dyg = d[1][cx, cy, cz]
    dzg = d[2][cx, cy, cz]
    acc_flat = acc.reshape(-1)
    for rx in range(R):
        for ry in range(R):
            for rz in range(R):
                mass = jnp.where(
                    valid, _chan_slice(m, rx, ry, rz, R)[cx, cy, cz], 0.0
                )
                px = cx.astype(jnp.float32) + dxg + rho[rx]
                py = cy.astype(jnp.float32) + dyg + rho[ry]
                pz = cz.astype(jnp.float32) + dzg + rho[rz]
                acc_flat = cic.cic_scatter_flat(
                    acc_flat, px, py, pz, mass, lo_shape
                )
    return acc_flat.reshape(lo_shape)


@partial(jax.jit, static_argnames=("ratio", "support"))
def _bad_mask(d, *, ratio, support):
    rho = _rho(ratio)
    S = support
    bad = None
    for a in range(3):
        b = (d[a] + rho[0] < -S) | (d[a] + rho[-1] >= S + 1)
        bad = b if bad is None else (bad | b)
    return bad


def staged_factored_deposit(
    hires_density,
    psi,
    psi2,
    d_init,
    fac_za,
    fac_2lpt,
    disp_to_cells,
    *,
    ratio: int,
    support: int,
    cap: int,
    lo_shape,
):
    """Drop-in equivalent of ops.deposit.factored_cic_deposit (same signature,
    same result up to float addition order), executed as 2*(2S+2) bounded
    dispatches.  Peak live HBM: hires + T stack (R^2 lowres grids) + temps."""
    R, S = ratio, support

    @jax.jit
    def _d_fields(psi, psi2):
        out = []
        for a in range(3):
            da = psi[a] * (fac_za * disp_to_cells[a])
            if psi2 is not None:
                da = da - psi2[a] * (fac_2lpt * disp_to_cells[a])
            out.append(da)
        return tuple(out)

    d = _d_fields(psi, psi2)
    if cap > 0:
        bad = _bad_mask(d, ratio=R, support=S)
        ok = (~bad).astype(jnp.float32)
    else:
        bad, ok = None, jnp.ones((), jnp.float32)

    acc = jnp.zeros(tuple(lo_shape), jnp.float32)
    for uz in range(-S, S + 2):
        t = _stage_t(
            hires_density, d_init, d[2], ok,
            uz=uz, ratio=R, support=S, use_ok=cap > 0,
        )
        acc = _stage_xy(acc, t, d[1], d[0], uz=uz, ratio=R, support=S)
        del t

    if cap > 0:
        acc = _outlier_scatter(
            acc, hires_density, d_init, d, bad,
            ratio=R, cap=cap, lo_shape=tuple(lo_shape),
        )
    return acc
