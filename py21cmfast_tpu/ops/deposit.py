"""Factored scatter-free CIC deposit (dense per-axis hats + rare-outlier scatter).

TPU-native replacement for the reference's particle deposit loop
(map_mass.c:146-210): the DIM^3 "particles" (one per hires cell, mass
1 + delta*D_init) move by the (2)LPT displacement read from the lowres
pt grid and deposit onto the lowres grid with CIC weights.

The XLA TPU scatter lowering serializes (sorted segment-sum, ~13 M
particles/s), so the deposit is computed densely.  Round 2 used a
per-integer-offset roll accumulation whose cost scaled as
(2S+2)^3 * R^3 per cell (R = DIM/HII_DIM); at the reference's headline
ratio R=4 that is ~16k flops/cell.  This factored form reduces it to
~3k flops/cell and one hires read per z-offset:

 * Channel decomposition: hires cell i = R*c + r.  With the centred
   residual dr = r - R*(2r>=R) in [-R/2, R/2), the particle's target is
   c + phi with phi_a = d_a(c) + rho_a, rho = dr/R in [-1/2, 1/2), and
   its mass lives at hires index R*c + dr.  Channel grids
   chan[r'] = m[R*c + r' - R//2] come from strided slices of the hires
   grid plus a cheap *lowres* static roll per axis with negative shift
   (never a hires roll, and never a reshape to (nx,R,ny,R,nz,R) — the
   TPU (8,128) tile padding on the size-R minor dims of that reshape
   inflates HBM 64x at R=2).
 * Per-axis hat fields W[a][r'][u] = max(0, 1-|phi_a - u|) factor the
   3-D CIC weight, and the (channel, offset) sum is contracted one axis
   at a time with everything STATIC (no lax.scan, no dynamic rolls —
   dynamic-shift rolls on TPU lower to lane-unaligned dynamic slices
   and were ~30x slower end to end):
       T[rx,ry][uz] = sum_rz chan[rx,ry,rz] * Wz[rz][uz]
       U[rx][uy,uz] = sum_ry T[rx,ry][uz]   * Wy[ry][uy]
       acc += roll(sum_rx U[rx][uy,uz] * Wx[rx][ux], (ux,uy,uz))
   Cost per lowres cell: R^3(2S+2) + R^2(2S+2)^2 + R(2S+2)^3 madds
   (~0.8k at R=4,S=1 vs ~16k for the round-2 rolled form).
 * Cells whose phi would fall outside the dense support [-S, S+1) are
   zeroed in the dense pass and deposited exactly through the classic
   scatter path using a fixed-capacity `argwhere` compaction sized from
   the measured outlier count (snapped to powers of two so the number
   of compiled variants stays small).

The result is bitwise-equivalent (up to float addition order) to
`cic.cic_scatter_flat` over all particles; `tests/test_components.py::
test_factored_deposit_matches_scatter` asserts it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import cic

__all__ = ["factored_cic_deposit", "deposit_plan", "displacement_stats"]


def _hat(x):
    return jnp.maximum(1.0 - jnp.abs(x), 0.0)


def _rho(ratio: int):
    """Centred sub-cell residuals rho[r'] = (r' - R//2)/R in [-1/2, 1/2)."""
    return [(rp - ratio // 2) / ratio for rp in range(ratio)]


@partial(jax.jit, static_argnames=("max_support",))
def displacement_stats(d_cells, max_support: int = 3):
    """Per-node outlier counts for supports S=1..max_support.

    `d_cells` = (dx, dy, dz) displacement fields in lowres-cell units (the
    same fields the deposit uses).  Returns (counts[S-1] for S in 1..max,
    max |d|).  A cell is an outlier at support S when any axis target
    fraction phi = d + rho leaves [-S, S+1)."""
    counts = []
    dmax = 0.0
    for s in range(1, max_support + 1):
        bad = None
        for d in d_cells:
            b = (d < -s + 0.5) | (d >= s + 0.5)  # conservative: rho in [-1/2,1/2)
            bad = b if bad is None else (bad | b)
        counts.append(jnp.sum(bad))
    for d in d_cells:
        dmax = jnp.maximum(dmax, jnp.max(jnp.abs(d)))
    return jnp.stack(counts), dmax


def deposit_plan(bad_counts, d_max: float, n_cells: int):
    """Pick (support, outlier capacity) from host-side displacement stats.

    Chooses the smallest support whose outlier fraction is <= 0.2% (each
    outlier cell costs R^3 scattered particles), then sizes the compaction
    capacity from the measured count with margin, snapped to a power of two
    (bounds the number of compiled variants)."""
    bad_counts = [int(b) for b in np.asarray(bad_counts)]
    support = None
    for s, n_bad in enumerate(bad_counts, start=1):
        if n_bad <= max(0.002 * n_cells, 64):
            support = s
            break
    if support is None:
        support = len(bad_counts)
    n_bad = bad_counts[support - 1]
    if n_bad == 0:  # the count is conservative (rho bounds), so 0 is safe
        return support, 0
    cap = 1 << int(np.ceil(np.log2(n_bad * 1.5 + 64)))
    return support, cap


@partial(jax.jit, static_argnames=("ratio", "support", "cap", "lo_shape"))
def factored_cic_deposit(
    hires_density,
    psi,  # (vx, vy, vz) pt-grid displacement fields [Mpc]
    psi2,  # 2LPT fields or None
    d_init,
    fac_za,
    fac_2lpt,
    disp_to_cells,  # (3,) lowres cells per Mpc
    *,
    ratio: int,
    support: int,
    cap: int,
    lo_shape,
):
    """Deposit 1 + delta onto the lowres periodic grid.  Returns the
    unnormalized accumulated mass (divide by ratio^3 for mean one), exactly
    as the particle scatter path would."""
    R = ratio
    S = support
    nx, ny, nz = lo_shape
    rho = _rho(R)
    rho_min, rho_max = rho[0], rho[-1]

    d = []
    for a in range(3):
        da = psi[a] * (fac_za * disp_to_cells[a])
        if psi2 is not None:
            da = da - psi2[a] * (fac_2lpt * disp_to_cells[a])
        d.append(da)

    # channel masses: chan[r'] = m[R*c + r' - R//2] from strided slices of
    # m = 1 + hires*d_init (elementwise op fuses into the slice) plus a
    # +1 lowres roll per axis whose centred shift s = r' - R//2 is negative:
    #   s >= 0: m[s::R][c] = m[R*c+s];  s < 0: roll(m[(R+s)::R], +1)[c].
    m = 1.0 + hires_density * d_init

    def _chan(rx, ry, rz):
        starts = []
        roll_axes = []
        for ax, rp in enumerate((rx, ry, rz)):
            s = rp - R // 2
            starts.append(s if s >= 0 else R + s)
            if s < 0:
                roll_axes.append(ax)
        c = m[starts[0] :: R, starts[1] :: R, starts[2] :: R]
        if roll_axes:
            c = jnp.roll(c, (1,) * len(roll_axes), tuple(roll_axes))
        return c

    if cap > 0:
        bad = None
        for a in range(3):
            b = (d[a] + rho_min < -S) | (d[a] + rho_max >= S + 1)
            bad = b if bad is None else (bad | b)
        ok = (~bad).astype(jnp.float32)
    else:
        ok = None

    offsets_1d = list(range(-S, S + 2))  # target offsets per axis

    # uz outermost keeps at most R^2 + R lowres intermediates live; the
    # repeated hat evaluations across iterations are identical
    # subexpressions XLA CSEs away.
    acc = jnp.zeros(lo_shape, jnp.float32)
    for uz in offsets_1d:
        wzs = [_hat(d[2] + (rho[rz] - uz)) for rz in range(R)]
        if ok is not None:
            wzs = [w * ok for w in wzs]
        # T[rx,ry]: contract the z channel axis (the only hires-sized pass)
        t = {
            (rx, ry): sum(_chan(rx, ry, rz) * wzs[rz] for rz in range(R))
            for rx in range(R)
            for ry in range(R)
        }
        for uy in offsets_1d:
            wys = [_hat(d[1] + (rho[ry] - uy)) for ry in range(R)]
            u_ = [
                sum(t[rx, ry] * wys[ry] for ry in range(R)) for rx in range(R)
            ]
            for ux in offsets_1d:
                wxs = [_hat(d[0] + (rho[rx] - ux)) for rx in range(R)]
                v = sum(u_[rx] * wxs[rx] for rx in range(R))
                acc = acc + jnp.roll(v, (ux, uy, uz), (0, 1, 2))

    if cap > 0:
        # exact scatter for the rare out-of-support cells
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
                        valid, _chan(rx, ry, rz)[cx, cy, cz], 0.0
                    )
                    px = cx.astype(jnp.float32) + dxg + rho[rx]
                    py = cy.astype(jnp.float32) + dyg + rho[ry]
                    pz = cz.astype(jnp.float32) + dzg + rho[rz]
                    acc_flat = cic.cic_scatter_flat(
                        acc_flat, px, py, pz, mass, lo_shape
                    )
        acc = acc_flat.reshape(lo_shape)
    return acc
