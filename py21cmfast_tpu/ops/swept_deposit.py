"""Scatter-free CIC deposit: dense roll accumulation + rare-outlier scatter.

The XLA TPU scatter lowering serializes (sorted segment-sum), making the
classic per-particle `.at[].add` deposit the most expensive stage of a node
(~10 s at DIM=512 -> 256^3 on one v5e).  This module computes the SAME deposit
EXACTLY with dense vector work:

 * the DIM^3 "particles" are grouped into their R^3 = (DIM/HII_DIM)^3
   sub-cell channels per lowres cell (the particles of one cell); each
   channel reads its displacement from the same pt-grid cell the particle
   loop would (the staggered resample map int(i/R + 0.5) becomes a
   per-channel unit shift of the displacement grid);
 * for every integer target offset u in [-S, S+1]^3 the contribution of all
   cells to their (cell + u) neighbor is an ELEMENTWISE product of per-axis
   CIC hats, accumulated with `jnp.roll` — no scatter, no sort;
 * S is a host-chosen quantile bound on the displacement (typically 1-3
   cells); the rare cells whose displacement exceeds it are zeroed in the
   dense pass and deposited exactly through the classic scatter path using a
   fixed-capacity compaction (`jnp.argwhere(size=...)`).

The result is bitwise-equivalent (up to float addition order) to
`cic_scatter_flat` over all particles; `tests/test_components.py::
test_rolled_deposit_matches_scatter` asserts it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import cic

__all__ = ["rolled_cic_deposit", "deposit_plan"]


def _hat(x):
    return jnp.maximum(1.0 - jnp.abs(x), 0.0)


def deposit_plan(max_disp_cells: float, typ_disp_cells: float, n_cells: int):
    """Pick (support, outlier capacity) from host-side displacement stats.

    `typ_disp_cells` should be a high quantile (99.9%) of |d| per axis;
    `max_disp_cells` the absolute max.  The support covers the quantile; the
    capacity covers everything beyond it with ample margin (measured: a loose
    99% support with a large outlier batch is SLOWER — the compaction gathers
    and scatters outweigh the saved dense offsets), rounded so the number of
    compiled variants stays small."""
    support = max(1, int(np.ceil(typ_disp_cells)))
    if max_disp_cells <= support:
        return support, 0
    frac_out = 0.004  # ~2x margin over the 0.1% beyond the 99.9% quantile
    cap = int(frac_out * n_cells) + 1024
    cap = 1 << int(np.ceil(np.log2(cap)))
    return support, cap


@partial(jax.jit, static_argnames=("ratio", "support", "cap", "lo_shape"))
def rolled_cic_deposit(
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
    as the scatter path would."""
    R = ratio
    nx, ny, nz = lo_shape
    S = support

    def disp_axis(a):
        d = psi[a] * (fac_za * disp_to_cells[a])
        if psi2 is not None:
            d = d - psi2[a] * (fac_2lpt * disp_to_cells[a])
        return d

    d = [disp_axis(a) for a in range(3)]

    m_h = 1.0 + hires_density * d_init
    # channel views via strided slices: a (nx,R,ny,R,nz,R) reshape would pad
    # the minor size-R dims to full TPU tiles (64x memory at R=2)
    m_chan = {}

    def chan(r):
        # resample read: int((R c + r)/R + 0.5) = c + (2r >= R)
        return 1 if 2 * r >= R else 0

    # Per-channel axis target fractions, source-aligned.  The pt-grid read
    # location of a particle shifts by e = (2r >= R) in EVERY axis (the
    # resample map uses the full 3-D hires index), so each channel reads a
    # 3-D-rolled copy of each displacement component.
    chans = [
        (rx, ry, rz) for rx in range(R) for ry in range(R) for rz in range(R)
    ]
    for c3 in chans:
        rx, ry, rz = c3
        m_chan[c3] = m_h[rx::R, ry::R, rz::R]

    def chan_frac(c3, a):
        """Axis-a target fraction of channel c3 (e-shifted displacement read
        + sub-cell offset), built transiently — nothing retains the 8x3
        fraction fields (at 512^3 they would be ~13 GB)."""
        shift = tuple(-chan(r) for r in c3)
        da = jnp.roll(d[a], shift, axis=(0, 1, 2)) if any(shift) else d[a]
        return da + (c3[a] / R)

    # outlier mask: a cell is scattered classically if ANY of its channel
    # fractions falls outside the dense support [-S, S+1)
    if cap > 0:
        bad = jnp.zeros(lo_shape, bool)
        for c3 in chans:
            for a in range(3):
                fv = chan_frac(c3, a)
                bad = bad | (fv < -S) | (fv >= S + 1)
        ok = ~bad
    else:
        ok = None

    # dense accumulation: lax.scan over the integer offsets (one fused
    # elementwise pass + three dynamic rolls per step; an unrolled loop makes
    # a (2S+2)^3-stage XLA program that compiles slowly and fuses poorly)
    offs = np.array(
        [
            (ux, uy, uz)
            for ux in range(-S, S + 2)
            for uy in range(-S, S + 2)
            for uz in range(-S, S + 2)
        ],
        np.int32,
    )
    # mask the outlier cells out of the channel masses once, outside the scan
    m_use = {
        c3: (jnp.where(ok, m_chan[c3], 0.0) if ok is not None else m_chan[c3])
        for c3 in chans
    }

    def step(acc, u):
        # per-axis hats from the 3 base displacement fields; the channel's
        # staggered read shift commutes with the elementwise hat, so each
        # channel's weight is a 3-D roll of a shared product
        h = [
            [_hat(d[a] + (r / R) - u[a]) for r in range(R)] for a in range(3)
        ]
        contrib = None
        for c3 in chans:
            rx, ry, rz = c3
            p = h[0][rx] * h[1][ry] * h[2][rz]
            shift = tuple(-chan(r) for r in c3)
            if any(shift):
                p = jnp.roll(p, shift, axis=(0, 1, 2))
            t = m_use[c3] * p
            contrib = t if contrib is None else contrib + t
        rolled = contrib
        for a in range(3):
            rolled = jnp.roll(rolled, u[a], axis=a)
        return acc + rolled, None

    out, _ = jax.lax.scan(step, jnp.zeros(lo_shape, jnp.float32), jnp.asarray(offs))

    if cap > 0:
        # exact scatter for the rare out-of-support cells
        idx = jnp.argwhere(bad, size=cap, fill_value=-1)  # (cap, 3)
        valid = idx[:, 0] >= 0
        cx, cy, cz = idx[:, 0], idx[:, 1], idx[:, 2]
        acc = out.reshape(-1)
        for c3 in chans:
            rx, ry, rz = c3
            # displacement read at the e-shifted cell, gathered only at the
            # compacted outlier cells
            ex, ey, ez = (chan(r) for r in c3)
            gx, gy, gz = (cx + ex) % nx, (cy + ey) % ny, (cz + ez) % nz
            px = cx.astype(jnp.float32) + d[0][gx, gy, gz] + (c3[0] / R)
            py = cy.astype(jnp.float32) + d[1][gx, gy, gz] + (c3[1] / R)
            pz = cz.astype(jnp.float32) + d[2][gx, gy, gz] + (c3[2] / R)
            mass = jnp.where(valid, m_chan[c3][cx, cy, cz], 0.0)
            acc = cic.cic_scatter_flat(acc, px, py, pz, mass, lo_shape)
        out = acc.reshape(lo_shape)
    return out
