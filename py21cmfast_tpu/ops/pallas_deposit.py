"""Pallas TPU kernel for the factored CIC deposit (map_mass.c:146-210 analog).

The XLA formulations of the dense deposit are lane-shuffle-bound: the channel
extraction is a stride-R slice on the minor (lane) axis and the 64 offset
accumulations are 3-axis rolls, both of which lower to relayouts that run ~50x
below HBM speed on TPU (measured 3.7 s + 3.3 s per stage pair at 256^3/R=2,
scripts/r3_dep_profile.py).  This kernel keeps every shift on a cheap axis:

 * The R^3 channel grids chan[r][c] = m[R c + r - R//2] (m = 1 + delta*D_init)
   are materialized ONCE PER RUN as an x-padded stack in HBM
   (`build_channel_stack`) — they depend only on the ICs, not the node.
 * Blocks span the FULL y and z axes and a slab of x: the x offset shifts are
   static slices on the UNTILED major axis (free), while y/z offsets are
   in-register cyclic `pltpu.roll`s (single-instruction lane/sublane rotates,
   exact because the block covers the whole axis).  A first version that
   blocked y as well spent 6.2 s/call in sublane-unaligned halo slices.
 * Each grid step (gx, rx) DMAs the R^2 channels sharing rx over the x window
   [gx Bx, gx Bx + Bx + 2(S+1)) — x slicing has no tile-alignment constraint —
   plus the displacement/ok block, computes the factored hat contraction
   T[ry] -> U -> V in VMEM, and accumulates the output block across the rx
   grid dimension (output revisiting).
 * Out-of-support cells are zeroed via the `ok` plane and recovered exactly by
   the XLA scatter path in ops.sep_deposit (same plan machinery).

Arithmetic is identical to ops.deposit.factored_cic_deposit up to float
addition order; `scripts/r3_pallas_check.py` asserts kernel == staged == exact
scatter on the TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deposit import _rho

__all__ = ["build_channel_stack", "build_dok_stack", "pallas_factored_deposit",
           "PAD_X"]

PAD_X = 4  # x wrap padding (halo S+1 <= 4 supports S <= 3)


def _chan_slice_lowroll(m, rx, ry, rz, ratio):
    """chan[r'][c] = m[R*c + r' - R//2]: strided slice + lowres roll for
    negative centred shifts (ops.deposit._chan) — never a hires-sized temp."""
    starts, roll_axes = [], []
    for ax, rp in enumerate((rx, ry, rz)):
        s = rp - ratio // 2
        starts.append(s if s >= 0 else ratio + s)
        if s < 0:
            roll_axes.append(ax)
    c = m[starts[0] :: ratio, starts[1] :: ratio, starts[2] :: ratio]
    if roll_axes:
        c = jnp.roll(c, (1,) * len(roll_axes), tuple(roll_axes))
    return c


@partial(jax.jit, static_argnames=("ratio", "lo_shape"))
def build_channel_stack(hires_density, d_init, *, ratio, lo_shape):
    """(R^3, nl+2P, nl, nl) x-wrap-padded channel-mass stack (run-constant).

    chan[(rx R + ry) R + rz][c] = m[R c + r - R//2] with m = 1 + hires*d_init.
    Built channel-by-channel into the padded buffer (each strided slice fuses
    the 1 + hires*d_init elementwise op; no hires-sized temporaries — a
    roll/stack/pad chain peaks at ~5 hires grids and OOMs a 16 GB chip at
    DIM=1024)."""
    R = ratio
    P = PAD_X
    nx, ny, nz = lo_shape
    m = 1.0 + hires_density * d_init  # fuses into each strided slice
    out = jnp.zeros((R * R * R, nx + 2 * P, ny, nz), jnp.float32)
    for rx in range(R):
        for ry in range(R):
            for rz in range(R):
                r3 = (rx * R + ry) * R + rz
                c = _chan_slice_lowroll(m, rx, ry, rz, R)
                out = out.at[r3, P : P + nx].set(c)
    # periodic wrap pads on x (major axis: cheap copies)
    out = out.at[:, :P].set(out[:, nx : nx + P])
    out = out.at[:, P + nx :].set(out[:, P : 2 * P])
    return out


@jax.jit
def build_dok_stack(dx, dy, dz, ok):
    """(4, nl+2P, nl, nl) x-wrap-padded displacement + ok-mask stack."""
    P = PAD_X
    stack = jnp.stack([dx, dy, dz, ok])
    return jnp.pad(stack, ((0, 0), (P, P), (0, 0), (0, 0)), mode="wrap")


def _hat(x):
    return jnp.maximum(1.0 - jnp.abs(x), 0.0)


def _deposit_kernel(
    chan_hbm, dok_hbm, rho_ref, out_ref, chan_l, dok_l, sems,
    *, R, S, Bx, ny, nz,
):
    # grid = (gx, rx, ry): holding only the R channels that share (rx, ry)
    # keeps the VMEM window R planes instead of R^2 — at R=4/S=3/256^3 the
    # R^2 form overflowed the 128 MB VMEM (the support-3 halo adds 2 planes
    # per channel); output revisits across both rx and ry.
    gx = pl.program_id(0)
    rx = pl.program_id(1)
    ry = pl.program_id(2)
    Hp = S + 1
    off = PAD_X - Hp
    BxH = Bx + 2 * Hp

    c_dma = pltpu.make_async_copy(
        chan_hbm.at[pl.ds((rx * R + ry) * R, R), pl.ds(gx * Bx + off, BxH)],
        chan_l,
        sems.at[0],
    )
    d_dma = pltpu.make_async_copy(
        dok_hbm.at[:, pl.ds(gx * Bx + off, BxH)],
        dok_l,
        sems.at[1],
    )
    c_dma.start()
    d_dma.start()
    c_dma.wait()
    d_dma.wait()

    dx = dok_l[0]
    dy = dok_l[1]
    dz = dok_l[2]
    ok = dok_l[3]
    rho = _rho(R)
    rho_rx = rho_ref[rx]
    rho_ry = rho_ref[ry]

    @pl.when(jnp.logical_and(rx == 0, ry == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    for uz in range(-S, S + 2):
        t = None
        for rz in range(R):
            c = chan_l[rz] * (_hat(dz + (rho[rz] - uz)) * ok)
            t = c if t is None else t + c
        for uy in range(-S, S + 2):
            u2 = t * _hat(dy + (rho_ry - uy))
            w = None
            for ux in range(-S, S + 2):
                v = u2 * _hat(dx + (rho_rx - ux))
                sl = v[Hp - ux : Hp - ux + Bx]  # untiled-axis slice: free
                w = sl if w is None else w + sl
            # y/z offsets: cyclic rolls over the full axes (oz = cz + uz)
            out_ref[...] += pltpu.roll(pltpu.roll(w, uy % ny, 1), uz % nz, 2)


from functools import lru_cache


@lru_cache(maxsize=32)
def _build_deposit_call(R, S, Bx, nx, ny, nz):
    """Construct (and cache) the pallas_call for one static configuration.

    The callable must be built ONCE per config: constructing a fresh
    `partial` kernel per invocation defeats jax's dispatch cache and every
    call re-traces + re-lowers the Mosaic kernel (~8.7 s/call measured; the
    cached callable runs in ~13 ms)."""
    Hp = S + 1
    BxH = Bx + 2 * Hp
    kernel = partial(_deposit_kernel, R=R, S=S, Bx=Bx, ny=ny, nz=nz)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), jnp.float32),
        grid=(nx // Bx, R, R),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((Bx, ny, nz), lambda gx, rx, ry: (gx, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((R, BxH, ny, nz), jnp.float32),
            pltpu.VMEM((4, BxH, ny, nz), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )


def pallas_factored_deposit(
    chan_pad, dok_pad, *, ratio, support, lo_shape, block_x=None
):
    """Dense deposit via the blocked VMEM kernel.  Returns (nl, nl, nl)."""
    R, S = ratio, support
    if S + 1 > PAD_X:
        raise ValueError(f"support {S} exceeds PAD_X={PAD_X}")
    nx, ny, nz = lo_shape
    if block_x is None:
        # R-channel window + d window + t/u/v temps + double-buffered out
        # must fit the 128 MB VMEM; budget conservatively at 48 MB of
        # block-sized planes
        budget = 48 * 1024 * 1024 // 4
        per_row = ny * nz
        planes = R + 4 + 6
        block_x = max(1, budget // (per_row * planes) - 2 * (S + 1))
        block_x = min(32, 1 << int(np.log2(max(block_x, 1))))
    Bx = block_x
    while nx % Bx:
        Bx //= 2
    rho = jnp.asarray(_rho(R), jnp.float32)
    call = _build_deposit_call(R, S, Bx, nx, ny, nz)
    return call(chan_pad, dok_pad, rho)


@partial(jax.jit, static_argnames=("ratio", "cap", "lo_shape"))
def outlier_scatter_from_stack(acc, chan_pad, d, bad, *, ratio, cap, lo_shape):
    """Exact CIC scatter for out-of-support cells, reading channel masses
    from the cached x-padded stack (plain gathers).  The sep_deposit variant
    gathers from strided slices of the hires grid, each of which XLA
    materializes as a lane-relayout (~0.5 s x R^3 at DIM=768: 14.7 s/node
    measured)."""
    from . import cic

    R = ratio
    P = PAD_X
    rho = _rho(R)
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
                r3 = (rx * R + ry) * R + rz
                mass = jnp.where(valid, chan_pad[r3, cx + P, cy, cz], 0.0)
                px = cx.astype(jnp.float32) + dxg + rho[rx]
                py = cy.astype(jnp.float32) + dyg + rho[ry]
                pz = cz.astype(jnp.float32) + dzg + rho[rz]
                acc_flat = cic.cic_scatter_flat(
                    acc_flat, px, py, pz, mass, lo_shape
                )
    return acc_flat.reshape(lo_shape)
