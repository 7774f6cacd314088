"""Isolate the Pallas deposit kernel cost: DMA-only vs compute variants."""
import sys, time
sys.path.insert(0, "/root/repo")
from bench import _enable_compile_cache, _checksum
_enable_compile_cache()
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, S, nl = 2, 1, 256
P = 4
Bx = 8
Hp = S + 1
BxH = Bx + 2 * Hp
RR = R * R
rng = np.random.default_rng(0)
chan_pad = jnp.asarray(rng.normal(size=(R**3, nl + 2*P, nl, nl)).astype(np.float32))
dok_pad = jnp.asarray(rng.normal(size=(4, nl + 2*P, nl, nl)).astype(np.float32))
rho = jnp.asarray([-0.25, 0.25], jnp.float32)

def make(variant):
    def kernel(chan_hbm, dok_hbm, rho_ref, out_ref, chan_l, dok_l, sems):
        gx = pl.program_id(0)
        rx = pl.program_id(1)
        off = P - Hp
        c_dma = pltpu.make_async_copy(
            chan_hbm.at[pl.ds(rx*RR, RR), pl.ds(gx*Bx + off, BxH)], chan_l, sems.at[0])
        d_dma = pltpu.make_async_copy(
            dok_hbm.at[:, pl.ds(gx*Bx + off, BxH)], dok_l, sems.at[1])
        c_dma.start(); d_dma.start(); c_dma.wait(); d_dma.wait()
        dx, dy, dz, ok = dok_l[0], dok_l[1], dok_l[2], dok_l[3]
        rho_rx = rho_ref[rx]
        @pl.when(rx == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
        def hat(x):
            return jnp.maximum(1.0 - jnp.abs(x), 0.0)
        if variant == "dma":
            out_ref[...] += chan_l[0, Hp:Hp+Bx]
            return
        if variant == "one":
            wz = hat(dz + 0.25) * ok
            t0 = chan_l[0] * wz + chan_l[1] * wz
            u2 = t0 * hat(dy)
            v = u2 * hat(dx + rho_rx)
            out_ref[...] += v[Hp:Hp+Bx]
            return
        if variant == "noroll":
            for uz in range(-S, S+2):
                wz = [hat(dz + (float(rz)/R - 0.25 - uz)) * ok for rz in range(R)]
                t = [sum(chan_l[ry*R+rz] * wz[rz] for rz in range(R)) for ry in range(R)]
                for uy in range(-S, S+2):
                    u2 = sum(t[ry] * hat(dy + (float(ry)/R - 0.25 - uy)) for ry in range(R))
                    w = None
                    for ux in range(-S, S+2):
                        v = u2 * hat(dx + (rho_rx - ux))
                        sl = v[Hp-ux:Hp-ux+Bx]
                        w = sl if w is None else w + sl
                    out_ref[...] += w
            return
        # full: with rolls
        for uz in range(-S, S+2):
            wz = [hat(dz + (float(rz)/R - 0.25 - uz)) * ok for rz in range(R)]
            t = [sum(chan_l[ry*R+rz] * wz[rz] for rz in range(R)) for ry in range(R)]
            for uy in range(-S, S+2):
                u2 = sum(t[ry] * hat(dy + (float(ry)/R - 0.25 - uy)) for ry in range(R))
                w = None
                for ux in range(-S, S+2):
                    v = u2 * hat(dx + (rho_rx - ux))
                    sl = v[Hp-ux:Hp-ux+Bx]
                    w = sl if w is None else w + sl
                out_ref[...] += pltpu.roll(pltpu.roll(w, uy % nl, 1), uz % nl, 2)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nl, nl, nl), jnp.float32),
        grid=(nl // Bx, R),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((Bx, nl, nl), lambda gx, rx: (gx, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((RR, BxH, nl, nl), jnp.float32),
            pltpu.VMEM((4, BxH, nl, nl), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120*1024*1024),
    )

for variant in ("dma", "one", "noroll", "full"):
    f = make(variant)
    out = f(chan_pad, dok_pad, rho); _checksum(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(chan_pad, dok_pad, rho)
    _checksum(out)
    print(f"{variant}: {(time.perf_counter()-t0)/3*1000:.1f} ms", flush=True)
