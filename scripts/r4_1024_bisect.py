"""Bisect WHICH DIM=1024 ICs stage wedges the axon backend: after every
stage, run a tiny fresh dispatch + D2H ("canary").  The first stage whose
canary dies is the trigger.  Also dumps device memory_stats when available.

Usage: python scripts/r4_1024_bisect.py [DIM] [stop_after_stage]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import py21cmfast_tpu as p21  # noqa: E402
from py21cmfast_tpu.models import ics as ics_mod  # noqa: E402
from py21cmfast_tpu.ops import fft  # noqa: E402

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
STOP = sys.argv[2] if len(sys.argv) > 2 else None
HII = DIM // 4


def memstats(tag):
    try:
        st = jax.local_devices()[0].memory_stats()
    except Exception as e:  # noqa: BLE001
        print(f"[{tag}] memory_stats unavailable: {type(e).__name__}", flush=True)
        return
    if not st:
        print(f"[{tag}] memory_stats empty", flush=True)
        return
    keys = ("bytes_in_use", "peak_bytes_in_use", "bytes_reserved",
            "largest_free_block_bytes", "bytes_limit")
    parts = [f"{k}={st[k]/2**30:.2f}G" for k in keys if k in st]
    print(f"[{tag}] " + " ".join(parts) + f" (all keys: {sorted(st)})", flush=True)


def canary(tag):
    t0 = time.time()
    try:
        v = float(jnp.sum(jnp.arange(37.0)))
        assert abs(v - 666.0) < 1e-3
        print(f"[canary {tag}] OK {time.time()-t0:.1f}s", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"[canary {tag}] DEAD: {type(e).__name__}: {str(e)[:120]}", flush=True)
        return False


def main():
    inputs = p21.InputParameters(random_seed=3).evolve_input_structs(
        HII_DIM=HII, DIM=DIM, BOX_LEN=1.5 * HII,
        SOURCE_MODEL="E-INTEGRAL", USE_TS_FLUCT=True,
        RECOMB_MODEL="inhomogeneous", R_BUBBLE_MAX=50.0,
        USE_EXP_FILTER=False, CELL_RECOMB=False,
        Z_HEAT_MAX=9.8, ZPRIME_STEP_FACTOR=1.02,
    ).with_logspaced_redshifts(8.0)
    so = inputs.simulation_options
    mo = inputs.matter_options
    hi_shape, lo_shape = so.hires_shape, so.lowres_shape
    pt_shape = hi_shape if mo.PERTURB_ON_HIGH_RES else lo_shape
    box_lens = so.box_lens
    filter_lowres = so.dim != so.HII_DIM
    do_filter_vel = filter_lowres and (pt_shape != hi_shape)

    canary("startup")
    memstats("startup")

    ln_k, sqrtp = ics_mod.power_amplitude_table(inputs)
    key = jax.random.PRNGKey(inputs.random_seed)
    white = jax.jit(lambda k: jax.random.normal(k, hi_shape, dtype=jnp.float32))(key)
    jax.block_until_ready(white)
    canary("white")
    memstats("white")
    if STOP == "white":
        return

    w_kt = fft.rfft3_kt(white)
    del white
    jax.block_until_ready(w_kt)
    canary("w_kt")
    memstats("w_kt")
    if STOP == "w_kt":
        return

    n_tot = float(np.prod(hi_shape))
    volume = float(np.prod(box_lens))
    d_kt = ics_mod._color_white_kt_donated(
        w_kt, ln_k, sqrtp, jnp.float32(n_tot), jnp.float32(volume),
        hi_shape=hi_shape, box_lens=box_lens,
    )
    del w_kt
    jax.block_until_ready(d_kt)
    canary("d_kt")
    memstats("d_kt")
    if STOP == "d_kt":
        return

    box = [d_kt]
    del d_kt
    hires = fft.irfft3_kt_consume(box, hi_shape)
    jax.block_until_ready(hires)
    canary("hires")
    memstats("hires")
    if STOP == "hires":
        return

    kt = fft.rfft3_kt(hires)
    jax.block_until_ready(kt)
    canary("re-rfft")
    memstats("re-rfft")
    tshape = tuple(int(round(s * ics_mod._2LPT_TRUNC_DIM / hi_shape[0]))
                   for s in hi_shape)
    d_k_t_early = ics_mod._truncate_dk_from_kt(kt, hi_shape=hi_shape,
                                               trunc_shape=tshape)
    jax.block_until_ready(d_k_t_early)
    del kt
    canary("2lpt-trunc")
    memstats("2lpt-trunc")
    if STOP == "trunc":
        return

    def _field(do_filter, out_res, axis=None):
        k = fft.rfft3_kt(hires)
        if axis is None:
            k = ics_mod._filter_kt_only_donated(
                k, hi_shape=hi_shape, box_lens=box_lens,
                do_filter=do_filter, out_res=out_res)
        else:
            k = ics_mod._gradient_kt_only_donated(
                k, hi_shape=hi_shape, box_lens=box_lens,
                do_filter=do_filter, out_res=out_res, axis=axis)
        jax.block_until_ready(k)
        out_shape = lo_shape if axis is None else pt_shape
        if out_shape != hi_shape and fft.can_fold(hi_shape, out_shape):
            k_small = fft.fold_kt_spectrum(k, hi_shape=hi_shape,
                                           out_shape=out_shape)
            del k
            out = ics_mod._irfft3_small(k_small, out_shape)
            jax.block_until_ready(out)
            return out
        kbox = [k]
        del k
        x = fft.irfft3_kt_consume(kbox, hi_shape)
        out = (ics_mod._subsample_jit(x, out_shape=out_shape)
               if out_shape != hi_shape else x)
        jax.block_until_ready(out)
        del x
        return out

    lowres = _field(filter_lowres, lo_shape[0])
    canary("lowres")
    memstats("lowres")
    if STOP == "lowres":
        return

    vel = []
    for ax in range(3):
        vel.append(_field(do_filter_vel, pt_shape[0], axis=ax))
        canary(f"vel{ax}")
    memstats("vels")
    if STOP == "vels":
        return

    v2 = ics_mod._compute_2lpt(d_k_t_early, tshape, box_lens, pt_shape,
                               do_filter_vel)
    jax.block_until_ready(v2)
    canary("2lpt")
    memstats("2lpt")

    # now replicate the wedge check: fetch a tiny corner of hires
    t0 = time.time()
    try:
        v = float(np.asarray(lowres[:2, :2, :2]).sum())
        print(f"[tiny hires fetch] OK {time.time()-t0:.1f}s v={v:.3e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[tiny hires fetch] DEAD: {type(e).__name__}", flush=True)

    # attempt recovery: free everything big, gc, retry canary
    import gc
    del v2, vel, lowres, hires, d_k_t_early
    gc.collect()
    time.sleep(1.0)
    canary("after-free")
    memstats("after-free")


if __name__ == "__main__":
    main()
