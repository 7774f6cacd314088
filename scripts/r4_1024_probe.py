"""Bisect the DIM=1024 RESOURCE_EXHAUSTED: ICs complete (4.4 GiB live), the
next sync (plan_deposit_for_run's dmax fetch) dies.  Walk the coeval setup
stage by stage with explicit block_until_ready + live-buffer accounting.

Usage: python scripts/r4_1024_probe.py [HII] [DIM]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

import py21cmfast_tpu as p21  # noqa: E402

HII = int(sys.argv[1]) if len(sys.argv) > 1 else 256
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 1024


def live(tag):
    tot = 0
    shapes = {}
    for a in jax.live_arrays():
        nb = a.size * a.dtype.itemsize
        tot += nb
        key = (str(a.shape), str(a.dtype))
        shapes[key] = shapes.get(key, 0) + nb
    print(f"[{tag}] live {tot / 2**30:.2f} GiB")
    for k, v in sorted(shapes.items(), key=lambda t: -t[1])[:6]:
        print(f"    {k}: {v / 2**30:.3f} GiB")


def main():
    inputs = p21.InputParameters(random_seed=3).evolve_input_structs(
        HII_DIM=HII, DIM=DIM, BOX_LEN=1.5 * HII,
        SOURCE_MODEL="E-INTEGRAL", USE_TS_FLUCT=True,
        RECOMB_MODEL="inhomogeneous", R_BUBBLE_MAX=50.0,
        USE_EXP_FILTER=False, CELL_RECOMB=False,
        Z_HEAT_MAX=9.8, ZPRIME_STEP_FACTOR=1.02,
    ).with_logspaced_redshifts(8.0)

    t0 = time.time()
    ics = p21.compute_initial_conditions(inputs)
    jax.block_until_ready(ics.hires_density)
    print(f"ICs done {time.time() - t0:.1f}s", flush=True)
    live("after ICs")

    from py21cmfast_tpu.models.perturb import plan_deposit_for_run

    t0 = time.time()
    plan = plan_deposit_for_run(inputs, ics, min(inputs.node_redshifts))
    print(f"plan_deposit ok {time.time() - t0:.1f}s: {plan}", flush=True)
    live("after plan")

    t0 = time.time()
    pf = p21.perturb_field(8.0, inputs, ics, deposit_plan=plan)
    jax.block_until_ready(pf.density)
    print(f"perturb ok {time.time() - t0:.1f}s", flush=True)
    live("after perturb")


if __name__ == "__main__":
    main()
