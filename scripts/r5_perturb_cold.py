"""Time the sub-steps of the first perturb_field call at the bench config
(HII 256 / DIM 768), to locate the ~580 s node-0 cost that persists across
processes (i.e., is NOT covered by the persistent compilation cache).

Usage: python scripts/r5_perturb_cold.py [z]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import py21cmfast_tpu as p21
from py21cmfast_tpu.models import perturb as pt

Z = float(sys.argv[1]) if len(sys.argv) > 1 else 9.76

t0 = time.perf_counter()


def mark(name):
    global t0
    jax.effects_barrier()
    now = time.perf_counter()
    print(f"{name:28s} {now - t0:8.2f}s", flush=True)
    t0 = now


inputs = p21.InputParameters(random_seed=3).evolve_input_structs(
    HII_DIM=256, DIM=768, BOX_LEN=384.0, USE_TS_FLUCT=True,
    SOURCE_MODEL="E-INTEGRAL", RECOMB_MODEL="inhomogeneous", R_BUBBLE_MAX=50.0,
    USE_EXP_FILTER=False, CELL_RECOMB=False,
).with_logspaced_redshifts(8.0, 9.8)

ics = p21.compute_initial_conditions(inputs)
float(jnp.sum(ics.lowres_density))
mark("ICs")

plan = pt.plan_deposit_for_run(inputs, ics, 8.0)
mark(f"deposit plan {plan}")

so = inputs.simulation_options
lo_shape = so.lowres_shape
ratio = so.hires_shape[0] // lo_shape[0]
_, _, fac_za, fac_2lpt = pt._displacement_factors(inputs, Z)
cells_per_mpc = tuple(lo_shape[a] / so.box_lens[a] for a in range(3))
use_2lpt = inputs.matter_options.PERTURB_ALGORITHM == "2LPT" and ics.vx_2LPT is not None
v2 = (ics.vx_2LPT, ics.vy_2LPT, ics.vz_2LPT) if use_2lpt else (ics.vx, ics.vy, ics.vz)
d_fields = pt._displacement_cells(
    ics.vx, ics.vy, ics.vz, *v2, jnp.float32(fac_za), jnp.float32(fac_2lpt),
    cells_per_mpc=cells_per_mpc, use_2lpt=use_2lpt)
jax.block_until_ready(d_fields)
mark("displacement fields")

from py21cmfast_tpu.ops.sep_deposit import _bad_mask
support, cap = plan
if cap > 0:
    bad = _bad_mask(d_fields, ratio=ratio, support=support)
    ok = (~bad).astype(jnp.float32)
    jax.block_until_ready(ok)
else:
    bad, ok = None, jnp.ones(tuple(lo_shape), jnp.float32)
mark("bad mask")

from py21cmfast_tpu.ops.pallas_deposit import (
    build_channel_stack, build_dok_stack, pallas_factored_deposit,
)

d_init = 0.0  # placeholder amplitude arg as perturb uses (check _pallas path)
chan = pt._channel_stack_for(ics, ratio, 1.0, lo_shape)
jax.block_until_ready(chan)
mark("channel stack build")

dok = build_dok_stack(d_fields[0], d_fields[1], d_fields[2], ok)
jax.block_until_ready(dok)
mark("dok stack")

acc = pallas_factored_deposit(chan, dok, ratio=ratio, support=support,
                              lo_shape=tuple(lo_shape))
jax.block_until_ready(acc)
mark("pallas deposit (1st)")

acc = pallas_factored_deposit(chan, dok, ratio=ratio, support=support,
                              lo_shape=tuple(lo_shape))
jax.block_until_ready(acc)
mark("pallas deposit (2nd)")

if cap > 0:
    from py21cmfast_tpu.ops.pallas_deposit import outlier_scatter_from_stack
    acc2 = outlier_scatter_from_stack(acc, chan, d_fields, bad,
                                      ratio=ratio, cap=cap, lo_shape=tuple(lo_shape))
    jax.block_until_ready(acc2)
    mark("outlier scatter (1st)")

pf = p21.perturb_field(Z, inputs, ics, deposit_plan=plan)
jax.block_until_ready(pf.density)
mark("full perturb_field (1st)")

pf = p21.perturb_field(Z - 0.2, inputs, ics, deposit_plan=plan)
jax.block_until_ready(pf.density)
mark("full perturb_field (2nd)")
