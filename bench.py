"""Benchmark: the reference's HEADLINE configuration — a USE_TS_FLUCT +
inhomogeneous-recombination lightcone-style node scroll — on one TPU chip.

Baseline (BASELINE.md / JOSS v3 paper): the reference C code runs the full
z=5-35 lightcone (92 nodes, Ts + INHOMO_RECO, HII_DIM=250, DIM=1000) in
7.63 hr = 27468 s on a 16-core Xeon.  Measuring all 92 nodes per round is
wasteful, so this bench times the initial conditions plus a short steady-state
segment of the same per-node pipeline (HaloBox-free Eulerian path: perturb ->
Ts shell ladder -> ionization + recombinations -> Tb) at HII_DIM=256 and
projects the full-ladder wall-clock:

    projected = t_ics + 92 * t_per_node

`vs_baseline` is 27468 / projected.  Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

N_NODES_FULL = 92  # reference headline ladder, z=5-35 at ZPRIME_STEP_FACTOR=1.02
BASELINE_S = 27468.0


def _enable_compile_cache():
    import jax

    cache_dir = Path(__file__).parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _checksum(*arrays):
    import jax.numpy as jnp

    # on the axon platform block_until_ready does NOT reliably wait; force
    # completion with scalar D2H checksums
    return sum(float(jnp.sum(a)) for a in arrays if a is not None)


def run_headline(hii_dim: int, dim: int, seed: int):
    """Time ICs and a 5-node steady-state segment of the headline config."""
    import py21cmfast_tpu as p21
    from py21cmfast_tpu.drivers.coeval import generate_coeval

    inputs = p21.InputParameters(random_seed=seed).evolve_input_structs(
        HII_DIM=hii_dim,
        DIM=dim,
        BOX_LEN=1.5 * hii_dim,
        SOURCE_MODEL="E-INTEGRAL",
        USE_TS_FLUCT=True,
        RECOMB_MODEL="inhomogeneous",
        R_BUBBLE_MAX=50.0,
        USE_EXP_FILTER=False,
        CELL_RECOMB=False,
        Z_HEAT_MAX=12.2,           # short ladder: ~6 nodes from z=10
        ZPRIME_STEP_FACTOR=1.03,
    ).with_logspaced_redshifts(10.0)

    t0 = time.perf_counter()
    ics = p21.compute_initial_conditions(inputs)
    _checksum(ics.lowres_density, ics.hires_density)
    t_ics = time.perf_counter() - t0

    n_nodes = 0
    t1 = time.perf_counter()
    last = None
    for cv in generate_coeval(inputs, out_redshifts=(), initial_conditions=ics):
        n_nodes += 1
        last = cv
    _checksum(
        last.brightness_temperature.brightness_temp,
        last.ionized_box.neutral_fraction,
        last.spin_temp.spin_temperature if last.spin_temp else None,
    )
    t_scroll = time.perf_counter() - t1
    return t_ics, t_scroll, n_nodes


def main():
    import gc
    import traceback

    _enable_compile_cache()
    for hii_dim, dim in ((256, 512), (192, 384), (128, 256)):
        try:
            # first pass compiles everything at the bench shape
            run_headline(hii_dim, dim, seed=1)
            t_ics, t_scroll, n_nodes = run_headline(hii_dim, dim, seed=2)
            per_node = t_scroll / n_nodes
            projected = t_ics + N_NODES_FULL * per_node
            print(
                json.dumps(
                    {
                        "metric": f"ts_recomb_lightcone_projected_hii{hii_dim}_seconds",
                        "value": round(projected, 1),
                        "unit": "s",
                        "vs_baseline": round(BASELINE_S / projected, 1),
                        "detail": {
                            "t_ics_s": round(t_ics, 2),
                            "t_per_node_s": round(per_node, 2),
                            "nodes_measured": n_nodes,
                            "nodes_projected": N_NODES_FULL,
                        },
                    }
                )
            )
            return
        except Exception as e:  # noqa: BLE001 — OOM fallback to smaller box
            print(f"bench at HII_DIM={hii_dim} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            traceback.clear_frames(e.__traceback__)
            del e
            gc.collect()
            import jax

            jax.clear_caches()
            gc.collect()
    print(json.dumps({"metric": "bench_failed", "value": 0, "unit": "s", "vs_baseline": 0}))


if __name__ == "__main__":
    main()
