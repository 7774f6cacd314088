"""Benchmark: full coeval snapshot (ICs -> 2LPT -> perturb -> ionization -> Tb)
wall-clock on one TPU chip.

Baseline (BASELINE.md / JOSS v3 paper): the reference C code at HII_DIM=250,
DIM=1000 takes ~80 min for ICs + 2-3 min per snapshot on a 16-core Xeon.
Scaled to the bench resolution (HII_DIM=256, DIM=768): ICs ~ 4800 s * (768/1000)^3
= 2173 s, snapshot ~150 s => ~2323 s total.  `vs_baseline` reports the speedup
factor (baseline_seconds / measured_seconds).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np


def _enable_compile_cache():
    import jax

    cache_dir = Path(__file__).parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run_once(hii_dim: int, dim: int, z: float, seed: int) -> float:
    import jax

    import py21cmfast_tpu as p21

    inputs = p21.InputParameters(random_seed=seed).evolve_input_structs(
        HII_DIM=hii_dim, DIM=dim, BOX_LEN=1.5 * hii_dim, SOURCE_MODEL="E-INTEGRAL"
    )
    import jax.numpy as jnp

    t0 = time.perf_counter()
    ics = p21.compute_initial_conditions(inputs)
    pf = p21.perturb_field(z, inputs, ics)
    ion = p21.compute_ionization_field(z, inputs, pf)
    tb = p21.brightness_temperature(inputs, ion, pf)
    # NOTE: on the axon platform block_until_ready does NOT reliably wait for
    # execution; force completion by fetching scalar checksums of every
    # stage's primary output (the scalar D2H is ~30 ms once the transfer path
    # is warm, so this adds negligible overhead to the measurement).
    chk = (
        float(jnp.sum(ics.lowres_density))
        + float(jnp.sum(pf.density))
        + float(jnp.sum(ion.neutral_fraction))
        + float(jnp.sum(tb.brightness_temp))
    )
    assert np.isfinite(chk)
    return time.perf_counter() - t0


def main():
    import gc
    import traceback

    _enable_compile_cache()
    z = 8.0
    # baselines: reference ICs time scales as DIM^3 from 80 min at DIM=1000,
    # + ~150 s per snapshot at HII_DIM~250 (BASELINE.md)
    for hii_dim, dim, base_s in ((256, 512, 780.0), (192, 384, 415.0), (128, 384, 440.0)):
        try:
            # warmup: trigger all compiles at the bench shape with another seed
            run_once(hii_dim, dim, z, seed=1)
            dt = run_once(hii_dim, dim, z, seed=2)
            print(
                json.dumps(
                    {
                        "metric": f"coeval_ics_to_tb_hii{hii_dim}_dim{dim}_seconds",
                        "value": round(dt, 3),
                        "unit": "s",
                        "vs_baseline": round(base_s / dt, 1),
                    }
                )
            )
            return
        except Exception as e:  # noqa: BLE001 — OOM fallback to smaller box
            print(f"bench at HII_DIM={hii_dim} failed: {type(e).__name__}", file=sys.stderr)
            # drop device buffers pinned by the exception's traceback frames
            traceback.clear_frames(e.__traceback__)
            del e
            gc.collect()
            import jax

            jax.clear_caches()
            gc.collect()
    print(json.dumps({"metric": "bench_failed", "value": 0, "unit": "s", "vs_baseline": 0}))


if __name__ == "__main__":
    main()
